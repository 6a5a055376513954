"""Camera crop projection + extraction tests."""
import jax.numpy as jnp
import numpy as np

from point_cloud_reid_tpu.tracking.image_crops import (boxes_2d,
                                                       crops_per_frame,
                                                       extract_crops,
                                                       project_boxes)


def _simple_cam():
    """Camera at origin looking down +x (lidar) == +z (cam)."""
    l2c = np.array([[0, -1, 0, 0],     # lidar y -> cam -x
                    [0, 0, -1, 0],     # lidar z -> cam -y
                    [1, 0, 0, 0],      # lidar x -> cam z (depth)
                    [0, 0, 0, 1]], np.float32)
    K = np.array([[500, 0, 800],
                  [0, 500, 450],
                  [0, 0, 1]], np.float32)
    return l2c, K


def test_project_boxes_center_box():
    l2c, K = _simple_cam()
    # 2m cube 10m ahead on the optical axis
    boxes = jnp.asarray([[10.0, 0, 0, 2, 2, 2, 0.0]])
    uv, vis = project_boxes(boxes, jnp.asarray(l2c), jnp.asarray(K))
    assert bool(vis[0])
    c = np.asarray(uv[0])
    assert abs(c[:, 0].mean() - 800) < 15 and abs(c[:, 1].mean() - 450) < 15
    # ~2m at 10m with f=500 -> ~100px extent
    assert 80 < np.ptp(c[:, 0]) < 130

    behind = jnp.asarray([[-10.0, 0, 0, 2, 2, 2, 0.0]])
    _, vis_b = project_boxes(behind, jnp.asarray(l2c), jnp.asarray(K))
    assert not bool(vis_b[0])


def test_extract_crops_identity_patch():
    # constant-gradient image: crop values must equal sampled coordinates
    H, W = 32, 48
    xs = np.tile(np.arange(W, dtype=np.float32)[None], (H, 1))
    img = jnp.asarray(np.stack([xs, xs * 0, xs * 0]))
    crops = extract_crops(img, jnp.asarray([[8.0, 0.0, 24.0, 32.0]]),
                          output_size=(8, 8))
    c = np.asarray(crops[0, 0])
    # x channel should ramp 8 -> 24 across the crop
    assert abs(c[:, 0].mean() - 9.0) < 1.5 and abs(c[:, -1].mean() - 23.0) < 1.5
    assert (np.diff(c, axis=1) > 0).all()


def test_crops_per_frame_matches_naive_path():
    """The fused row-band gather (_crops_from_best) must be op-for-op the
    naive per-box path: gather the full best-camera image, extract_crops on
    it. Also pins the uint8 source path (gather-as-uint8, scale on crop)
    against the f32-preconverted result."""
    import jax

    from point_cloud_reid_tpu.tracking.image_crops import project_boxes

    rng = np.random.RandomState(3)
    l2c1, _ = _simple_cam()
    l2c2 = l2c1 @ np.diag([-1, -1, 1, 1]).astype(np.float32)
    K_small = np.array([[50, 0, 80], [0, 50, 45], [0, 0, 1]], np.float32)
    imgs_u8 = rng.randint(0, 256, size=(2, 3, 90, 160)).astype(np.uint8)
    imgs_f32 = imgs_u8.astype(np.float32) / 255.0
    boxes = jnp.asarray([[10.0, 0, 0, 2, 2, 2, 0.3],
                         [-8.0, 1, 0, 1, 2, 1.5, 0.0],
                         [12.0, -2, 0.5, 2, 1, 1, 1.0],
                         [-10.0, 0, 0, 2, 2, 2, 0.0]])
    l2cs = jnp.asarray(np.stack([l2c1, l2c2]))
    Ks = jnp.asarray(np.stack([K_small, K_small]))

    crops, valid = crops_per_frame(jnp.asarray(imgs_f32), l2cs, Ks, boxes,
                                   image_size=(160, 90),
                                   output_size=(16, 16))

    # naive reference: full-image gather per box + extract_crops
    def per_cam(l2c, K):
        uv, vis = project_boxes(boxes, l2c, K, (160, 90))
        b2 = boxes_2d(uv, (160, 90))
        area = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
        return b2, jnp.where(vis, area, -1.0)

    b2_all, area_all = jax.vmap(per_cam)(l2cs, Ks)
    best_cam = np.asarray(jnp.argmax(area_all, axis=0))
    for m in range(boxes.shape[0]):
        img = jnp.asarray(imgs_f32[best_cam[m]])
        ref = extract_crops(img, b2_all[best_cam[m], m][None],
                            output_size=(16, 16))[0]
        if bool(valid[m]):
            np.testing.assert_allclose(np.asarray(crops[m]), np.asarray(ref),
                                       rtol=0, atol=1e-5)
        else:
            assert float(jnp.abs(crops[m]).sum()) == 0.0

    # uint8 source: gathered as uint8, scaled 1/255 on the band
    crops_u8, valid_u8 = crops_per_frame(jnp.asarray(imgs_u8), l2cs, Ks,
                                         boxes, image_size=(160, 90),
                                         output_size=(16, 16))
    assert np.array_equal(np.asarray(valid), np.asarray(valid_u8))
    np.testing.assert_allclose(np.asarray(crops_u8), np.asarray(crops),
                               rtol=0, atol=1e-5)


def test_crops_per_frame_best_camera():
    l2c1, K = _simple_cam()
    # second camera looks down -x: sees boxes behind
    flip = np.diag([1, 1, -1, 1]).astype(np.float32)
    l2c2 = l2c1 @ np.diag([-1, -1, 1, 1]).astype(np.float32)
    images = jnp.asarray(np.random.RandomState(0).rand(2, 3, 90, 160)
                         .astype(np.float32))
    K_small = np.array([[50, 0, 80], [0, 50, 45], [0, 0, 1]], np.float32)
    boxes = jnp.asarray([[10.0, 0, 0, 2, 2, 2, 0.0],      # ahead: cam 1
                         [-10.0, 0, 0, 2, 2, 2, 0.0]])    # behind: cam 2
    crops, valid = crops_per_frame(
        images, jnp.asarray(np.stack([l2c1, l2c2])),
        jnp.asarray(np.stack([K_small, K_small])), boxes,
        image_size=(160, 90), output_size=(16, 16))
    assert crops.shape == (2, 3, 16, 16)
    assert bool(valid[0]) and bool(valid[1])
    assert float(jnp.abs(crops[0]).sum()) > 0
    assert float(jnp.abs(crops[1]).sum()) > 0
