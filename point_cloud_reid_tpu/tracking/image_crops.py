"""Camera image-crop extraction for the image-branch tracker.

Equivalent of the reference's batched box->image crop pipeline
(trackers/deprecated/pc_utils.py:189-303: project 3D box corners through
lidar2camera + intrinsics, clamp the 2D hull to the image, grid-sample a
fixed-size crop, and keep the largest-area view when a box is visible from
several cameras). Rebuilt as fixed-shape batched jnp: every box gets a crop
slot in every camera (masked invalid), and the per-box best camera is an
argmax — no data-dependent gathers, so the whole frontend jits.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import box_corners_3d


def project_boxes(boxes: jnp.ndarray, lidar2cam: jnp.ndarray,
                  intrinsics: jnp.ndarray,
                  image_size: Tuple[int, int] = (1600, 900)
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project gravity-centered boxes into one camera.

    Args:
        boxes: (M, 7) [cx cy cz dx dy dz yaw], gravity-centered z.
        lidar2cam: (4, 4) extrinsic.
        intrinsics: (3, 3) camera matrix.
        image_size: (W, H).
    Returns:
        corners_2d: (M, 8, 2) pixel coordinates.
        visible: (M,) bool — at least one corner in front of the camera AND
            the clamped 2D box non-degenerate (BoxVisibility.ANY semantics).
    """
    b = boxes.at[:, 2].add(-boxes[:, 5] * 0.5)          # gravity -> bottom z
    corners = box_corners_3d(b)                          # (M, 8, 3) lidar
    M = corners.shape[0]
    hom = jnp.concatenate([corners.reshape(-1, 3),
                           jnp.ones((M * 8, 1), corners.dtype)], axis=1)
    cam = (hom @ lidar2cam.T)[:, :3].reshape(M, 8, 3)    # camera frame
    z = jnp.maximum(cam[..., 2], 1e-3)
    uvw = cam @ intrinsics.T                             # (M, 8, 3)
    uv = uvw[..., :2] / z[..., None]

    W, H = image_size
    # BoxVisibility.ANY: a single corner in front suffices (boxes straddling
    # the camera plane keep their clamped in-image extent)
    in_front = jnp.any(cam[..., 2] > 0.1, axis=1)
    # ANY visibility: the clamped box must retain area
    x0 = jnp.clip(jnp.min(uv[..., 0], axis=1), 0, W)
    x1 = jnp.clip(jnp.max(uv[..., 0], axis=1), 0, W)
    y0 = jnp.clip(jnp.min(uv[..., 1], axis=1), 0, H)
    y1 = jnp.clip(jnp.max(uv[..., 1], axis=1), 0, H)
    visible = in_front & (x1 - x0 > 1.0) & (y1 - y0 > 1.0)
    return uv, visible


def boxes_2d(corners_2d: jnp.ndarray,
             image_size: Tuple[int, int] = (1600, 900)) -> jnp.ndarray:
    """(M, 8, 2) corners -> (M, 4) [x0, y0, x1, y1] clamped to the image."""
    W, H = image_size
    x0 = jnp.clip(jnp.min(corners_2d[..., 0], axis=1), 0, W)
    x1 = jnp.clip(jnp.max(corners_2d[..., 0], axis=1), 0, W)
    y0 = jnp.clip(jnp.min(corners_2d[..., 1], axis=1), 0, H)
    y1 = jnp.clip(jnp.max(corners_2d[..., 1], axis=1), 0, H)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def extract_crops(image: jnp.ndarray, box2d: jnp.ndarray,
                  output_size: Tuple[int, int] = (224, 224)) -> jnp.ndarray:
    """Bilinear fixed-size crops (extract_bboxes/grid_sample equivalent,
    pc_utils.py:149-165).

    Args:
        image: (3, H, W) float32.
        box2d: (M, 4) [x0, y0, x1, y1] pixel boxes.
    Returns:
        (M, 3, out_h, out_w) crops.
    """
    _, H, W = image.shape
    oh, ow = output_size

    def one(box):
        x0, y0, x1, y1 = box
        xs = x0 + (x1 - x0) * (jnp.arange(ow) + 0.5) / ow
        ys = y0 + (y1 - y0) * (jnp.arange(oh) + 0.5) / oh
        xf = jnp.clip(xs - 0.5, 0.0, W - 1.0)
        yf = jnp.clip(ys - 0.5, 0.0, H - 1.0)
        x0i = jnp.floor(xf).astype(jnp.int32)
        y0i = jnp.floor(yf).astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, W - 1)
        y1i = jnp.minimum(y0i + 1, H - 1)
        wx = (xf - x0i)[None, :]
        wy = (yf - y0i)[:, None]
        g = image  # (3, H, W)
        tl = g[:, y0i][:, :, x0i]
        tr = g[:, y0i][:, :, x1i]
        bl = g[:, y1i][:, :, x0i]
        br = g[:, y1i][:, :, x1i]
        top = tl * (1 - wx) + tr * wx
        bot = bl * (1 - wx) + br * wx
        return top * (1 - wy)[None] + bot * wy[None]

    return jax.vmap(one)(box2d.astype(jnp.float32))


def _crops_from_best(images: jnp.ndarray, best_cam: jnp.ndarray,
                     best_b2: jnp.ndarray,
                     output_size: Tuple[int, int]) -> jnp.ndarray:
    """Fused bilinear crops straight from the (ncam, 3, H, W) source stack.

    The naive formulation gathers the full best-camera image per box first
    ((M, 3, H, W) — a 1.1 GB HBM round trip at 64 boxes x 6 900x1600
    cameras; the whole crop stage measured 14.9 ms / 6.9 GB on v5e). This
    gathers ONLY the <= 2*oh sample rows each box needs, with the camera
    choice folded into the row gather's leading index, and blends columns
    on the small row band. uint8 sources stay uint8 through BOTH gathers —
    rows AND columns — and convert only on the (M, 2oh, ch, ow) column
    picks: converting the full (M, 2oh, ch, W) band first materializes
    ~550 MB of f32 at 64 boxes, and the column-pick order measured 1.65x
    faster on v5e (9.64 -> 5.83 ms, tools/profile_image_frame_pieces.py
    --u8cols) with bit-identical output (uint8 values are exact in f32;
    the blend math is unchanged). Callers apply any value scale.
    Bilinear math is op-for-op extract_crops (pc_utils.py:149-165
    grid_sample semantics) — parity pinned by
    tests/test_image_crops.py::test_crops_per_frame_matches_naive_path.
    """
    ncam, ch, H, W = images.shape
    oh, ow = output_size
    b2 = best_b2.astype(jnp.float32)
    x0, y0, x1, y1 = b2[:, 0], b2[:, 1], b2[:, 2], b2[:, 3]
    xs = x0[:, None] + (x1 - x0)[:, None] * (jnp.arange(ow) + 0.5) / ow
    ys = y0[:, None] + (y1 - y0)[:, None] * (jnp.arange(oh) + 0.5) / oh
    xf = jnp.clip(xs - 0.5, 0.0, W - 1.0)                # (M, ow)
    yf = jnp.clip(ys - 0.5, 0.0, H - 1.0)                # (M, oh)
    x0i = jnp.floor(xf).astype(jnp.int32)
    y0i = jnp.floor(yf).astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)
    wx = (xf - x0i)[:, None, None, :]                    # (M, 1, 1, ow)
    wy = (yf - y0i)                                      # (M, oh)
    yy = jnp.concatenate([y0i, y1i], axis=1)             # (M, 2*oh)
    # ONE fused row gather: advanced indices (M,1) x (M,2oh) broadcast and
    # land in front -> (M, 2oh, ch, W); full-W rows keep the gather slices
    # big and contiguous (the regime where XLA's TPU gather runs fine)
    band = images[best_cam[:, None], :, yy, :]        # source dtype kept

    def cols(xi):
        return jnp.take_along_axis(
            band, xi[:, None, None, :], axis=3).astype(jnp.float32)

    horiz = cols(x0i) * (1.0 - wx) + cols(x1i) * wx      # (M, 2oh, ch, ow)
    top, bot = horiz[:, :oh], horiz[:, oh:]
    out = (top * (1.0 - wy)[:, :, None, None]
           + bot * wy[:, :, None, None])                 # (M, oh, ch, ow)
    return out.transpose(0, 2, 1, 3)                     # (M, ch, oh, ow)


@functools.partial(jax.jit, static_argnames=("image_size", "output_size"))
def crops_per_frame(images: jnp.ndarray, lidar2cams: jnp.ndarray,
                    intrinsics: jnp.ndarray, boxes: jnp.ndarray,
                    image_size: Tuple[int, int] = (1600, 900),
                    output_size: Tuple[int, int] = (224, 224)
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best-camera crop per box across all cameras of one frame.

    Mirrors get_crops_per_image (pc_utils.py:239-303): a box visible in
    several cameras keeps the largest-area 2D view; invisible boxes return
    zero crops (masked out downstream, matching the reference's
    missing-crop-as-zeros soft failure). uint8 image stacks are accepted
    (gathered as uint8, scaled by 1/255 on the crop — quarter the
    host->device and gather bytes of pre-converted f32 frames).

    Args:
        images: (C, 3, H, W) float32 or uint8; lidar2cams: (C, 4, 4);
        intrinsics: (C, 3, 3); boxes: (M, 7) gravity-centered.
    Returns:
        crops: (M, 3, out_h, out_w) float32; valid: (M,) bool.
    """
    def per_cam(l2c, K):
        uv, vis = project_boxes(boxes, l2c, K, image_size)
        b2 = boxes_2d(uv, image_size)
        area = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
        return b2, jnp.where(vis, area, -1.0)

    b2_all, area_all = jax.vmap(per_cam)(lidar2cams, intrinsics)
    best_cam = jnp.argmax(area_all, axis=0)              # (M,)
    valid = jnp.max(area_all, axis=0) > 0

    M = boxes.shape[0]
    best_b2 = b2_all[best_cam, jnp.arange(M)]            # (M, 4)
    crops = _crops_from_best(images, best_cam, best_b2, output_size)
    if images.dtype == jnp.uint8:
        crops = crops * (1.0 / 255.0)
    crops = jnp.where(valid[:, None, None, None], crops, 0.0)
    return crops, valid
