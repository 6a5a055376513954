"""Native C++ crop loader: build, correctness vs numpy, determinism."""
import os

import numpy as np
import pytest

from point_cloud_reid_tpu import native


@pytest.fixture(scope="module")
def crop_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("crops")
    rng = np.random.RandomState(0)
    files = {}
    for i, n in enumerate([10, 3, 2, 500]):      # incl. below-min and big
        pts = rng.randn(n, 3).astype(np.float32)
        p = os.path.join(d, f"obj{i}_pts_xyz.bin")
        pts.tofile(p)
        files[p] = pts
    return files


def test_native_builds():
    assert native.build(), "g++ build of libpcrloader.so failed"
    assert native.available()


def test_point_batch_values_and_semantics(crop_dir):
    paths = list(crop_dir) + [list(crop_dir)[0] + ".missing"]
    k = 16
    batch, counts = native.load_point_batch(paths, k, seeds=range(len(paths)))
    assert batch.shape == (len(paths), k, 3)
    for b, p in enumerate(paths):
        if p.endswith(".missing"):
            assert counts[b] == -1 and np.all(batch[b] == 0)
            continue
        pts = crop_dir[p]
        assert counts[b] == len(pts)
        if len(pts) < 3:                          # below min_points -> zeros
            assert np.all(batch[b] == 0)
        else:                                     # every row is a real point
            d = np.linalg.norm(batch[b][:, None, :] - pts[None], axis=-1)
            assert np.all(d.min(axis=1) < 1e-6)


def test_point_batch_deterministic(crop_dir):
    paths = list(crop_dir)
    a, _ = native.load_point_batch(paths, 32, seeds=[7] * len(paths))
    b, _ = native.load_point_batch(paths, 32, seeds=[7] * len(paths))
    c, _ = native.load_point_batch(paths, 32, seeds=[8] * len(paths))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a[3], c[3])         # big file: different draw


def test_blob_batch(crop_dir, tmp_path):
    img = np.random.RandomState(1).randn(3, 4, 4).astype(np.float32)
    p = os.path.join(tmp_path, "img_crop.bin")
    img.tofile(p)
    batch, ok = native.load_blob_batch([p, p + ".missing"], (3, 4, 4))
    assert ok.tolist() == [1, -1]
    np.testing.assert_array_equal(batch[0], img)
    assert np.all(batch[1] == 0)


def test_point_batch_no_native_fallback(crop_dir, monkeypatch):
    monkeypatch.setattr(native, "_load", lambda: None)
    paths = list(crop_dir)
    batch, counts = native.load_point_batch(paths, 8, seeds=range(len(paths)))
    assert batch.shape == (len(paths), 8, 3)
    assert counts[0] == 10


def test_cropstore_native_batch(tmp_path):
    """CropStore.load_point_batch: native batched reads match per-item loads."""
    from point_cloud_reid_tpu.data.store import CropStore, SyntheticStore

    syn = SyntheticStore(num_objects=6, frames_per_obj=3, seed=1)
    root = os.path.join(tmp_path, "store")
    syn.save(root)
    store = CropStore(root)
    pairs = [(tok, f) for tok, rec in store.objects.items()
             for f in store.filtered_frames(rec)[:2]][:8]
    batch, counts = store.load_point_batch(pairs, 16, seeds=range(len(pairs)))
    assert batch.shape == (len(pairs), 16, 3)
    for b, (tok, f) in enumerate(pairs):
        pts = store.load_points(tok, f)
        assert counts[b] == len(pts)
        if len(pts) >= 3:
            d = np.linalg.norm(batch[b][:, None, :] - pts[None], axis=-1)
            assert np.all(d.min(axis=1) < 1e-6)
