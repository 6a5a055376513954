"""Native C++ crop loader: build, correctness vs numpy, determinism."""
import os

import numpy as np
import pytest

from point_cloud_reid_tpu import native

pytestmark = pytest.mark.quick


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


def _mk_disk_dataset(tmp_path, **kw):
    from point_cloud_reid_tpu.data import CropStore, PairDataset, SyntheticStore
    syn = SyntheticStore(num_objects=30, frames_per_obj=5, seed=4)
    syn.save(str(tmp_path))
    store = CropStore(str(tmp_path), min_points=5)
    classes = [f"class_{i}" for i in range(10)]
    return PairDataset(store=store, classes=classes,
                       cls_to_idx={c: i for i, c in enumerate(classes)},
                       tracking_classes={c: c for c in classes},
                       subsample_sparse=32, seed=0, **kw), syn


def test_sample_batch_matches_per_item_metadata(tmp_path):
    """The batched native path picks the SAME pairs/labels/metadata as the
    per-item path; only the resample RNG stream differs (documented)."""
    ds, syn = _mk_disk_dataset(tmp_path)
    assert ds.supports_batch_load
    idxs = list(range(12))
    batch = ds.sample_batch(idxs)
    from point_cloud_reid_tpu.data import collate_pairs
    ref = collate_pairs([ds.sample(i) for i in idxs])

    for k in ("label_1", "label_2", "id_1", "id_2", "size_1", "size_2",
              "vis_1", "vis_2", "dist_1", "dist_2"):
        np.testing.assert_array_equal(batch[k], ref[k], err_msg=k)
    assert batch["sparse_1"].shape == ref["sparse_1"].shape

    # every resampled point must belong to the planned crop (or be the
    # all-zeros <3-point sentinel)
    plans = [ds._plan(i) for i in idxs]
    for b, p in enumerate(plans):
        crop = syn.load_points(p["tok1"], p["f1"])
        got = batch["sparse_1"][b]
        if crop.shape[0] <= 2:
            assert np.all(got == 0)
            continue
        d = np.abs(got[:, None, :] - crop[None, :, :]).sum(-1).min(1)
        assert d.max() < 1e-6


def test_sample_batch_deterministic(tmp_path):
    ds, _ = _mk_disk_dataset(tmp_path)
    a = ds.sample_batch(range(8))
    b = ds.sample_batch(range(8))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    ds.set_epoch(1)
    c = ds.sample_batch(range(8))
    assert any(not np.array_equal(a[k], c[k]) for k in a)


def test_batch_loader_uses_native_path(tmp_path):
    """BatchLoader over an on-disk CropStore takes the sample_batch path and
    trains end-to-end shapes; dense mode falls back to per-item."""
    from point_cloud_reid_tpu.data import BatchLoader
    ds, _ = _mk_disk_dataset(tmp_path)
    loader = BatchLoader(ds, batch_size=8, shuffle=True, seed=0,
                         num_threads=2)
    batches = list(loader)
    assert len(batches) == len(ds) // 8
    assert batches[0]["sparse_1"].shape == (8, 32, 3)
    assert batches[0]["dist_1"].dtype == np.float32

    ds2, _ = _mk_disk_dataset(tmp_path, with_dense=True)
    assert not ds2.supports_batch_load     # dense RNG rides per-item stream
    loader2 = BatchLoader(ds2, batch_size=8, shuffle=True, seed=0,
                          num_threads=1)
    b2 = next(iter(loader2))
    assert "dense_1" in b2


def test_val_even_sample_batch(tmp_path):
    from point_cloud_reid_tpu.data import CropStore, ValEvenPairs, SyntheticStore
    syn = SyntheticStore(num_objects=30, frames_per_obj=5, seed=4)
    syn.save(str(tmp_path))
    store = CropStore(str(tmp_path), min_points=5)
    classes = [f"class_{i}" for i in range(10)]
    ds = ValEvenPairs(store=store, classes=classes,
                      cls_to_idx={c: i for i, c in enumerate(classes)},
                      tracking_classes={c: c for c in classes},
                      subsample_sparse=32, max_combinations=3,
                      validation_seed=7)
    assert ds.supports_batch_load
    idxs = list(range(min(16, len(ds))))
    batch = ds.sample_batch(idxs)
    from point_cloud_reid_tpu.data import collate_pairs
    ref = collate_pairs([ds.sample(i) for i in idxs])
    for k in ("label_1", "label_2", "id_1", "id_2", "size_1", "size_2"):
        np.testing.assert_array_equal(batch[k], ref[k], err_msg=k)


def test_image_sample_batch_matches_per_item(tmp_path):
    """Image-mode batched path: bit-exact vs per-item (no resample RNG),
    true LiDAR point counts in size_*, zeros for missing crops."""
    from point_cloud_reid_tpu.data import (CropStore, PairDataset,
                                           SyntheticStore, collate_pairs)
    syn = SyntheticStore(num_objects=24, frames_per_obj=4, seed=6,
                         with_images=True, crop_size=(12, 12))
    syn.save(str(tmp_path))
    store = CropStore(str(tmp_path), min_points=5, crop_size=(12, 12))
    classes = [f"class_{i}" for i in range(10)]
    ds = PairDataset(store=store, classes=classes,
                     cls_to_idx={c: i for i, c in enumerate(classes)},
                     tracking_classes={c: c for c in classes},
                     mode="image", subsample_sparse=12, seed=0)
    assert ds.supports_batch_load
    idxs = list(range(min(12, len(ds))))
    batch = ds.sample_batch(idxs)
    ref = collate_pairs([ds.sample(i) for i in idxs])
    assert batch["sparse_1"].shape == (len(idxs), 3, 12, 12)
    for k in ref:
        np.testing.assert_array_equal(batch[k], ref[k], err_msg=k)

    # missing crop file -> zero image in both paths (soft failure)
    p0 = ds._plan(0)
    path = os.path.join(store._frame_dir(store.objects[p0["tok1"]],
                                         p0["f1"]), "img_crop.bin")
    os.rename(path, path + ".bak")
    try:
        b2 = ds.sample_batch([0])
        assert np.all(b2["sparse_1"][0] == 0)
        np.testing.assert_array_equal(
            b2["sparse_1"][0], ds.sample(0)["sparse_1"])
    finally:
        os.rename(path + ".bak", path)


def test_image_batch_oversized_stored_crops(tmp_path):
    """Records stored at a larger crop size than the loader's are read at
    the stored size and truncated (object_loader_base.py:285-287)."""
    from point_cloud_reid_tpu.data import CropStore, SyntheticStore
    syn = SyntheticStore(num_objects=8, frames_per_obj=3, seed=7,
                         with_images=True, crop_size=(16, 16))
    syn.save(str(tmp_path))
    store = CropStore(str(tmp_path), min_points=5, crop_size=(10, 10))
    tok = next(iter(store.objects))
    frame = store.filtered_frames(store.objects[tok])[0]
    batch, ok = store.load_image_batch([(tok, frame)])
    assert batch.shape == (1, 3, 10, 10) and ok[0] == 1
    np.testing.assert_array_equal(batch[0], store.load_image(tok, frame))


def test_image_batch_undersized_missing_soft_fails(tmp_path):
    """Per-item parity: a MISSING file on an undersized-stored record
    soft-fails to zeros (load_image catches FileNotFoundError before the
    undersize check); an EXISTING undersized crop still fails fast."""
    from point_cloud_reid_tpu.data import CropStore, SyntheticStore
    syn = SyntheticStore(num_objects=8, frames_per_obj=3, seed=9,
                         with_images=True, crop_size=(6, 6))
    syn.save(str(tmp_path))
    store = CropStore(str(tmp_path), min_points=5, crop_size=(10, 10))
    tok = next(t for t, r in store.objects.items() if not r.is_fp)
    frames = store.filtered_frames(store.objects[tok])
    assert len(frames) >= 2
    path = os.path.join(store._frame_dir(store.objects[tok], frames[0]),
                        "img_crop.bin")
    os.remove(path)
    batch, ok = store.load_image_batch([(tok, frames[0])])
    assert ok[0] == -1 and np.all(batch[0] == 0)
    np.testing.assert_array_equal(batch[0], store.load_image(tok, frames[0]))
    with pytest.raises(ValueError):
        store.load_image_batch([(tok, frames[1])])   # file exists, too small

    # a TRUNCATED undersized crop also soft-fails in both paths — load_image
    # catches its reshape ValueError inside the zeros-fallback try
    path2 = os.path.join(store._frame_dir(store.objects[tok], frames[1]),
                         "img_crop.bin")
    with open(path2, "r+b") as fh:
        fh.truncate(os.path.getsize(path2) // 2)
    batch, ok = store.load_image_batch([(tok, frames[1])])
    assert ok[0] == -1 and np.all(batch[0] == 0)
    np.testing.assert_array_equal(batch[0], store.load_image(tok, frames[1]))


def test_token_map_coverage_fail_fast(tmp_path):
    """A staged token_to_int.pkl that misses a TP token must fail at store
    LOAD, not as a KeyError deep inside epoch-1 sampling."""
    import pickle
    from point_cloud_reid_tpu.data import CropStore, SyntheticStore
    syn = SyntheticStore(num_objects=10, frames_per_obj=3, seed=3)
    syn.save(str(tmp_path))
    tps = sorted(t for t, r in syn.objects.items() if not r.is_fp)
    bad_map = {t: i for i, t in enumerate(tps[1:])}       # drop one TP token
    with open(tmp_path / "token_to_int.pkl", "wb") as f:
        pickle.dump(bad_map, f)
    with pytest.raises(ValueError, match="missing 1 TP object token"):
        CropStore(str(tmp_path), min_points=5)
    # complete map loads fine
    with open(tmp_path / "token_to_int.pkl", "wb") as f:
        pickle.dump({t: i for i, t in enumerate(tps)}, f)
    store = CropStore(str(tmp_path), min_points=5)
    assert store.token_to_int[tps[0]] == 0
