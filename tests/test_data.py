"""Data-frontend tests: synthetic store, density buckets, pair samplers, pipeline.

The reference has no tests for any of this (SURVEY.md §4); sampler invariants here
encode the documented behavior of reidentification_base.py / object_loader_base.py.
"""
import numpy as np
import pytest

from point_cloud_reid_tpu.data import (
    BatchLoader, DensityBuckets, PairDataset, SyntheticStore, ValEvenPairs,
    collate_pairs, subsample_pc_np,
)
from point_cloud_reid_tpu.data.buckets import bucket_of

pytestmark = pytest.mark.quick

CLASSES = [f"class_{i}" for i in range(10)]
CLS_TO_IDX = {c: i for i, c in enumerate(CLASSES)}
TRACKING = {c: c for c in CLASSES}


def make_dataset(split="train", **kw):
    store = SyntheticStore(num_objects=40, frames_per_obj=6, seed=3)
    common = dict(store=store, classes=CLASSES, cls_to_idx=CLS_TO_IDX,
                  tracking_classes=TRACKING, subsample_sparse=32,
                  subsample_dense=64, with_dense=True, **kw)
    if split == "val":
        return ValEvenPairs(max_combinations=4, validation_seed=7, **common)
    return PairDataset(seed=0, **common)


def test_subsample_pc_semantics(rng):
    # resample-with-replacement to fixed n (datasets/utils.py:606-621)
    pc = rng.randn(50, 3).astype(np.float32)
    out = subsample_pc_np(np.random.RandomState(0), pc, 16)
    assert out.shape == (16, 3)
    # every output row is one of the input rows
    assert all(any(np.allclose(r, p) for p in pc) for r in out)
    # < 3 points -> zeros
    assert (subsample_pc_np(np.random.RandomState(0), pc[:2], 16) == 0).all()
    # exact-size input is passed through unchanged
    pc32 = rng.randn(32, 3).astype(np.float32)
    np.testing.assert_array_equal(subsample_pc_np(np.random.RandomState(0), pc32, 32), pc32)


def test_bucket_of():
    assert bucket_of(1) == 0 and bucket_of(2) == 1 and bucket_of(3) == 1
    assert bucket_of(127) == 6 and bucket_of(128) == 7
    assert bucket_of(0) == 0


def test_train_sampler_pair_semantics():
    ds = make_dataset("train")
    assert len(ds) > 0
    saw_pos = saw_neg = saw_fp = False
    for i in range(60):
        it = ds.sample(i % len(ds))
        assert it["sparse_1"].shape == (32, 3)
        assert it["dense_1"].shape == (64, 3)
        same_id = int(it["id_1"]) == int(it["id_2"])
        if same_id and it["id_1"] != -1:
            saw_pos = True
            assert it["label_1"] == it["label_2"]
        else:
            saw_neg = True
            # negatives are same-class TP or the FP-shifted class
            assert (it["label_2"] == it["label_1"]) or (
                it["label_2"] == it["label_1"] + len(CLASSES))
            if it["id_2"] == -1:
                saw_fp = True
    assert saw_pos and saw_neg and saw_fp


def test_val_even_deterministic_and_balanced():
    ds1 = make_dataset("val")
    ds2 = make_dataset("val")
    assert ds1.dump_pairs() == ds2.dump_pairs()  # seeded determinism
    n = len(ds1)
    assert n == 2 * len(ds1.val_positives)
    # first half positives, second half negatives
    it_pos = ds1.sample(0)
    assert int(it_pos["id_1"]) == int(it_pos["id_2"])
    it_neg = ds1.sample(n - 1)
    assert (int(it_neg["id_1"]) != int(it_neg["id_2"])) or it_neg["id_1"] == -1


def test_val_even_density_matched():
    ds = make_dataset("val")
    # negative's frame point count should be in a nearby bucket of pts2
    offs = []
    for pos, neg in zip(ds.val_positives[:40], ds.val_negatives[:40]):
        n2 = ds.store.objects[neg["tok2"]].num_pts[neg["o2"]]
        offs.append(abs(bucket_of(n2) - bucket_of(pos["pts2"])))
    assert np.mean(offs) <= 1.5  # mostly same bucket, fallback walks allowed


def test_batch_loader_shapes_and_order():
    ds = make_dataset("train")
    loader = BatchLoader(ds, batch_size=8, shuffle=True, seed=0, num_threads=2)
    batches = list(loader)
    assert len(batches) == len(ds) // 8
    b = batches[0]
    assert b["sparse_1"].shape == (8, 32, 3)
    assert b["label_1"].shape == (8,)
    assert b["label_1"].dtype == np.int32
    # determinism of index order across iterations with same epoch
    again = list(BatchLoader(ds, batch_size=8, shuffle=True, seed=0,
                             num_threads=1))
    np.testing.assert_array_equal(batches[0]["size_1"], again[0]["size_1"])


def test_batch_loader_sharding():
    """num_shards partitions every global batch into disjoint contiguous
    blocks that reassemble the unsharded batch — the DistributedSampler
    contract (reference apis/train.py:34-45) matched to the row layout
    shard_batch's make_array_from_process_local_data assembles."""
    ds = make_dataset("train")
    full = list(BatchLoader(ds, batch_size=8, shuffle=True, seed=0,
                            num_threads=1))
    shards = [list(BatchLoader(ds, batch_size=8, shuffle=True, seed=0,
                               num_threads=1, shard_id=s, num_shards=2))
              for s in range(2)]
    assert len(shards[0]) == len(full)
    for b_full, b0, b1 in zip(full, shards[0], shards[1]):
        assert b0["size_1"].shape[0] == 4
        np.testing.assert_array_equal(
            np.concatenate([b0["size_1"], b1["size_1"]]), b_full["size_1"])
    with pytest.raises(ValueError):
        BatchLoader(ds, batch_size=7, num_shards=2)
    with pytest.raises(ValueError):
        BatchLoader(ds, batch_size=8, num_shards=2, drop_last=False)


def test_batch_loader_abort_unblocks_workers():
    """A consumer that stops early must not strand workers blocked on the
    full prefetch queue (num_threads > prefetch; workers use a bounded put
    that re-checks the stop flag)."""
    import threading
    import time

    ds = make_dataset("train")
    loader = BatchLoader(ds, batch_size=2, shuffle=False, num_threads=8,
                         prefetch=2)
    assert len(loader) > 10
    base = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()                       # GeneratorExit -> finally -> stop.set()
    deadline = time.time() + 5.0
    while threading.active_count() > base and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= base


def test_image_mode():
    store = SyntheticStore(num_objects=20, frames_per_obj=4, seed=1,
                           with_images=True, crop_size=(16, 16))
    ds = PairDataset(store=store, classes=CLASSES, cls_to_idx=CLS_TO_IDX,
                     tracking_classes=TRACKING, mode="image",
                     subsample_sparse=16)
    it = ds.sample(0)
    assert it["sparse_1"].shape == (3, 16, 16)
    assert "dense_1" not in it


def test_store_roundtrip(tmp_path):
    store = SyntheticStore(num_objects=6, frames_per_obj=3, seed=2,
                           with_images=True, crop_size=(8, 8))
    store.save(str(tmp_path))
    from point_cloud_reid_tpu.data import CropStore
    disk = CropStore(str(tmp_path), min_points=5, crop_size=(8, 8))
    tok = next(iter(store.objects))
    frame = store.filtered_frames(store.objects[tok])[0]
    np.testing.assert_allclose(disk.load_points(tok, frame),
                               store.load_points(tok, frame))
    np.testing.assert_allclose(disk.load_image(tok, frame),
                               store.load_image(tok, frame))
    # missing image -> zeros (object_loader_base.py:289-295)
    missing = disk.load_image(tok, "999") if "999" in disk.objects[tok].num_pts \
        else np.zeros((3, 8, 8))
    assert missing.shape == (3, 8, 8)


def test_tracking_errors_sampler_and_valerr(tmp_path):
    """ValErrPairs builds pair lists from a tracker-error JSON and skips
    entries missing from the store (reference KeyError-continue semantics)."""
    import json

    from point_cloud_reid_tpu.data import (SyntheticStore, ValErrPairs,
                                           TrackingErrorsSampler)

    store = SyntheticStore(num_objects=10, frames_per_obj=4, seed=3,
                           class_names=["car", "pedestrian"])
    toks = [t for t, r in store.objects.items() if not r.is_fp]
    by_cls = {}
    for t in toks:
        by_cls.setdefault(store.objects[t].class_name, []).append(t)
    cls_name = max(by_cls, key=lambda c: len(by_cls[c]))
    objs = by_cls[cls_name]
    frames = store.filtered_frames(store.objects[objs[0]])
    err = {cls_name: {"0.5": {
        "positives": [
            {"prev_sample_token": frames[0], "curr_sample_token": frames[1],
             "object_token": objs[0]},
            {"prev_sample_token": "nope", "curr_sample_token": frames[1],
             "object_token": objs[0]},           # missing frame -> skipped
        ],
        "negatives": [
            {"prev_sample_token": frames[0], "curr_sample_token": frames[1],
             "prev_object_token": objs[0], "curr_object_token": objs[1]},
        ]}}}
    path = tmp_path / "errors.json"
    path.write_text(json.dumps(err))

    tes = TrackingErrorsSampler(str(path))
    assert tes.classes == [cls_name]
    assert len(tes.get_positives()[cls_name]) == 2

    ds = ValErrPairs(
        store=store, classes=["car", "pedestrian"],
        cls_to_idx={"car": 0, "pedestrian": 1},
        tracking_classes={"car": "car", "pedestrian": "pedestrian"},
        err_filepath=str(path), subsample_sparse=16)
    assert len(ds.val_positives) == 1          # the missing-frame one dropped
    assert len(ds.val_negatives) == 1
    assert len(ds) == 2
    pos = ds.sample(0)
    neg = ds.sample(1)
    assert pos["id_1"] == pos["id_2"]
    assert neg["id_1"] != neg["id_2"]


def test_class_balanced_pairs():
    from point_cloud_reid_tpu.data import (ClassBalancedPairs, PairDataset,
                                           SyntheticStore)
    import numpy as np

    store = SyntheticStore(num_objects=40, frames_per_obj=4, seed=4,
                           class_names=["car", "pedestrian"])
    ds = PairDataset(store=store, classes=["car", "pedestrian"],
                     cls_to_idx={"car": 0, "pedestrian": 1},
                     tracking_classes={"car": "car",
                                       "pedestrian": "pedestrian"},
                     subsample_sparse=16)
    cb = ClassBalancedPairs(ds, oversample_thr=0.5)
    assert len(cb) >= len(ds)
    labels = np.asarray(ds.tp_labels)[cb.indices]
    _, counts = np.unique(labels, return_counts=True)
    # balanced-ish: rarest class at least half of the most common
    assert counts.min() * 2 >= counts.max() * 0.5
    item = cb.sample(0)
    assert item["sparse_1"].shape == (16, 3)


def test_concat_repeat_wrappers(tmp_path):
    """Concat/Repeat dataset wrappers (reference builder dispatch,
    mmdet3d/datasets/builder.py:25-35): length arithmetic, index routing,
    and batch/per-item agreement through the wrappers."""
    from point_cloud_reid_tpu.data import (ConcatPairs, CropStore,
                                           RepeatPairs, SyntheticStore,
                                           build_pair_dataset)

    SyntheticStore(num_objects=30, frames_per_obj=5, seed=5).save(
        str(tmp_path))
    store = CropStore(str(tmp_path), min_points=5)
    cfg = dict(classes=CLASSES, cls_to_idx=CLS_TO_IDX,
               tracking_classes=TRACKING, subsample_sparse=16, split="train")

    rep = build_pair_dataset(dict(type="repeat", dataset=cfg, times=3), store)
    assert isinstance(rep, RepeatPairs)
    base = rep.dataset
    assert len(rep) == 3 * len(base)
    # i and i + len(base) alias the same local sample
    a, b = rep.sample(1), rep.sample(1 + len(base))
    np.testing.assert_array_equal(a["sparse_1"], b["sparse_1"])
    assert a["id_1"] == b["id_1"] and a["id_2"] == b["id_2"]

    cat = build_pair_dataset([cfg, dict(cfg, seed=9)], store)
    assert isinstance(cat, ConcatPairs)
    assert len(cat) == 2 * len(base)
    # second member starts at offset len(base)
    first_of_second = cat.sample(len(base))
    np.testing.assert_array_equal(
        first_of_second["sparse_1"], cat.datasets[1].sample(0)["sparse_1"])

    # batched path groups per member and reassembles in order
    assert cat.supports_batch_load
    idxs = [0, len(base), 3, len(base) + 3, 1]
    batch = cat.sample_batch(idxs)
    ref = collate_pairs([cat.sample(i) for i in idxs])
    for k in ("label_1", "label_2", "id_1", "id_2", "size_1", "size_2"):
        np.testing.assert_array_equal(batch[k], ref[k])

    with pytest.raises(ValueError):
        RepeatPairs(base, 0)
    with pytest.raises(ValueError):
        ConcatPairs([])

    # set_epoch must NOT collapse member streams: two members over the same
    # store get distinct per-member seeds (regression: a verbatim seed
    # broadcast made datasets[0].sample(i) == datasets[1].sample(i) exactly)
    cat.set_epoch(1, seed=7)
    same = sum(
        np.array_equal(cat.datasets[0].sample(i)["sparse_1"],
                       cat.datasets[1].sample(i)["sparse_1"])
        for i in range(8))
    assert same < 8
    # ...while a 1-member concat stays stream-identical to the bare dataset
    solo = build_pair_dataset(dict(cfg), store)
    lone = ConcatPairs([build_pair_dataset(dict(cfg), store)])
    solo.set_epoch(1, seed=7)
    lone.set_epoch(1, seed=7)
    np.testing.assert_array_equal(solo.sample(2)["sparse_1"],
                                  lone.sample(2)["sparse_1"])
    # batched path agrees with per-item PAIR IDENTITY after set_epoch (the
    # vectorized scatter must not permute rows; raw arrays differ by the
    # batch/per-item resampling-draw contract, same as the bare dataset)
    batch = cat.sample_batch(idxs)
    ref = collate_pairs([cat.sample(i) for i in idxs])
    for k in ("label_1", "label_2", "id_1", "id_2", "size_1", "size_2"):
        np.testing.assert_array_equal(batch[k], ref[k])
    assert batch["sparse_1"].shape == ref["sparse_1"].shape


def test_valerr_pairs_reference_filtered_out_objects(tmp_path):
    """Val pair lists may reference store objects that were EXCLUDED from
    the sampling index (e.g. too few usable frames for min_pos_frames) —
    they must still resolve, like the reference's string-keyed val lists
    (regression: _PlanTables indexed only sampling-eligible objects and
    from_artifact pairs naming others raised KeyError)."""
    from point_cloud_reid_tpu.data import SyntheticStore, ValEvenPairs

    store = SyntheticStore(num_objects=12, frames_per_obj=4, seed=6,
                           class_names=["car", "pedestrian"])
    common = dict(store=store, classes=["car", "pedestrian"],
                  cls_to_idx={"car": 0, "pedestrian": 1},
                  tracking_classes={"car": "car", "pedestrian": "pedestrian"},
                  subsample_sparse=16)
    # an object with only ONE usable frame is dropped from the sampling
    # index (min_pos_frames=2) but stays in the store
    probe = ValEvenPairs(build_pairs=False, **common)
    victim = probe.tp_tokens[0]
    rec = store.objects[victim]
    frames = sorted(rec.num_pts)
    keep = frames[0]
    for f in frames[1:]:
        rec.num_pts[f] = 0                     # below min_points -> unusable
    other = [t for t in probe.tp_tokens[1:]
             if store.objects[t].class_name == rec.class_name][0]
    o_frames = sorted(store.objects[other].num_pts)

    pairs = dict(
        positives=[dict(tok=victim, o1=keep, o2=keep, cls=0)],
        negatives=[dict(tok1=victim, o1=keep, cls1=0,
                        tok2=other, o2=o_frames[0], cls2=0)])
    ds = ValEvenPairs.from_artifact(pairs, **common)
    assert victim not in ds.tp_tokens          # really filtered out
    item = ds.sample(0)
    assert item["sparse_1"].shape == (16, 3)
    neg = ds.sample(1)
    assert neg["id_1"] != neg["id_2"]
    plan = ds.plan_batch([0, 1])               # the batched-planner path
    assert plan["u1"].shape == (2,)


def test_distance_metadata_end_to_end():
    """Every sampled item carries real per-frame ego BEV distances matching
    the store metadata (reidentification_waymo.py:168-196 semantics)."""
    ds = make_dataset("val")
    seen = []
    for i in range(len(ds)):
        it = ds.sample(i)
        for slot in ("dist_1", "dist_2"):
            assert it[slot].dtype == np.float32
            seen.append(float(it[slot]))
    seen = np.asarray(seen)
    assert (seen >= 0).all()           # synthetic store has full metadata
    assert len(np.unique(seen)) > 10   # real per-frame values, not a constant

    # values round-trip exactly from the store records
    x = ds.val_positives[0]
    it = ds.sample(int(np.where(ds._perm_cache == 0)[0][0]))
    rec = ds.store.objects[x["tok"]]
    np.testing.assert_allclose(float(it["dist_1"]), rec.distance[x["o1"]],
                               rtol=1e-6)
    np.testing.assert_allclose(float(it["dist_2"]), rec.distance[x["o2"]],
                               rtol=1e-6)


def test_image_mode_real_point_counts():
    """Image items report the crop's true LiDAR point count, not the token
    constant (reidentification_nuscenes.py:329-331)."""
    store = SyntheticStore(num_objects=20, frames_per_obj=4, seed=1,
                           with_images=True, crop_size=(16, 16))
    ds = ValEvenPairs(store=store, classes=CLASSES, cls_to_idx=CLS_TO_IDX,
                      tracking_classes=TRACKING, mode="image",
                      subsample_sparse=16, max_combinations=4,
                      validation_seed=7)
    sizes = np.array([[int(ds.sample(i)["size_1"]),
                       int(ds.sample(i)["size_2"])] for i in range(len(ds))])
    assert (sizes > 0).all()
    assert len(np.unique(sizes)) > 5            # varies per pair
    assert not (sizes == 16).all()              # not the token constant

    x = ds.val_positives[0]
    it = ds.sample(int(np.where(ds._perm_cache == 0)[0][0]))
    rec = ds.store.objects[x["tok"]]
    assert int(it["size_1"]) == rec.num_pts[x["o1"]]
    assert int(it["size_2"]) == rec.num_pts[x["o2"]]


def test_store_distance_roundtrip(tmp_path):
    store = SyntheticStore(num_objects=6, frames_per_obj=3, seed=2)
    store.save(str(tmp_path))
    from point_cloud_reid_tpu.data import CropStore
    disk = CropStore(str(tmp_path), min_points=5)
    tok = next(iter(store.objects))
    assert disk.objects[tok].distance == store.objects[tok].distance
    assert disk.objects[tok].distance  # non-empty


def test_planner_scale_realistic_index():
    """Host data-frontend scale regression at a realistic index size
    (VERDICT r4 item 3): real nuScenes-ReID exports carry tens of thousands
    of tracks (the reference indexes the full export,
    reidentification_base.py:202-249). Pin the measured-linear bounds from
    tools/profile_planner_scale.py (80k objects: tables 6.4 s / 58 MB,
    plan_batch ~160-205k samples/s flat across index sizes, ValEven linear
    in pairs) with generous CI slack at 20k objects — a super-linear
    regression in _PlanTables flattening, neg_table construction, or the
    ValEven combo enumeration blows these bounds immediately."""
    import time

    from point_cloud_reid_tpu.data import ValEvenPairs

    classes = [f"class_{i}" for i in range(10)]
    common = dict(classes=classes,
                  cls_to_idx={c: i for i, c in enumerate(classes)},
                  tracking_classes={c: c for c in classes},
                  subsample_sparse=128)
    store = SyntheticStore(num_objects=20_000, frames_per_obj=8, seed=1,
                           metadata_only=True)

    t0 = time.perf_counter()
    ds = PairDataset(store=store, seed=0, **common)
    tables = ds._tables()
    build_s = time.perf_counter() - t0
    # loose backstop only (a super-linear regression measures minutes; an
    # oversubscribed CI host measures seconds) — the tight signal is the
    # deterministic table footprint below
    assert build_s < 60.0, f"planner build {build_s:.1f}s at 20k objects"
    table_mb = sum(v.nbytes for v in tables.__dict__.values()
                   if isinstance(v, np.ndarray)) / 1e6
    assert table_mb < 60.0, f"tables {table_mb:.0f} MB at 20k objects"

    def plan_sps(d):
        B = 2048
        d.set_epoch(1)
        d.plan_batch(np.arange(B))               # warm
        t0 = time.perf_counter()
        for r in range(8):
            plan = d.plan_batch(np.arange(r * B, (r + 1) * B))
        return 8 * B / (time.perf_counter() - t0), plan

    # measured ~160k sps and index-size INDEPENDENT (the vectorized planner
    # only touches per-batch rows) — pin that invariant as a same-process
    # ratio against a 10x-smaller index so host contention cancels, plus a
    # loose absolute floor (8-chip v5e-8 mesh demand is ~17.7k solo)
    small = PairDataset(store=SyntheticStore(
        num_objects=2_000, frames_per_obj=8, seed=1, metadata_only=True),
        seed=0, **common)
    sps_small, _ = plan_sps(small)
    sps, plan = plan_sps(ds)
    assert sps > 0.3 * sps_small, (
        f"plan_batch {sps:.0f} samples/s at 20k objects vs {sps_small:.0f} "
        "at 2k — planning cost grew with index size")
    assert sps > 10_000, f"plan_batch {sps:.0f} samples/s at 20k objects"
    assert plan["u1"].shape == (2048,)
    assert np.isin(plan["is_pos"], [0, 1]).all()

    t0 = time.perf_counter()
    val = ValEvenPairs(store=store, validation_seed=0, max_combinations=10,
                       **common)
    val._val_arrays()
    val_s = time.perf_counter() - t0
    assert len(val) == 2 * 10 * 15_000           # 10 combos x TP objects
    assert val_s < 180.0, f"ValEven build {val_s:.1f}s at 20k objects"
