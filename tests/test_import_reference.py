"""Real-dataset importer: reference lamtk-format metadata -> objects.pkl.

Builds a tiny dataset tree in the REFERENCE's on-disk format — the lamtk
metadata pickle schema consumed at object_loader_base.py:42-52 (load_metadata),
:99-141 (num_pts/visibility/nums_to_distance), :310-431 (Waymo box2d), plus
instance_token_to_id.pkl (reidentification_nuscenes.py:20-22) — and round-trips
it through tools/import_reference_store.py into a CropStore, asserting the
imported store's filtered frames, buckets, distances, and samplers match a
hand-built store over the same data.
"""
import os
import pickle

import numpy as np
import pytest

from point_cloud_reid_tpu.data import CropStore, PairDataset, ValEvenPairs
from point_cloud_reid_tpu.data.buckets import DensityBuckets
from point_cloud_reid_tpu.data.import_reference import (
    filter_by_scene_ids, import_reference_store, load_metadata)
from point_cloud_reid_tpu.data.store import ObjectRecord

pytestmark = pytest.mark.quick

CLASSES = ["car", "truck", "pedestrian"]
CLS_TO_IDX = {c: i for i, c in enumerate(CLASSES)}
TRACKING = {c: c for c in CLASSES}


def _make_reference_tree(root, rng, n_objects=10, dataset="nuscenes"):
    """Write a crop tree + lamtk-format metadata pickle exactly as the
    published exports lay them out."""
    obj_infos = {}
    for i in range(n_objects):
        is_fp = i % 4 == 3
        obj_id = f"FP_tok{i:03d}" if is_fp else f"tok{i:03d}"
        cls = CLASSES[i % len(CLASSES)]
        n_frames = 1 if is_fp else 4
        # int frame keys, exactly like the exports (get_filtered_nums indexes
        # num_pts with int(x), object_loader_base.py:116)
        frames = [10 * f + i for f in range(n_frames)]
        num_pts, vis, box2d = {}, {}, {}
        all_sizes = []
        rel = os.path.join("objects", obj_id)
        for f in frames:
            n = int(rng.randint(4, 200))
            pts = rng.randn(n, 3).astype(np.float32)
            d = os.path.join(root, rel, str(f))
            os.makedirs(d, exist_ok=True)
            pts.tofile(os.path.join(d, "pts_xyz.bin"))
            num_pts[f] = n
            vis[f] = int(rng.randint(1, 5))
            box2d[f] = rng.rand(4).tolist()
            all_sizes.append(rng.rand(3) * 50.0)
        info = dict(id=obj_id, class_name=cls, path=rel,
                    num_pts=num_pts, all_sizes=np.stack(all_sizes),
                    scene_id=f"scene{i % 2}")
        if dataset == "nuscenes":
            info["visibility"] = vis
        else:
            info["box2d"] = box2d
        obj_infos[obj_id] = info
    metadata = dict(scene_infos={"scene0": {}, "scene1": {}},
                    obj_infos=obj_infos, frame_infos={})
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    with open(os.path.join(meta_dir, "metadata.pkl"), "wb") as f:
        pickle.dump(metadata, f)
    return metadata


def _hand_built_records(metadata):
    """Independently construct the expected ObjectRecords from the metadata."""
    recs = []
    for obj_id, obj in metadata["obj_infos"].items():
        dist = {}
        for i, num in enumerate(obj["num_pts"].keys()):
            dist[str(num)] = float(
                np.sqrt((np.asarray(obj["all_sizes"])[i, :2] ** 2).sum()))
        recs.append(ObjectRecord(
            id=obj_id, class_name=obj["class_name"], path=obj["path"],
            num_pts={str(k): v for k, v in obj["num_pts"].items()},
            visibility={str(k): v
                        for k, v in obj.get("visibility", {}).items()},
            distance=dist))
    return recs


@pytest.fixture
def ref_tree(tmp_path):
    rng = np.random.RandomState(11)
    root = str(tmp_path / "export")
    metadata = _make_reference_tree(root, rng)
    return root, metadata


def test_import_matches_hand_built_store(ref_tree, tmp_path):
    root, metadata = ref_tree
    out_path, stats = import_reference_store(
        metadata_path=os.path.join(root, "metadata", "metadata.pkl"),
        data_root=root, dataset="nuscenes", verify_crops=True)
    assert stats["objects"] == 10 and stats["fp_objects"] == 2
    assert stats["with_distance"] == 10

    imported = CropStore(root, min_points=5, filter_mode="pts")

    # hand-build the equivalent store in a second root over the same crops
    hand_root = str(tmp_path / "hand")
    os.makedirs(hand_root)
    os.symlink(os.path.join(root, "objects"),
               os.path.join(hand_root, "objects"))
    with open(os.path.join(hand_root, "objects.pkl"), "wb") as f:
        pickle.dump(_hand_built_records(metadata), f)
    hand = CropStore(hand_root, min_points=5, filter_mode="pts")

    assert imported.frame_index() == hand.frame_index()
    for tok in imported.objects:
        ri, rh = imported.objects[tok], hand.objects[tok]
        assert ri.num_pts == rh.num_pts
        assert ri.visibility == rh.visibility
        assert ri.distance == pytest.approx(rh.distance)
        f0 = imported.filtered_frames(ri)
        for frame in f0[:2]:
            np.testing.assert_array_equal(imported.load_points(tok, frame),
                                          hand.load_points(tok, frame))

    # identical density-bucket structure (get_buckets/get_all_buckets)
    def buckets_of(store):
        frames = store.frame_index()
        frames = {k: v for k, v in frames.items() if v}
        class_of = {k: ("FP_" + store.objects[k].class_name
                        if store.objects[k].is_fp
                        else store.objects[k].class_name)
                    for k in frames}
        counts = {k: {f: store.objects[k].num_pts[f] for f in v}
                  for k, v in frames.items()}
        return DensityBuckets(frames, counts, class_of)

    bi, bh = buckets_of(imported), buckets_of(hand)
    assert bi.obj_buckets == bh.obj_buckets
    assert bi.class_buckets == bh.class_buckets
    for k in bi.distribution:
        np.testing.assert_allclose(bi.distribution[k], bh.distribution[k])


def test_imported_store_drives_samplers_and_val(ref_tree):
    root, _ = ref_tree
    import_reference_store(
        metadata_path=os.path.join(root, "metadata"),  # directory form
        data_root=root, dataset="nuscenes")
    store = CropStore(root, min_points=2, filter_mode="pts")
    common = dict(store=store, classes=CLASSES, cls_to_idx=CLS_TO_IDX,
                  tracking_classes=TRACKING, subsample_sparse=16,
                  subsample_dense=32)
    train = PairDataset(seed=0, **common)
    assert len(train) > 0
    for i in range(8):
        it = train.sample(i % len(train))
        assert it["sparse_1"].shape == (16, 3)
    val = ValEvenPairs(max_combinations=3, validation_seed=7, **common)
    assert len(val) > 0
    it = val.sample(0)
    assert it["sparse_1"].shape == (16, 3)
    # distance metadata flowed through the import
    assert any(v > 0 for v in store.objects[next(iter(store.objects))]
               .distance.values())


def test_waymo_box2d_visibility_and_split_filter(tmp_path):
    rng = np.random.RandomState(5)
    root = str(tmp_path / "waymo")
    metadata = _make_reference_tree(root, rng, dataset="waymo")
    _, stats = import_reference_store(
        metadata_path=os.path.join(root, "metadata", "metadata.pkl"),
        data_root=root, dataset="waymo")
    store = CropStore(root, min_points=1, filter_mode="pts and vis")
    # every frame with box2d presence passes 'pts and vis'
    for tok, rec in store.objects.items():
        assert set(rec.visibility) == set(
            str(k) for k in metadata["obj_infos"][tok]["box2d"])

    # split filtering keeps only scene0 objects
    kept = filter_by_scene_ids(metadata, ["scene0"])
    assert all(v["scene_id"] == "scene0"
               for v in kept["obj_infos"].values())
    assert 0 < len(kept["obj_infos"]) < len(metadata["obj_infos"])


def test_token_to_int_staging_and_combined_dir(tmp_path):
    rng = np.random.RandomState(7)
    root = str(tmp_path / "nus")
    metadata = _make_reference_tree(root, rng)
    # the devkit mapping: instances sorted by token (datasets/utils.py:71-76)
    toks = sorted(k for k in metadata["obj_infos"] if not k.startswith("FP"))
    mapping = {t: 1000 + i for i, t in enumerate(toks)}
    map_path = str(tmp_path / "instance_token_to_id.pkl")
    with open(map_path, "wb") as f:
        pickle.dump(mapping, f)
    import_reference_store(
        metadata_path=os.path.join(root, "metadata", "metadata.pkl"),
        data_root=root, dataset="nuscenes",
        instance_token_to_id_path=map_path)
    store = CropStore(root)
    for t, i in mapping.items():
        assert store.token_to_int[t] == i

    # directory-of-pickles metadata combines by union (load_metadata,
    # object_loader_base.py:42-52)
    md = load_metadata(os.path.join(root, "metadata"))
    assert set(md["obj_infos"]) == set(metadata["obj_infos"])


def test_complete_store_reads_reference_layout(tmp_path):
    """CompleteStore reads the published complete exports' per-object
    pts_xyz.bin layout (lamtk Loader.load_points via
    ObjectLoaderCompleteNuscenes, object_loader_base.py:469-481), with the
    synthetic-store name as fallback and zeros when absent."""
    from point_cloud_reid_tpu.data.store import CompleteStore

    root = str(tmp_path / "complete")
    rng = np.random.RandomState(3)
    pts = rng.randn(40, 3).astype(np.float32)
    d = os.path.join(root, "objects", "tok000")
    os.makedirs(d)
    pts.tofile(os.path.join(d, "pts_xyz.bin"))
    recs = [ObjectRecord(id="tok000", class_name="car",
                         path=os.path.join("objects", "tok000"), num_pts={}),
            ObjectRecord(id="tok001", class_name="car",
                         path=os.path.join("objects", "tok001"), num_pts={})]
    with open(os.path.join(root, "objects.pkl"), "wb") as f:
        pickle.dump(recs, f)
    store = CompleteStore(root, subsample_num=16)
    np.testing.assert_array_equal(store.load_complete("tok000"), pts)
    # missing object -> zeros stand-in (FakeCompleteLoader semantics)
    assert (store.load_complete("tok001") == 0).all()
    assert store.load_complete("tok001").shape == (16, 3)
