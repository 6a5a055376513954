"""Cross-framework val-pair parity via the frozen-artifact protocol.

The reference builds its ValEven pair lists from the GLOBAL numpy stream
(set_seeds + np.random.*, reidentification_nuscenes.py:206-246 +
reidentification_base.py:361-425); our ValEvenPairs deliberately uses
counter-based RNG. Parity is therefore established through a frozen
artifact: `_reference_val_pairs` below is a faithful transcription of the
reference algorithm (same draws from the same global stream, same bucket
lowering, including the taken_idx-is-a-frame quirk at
reidentification_nuscenes.py:233-235), and ValEvenPairs.from_artifact
consumes its output directly — the exact pair lists the reference would
evaluate, evaluated by this framework.
"""
import itertools
import json

import numpy as np

from point_cloud_reid_tpu.data import SyntheticStore, ValEvenPairs, collate_pairs
import pytest

pytestmark = pytest.mark.quick

CLASSES = [f"class_{i}" for i in range(4)]
CLS_TO_IDX = {c: i for i, c in enumerate(CLASSES)}
TRACKING = {c: c for c in CLASSES}


def _special_log(n):
    return -1 if n == 0 else np.log2(n)                 # object_loader_base.py:241


def _reference_val_pairs(store, classes, cls_to_idx, tracking_classes,
                         max_combinations, validation_seed):
    """Transcription of the reference ValEven pair construction.

    Follows reidentification_nuscenes.py:206-246 (after_collect hook),
    object_loader_base.py:154-200 (get_buckets/get_all_buckets) and
    reidentification_base.py:361-425 (get_random_other_even_val) draw for
    draw on the global numpy stream.
    """
    np.random.seed(validation_seed)                     # set_seeds
    buckets = [(2 ** x, 2 ** (x + 1)) for x in range(20)]
    obj_tokens = list(store.objects.keys())
    frames = store.frame_index()

    # collect_dataset_idx: TP objects with > 2 usable frames
    idx, cls_of = [], []
    fp_idx = []
    for i, tok in enumerate(obj_tokens):
        rec = store.objects[tok]
        key = tracking_classes.get(rec.class_name)
        if key is None:
            continue
        if rec.is_fp:
            fp_idx.append(i)
        elif len(frames[tok]) > 2:
            idx.append(i)
            cls_of.append(cls_to_idx[key])

    # get_buckets: per-object frame lists per power-of-2 bucket
    obj_buckets = {}
    for i in idx + fp_idx:
        tok = obj_tokens[i]
        rec = store.objects[tok]
        ob = {}
        for f in frames[tok]:
            b = buckets[int(_special_log(rec.num_pts[f]))]
            ob.setdefault(b, []).append(f)
        obj_buckets[tok] = ob

    # get_all_buckets: class -> bucket -> [(token, n_frames)]
    def all_buckets(index):
        out = {}
        for i in index:
            tok = obj_tokens[i]
            rec = store.objects[tok]
            key = tracking_classes.get(rec.class_name)
            if key is None:
                continue
            cls_ = ("FP_" + key) if rec.is_fp else key
            d = out.setdefault(cls_, {})
            for b, fl in obj_buckets[tok].items():
                d.setdefault(b, []).append((tok, len(fl)))
        return out

    tp_buckets = all_buckets(idx)
    fp_buckets = all_buckets(fp_idx)
    idx_to_cls_fp = {v: k for k, v in cls_to_idx.items()}
    for k, v in cls_to_idx.items():
        idx_to_cls_fp[v + len(classes)] = "FP_" + k

    val_positives = []
    for i, c in zip(idx, cls_of):
        tok = obj_tokens[i]
        combs = list(itertools.combinations(frames[tok], r=2))
        np.random.shuffle(combs)
        for o1, o2 in combs[:max_combinations]:
            val_positives.append(dict(
                o1=o1, o2=o2,
                pts1=store.objects[tok].num_pts[o1],
                pts2=store.objects[tok].num_pts[o2], tok=tok, cls=c))

    val_negatives = []
    for x in val_positives:
        taken_idx, taken_cls, pts = x["o1"], x["cls"], x["pts2"]
        b_idx = int(_special_log(pts))
        b = buckets[b_idx]
        if np.random.choice([0, 1]) == 1:               # True Positive
            while True:
                assert b_idx >= -len(buckets), "no TP bucket found"
                tps = tp_buckets.get(idx_to_cls_fp[taken_cls], {}).get(b)
                if tps is None or len(tps) == 1:
                    b_idx -= 1
                    b = buckets[b_idx]
                    continue
                break
            lst = tps
        else:                                           # False Positive
            taken_cls = taken_cls + len(classes)
            while True:
                assert b_idx >= -len(buckets), "no FP bucket found"
                fps = fp_buckets.get(idx_to_cls_fp[taken_cls], {}).get(b)
                if fps is None:
                    b_idx -= 1
                    b = buckets[b_idx]
                    continue
                break
            lst = fps
        # reference quirk: the self-exclusion compares against
        # obj_tokens[o1] — o1 is a FRAME id, not an object index
        other_token = obj_tokens[int(taken_idx)]
        for _ in range(10_000):
            if other_token != obj_tokens[int(taken_idx)]:
                break
            other = np.random.choice(len(lst), 1)[0]
            other_token = lst[other][0]
        else:
            raise AssertionError("infinite self-exclusion loop "
                                 "(bucket too sparse for the quirk)")
        frame = np.random.choice(obj_buckets[other_token][b], 1)[0]
        val_negatives.append(dict(o1=x["o1"], o2=frame, tok1=x["tok"],
                                  tok2=other_token, cls1=x["cls"],
                                  cls2=int(taken_cls)))
    return dict(positives=val_positives, negatives=val_negatives)


def _store():
    # dense buckets: every (class, bucket) cell needs >= 2 objects or the
    # reference algorithm's retry loops never terminate on small data
    return SyntheticStore(num_objects=120, frames_per_obj=6, seed=5,
                          num_classes=len(CLASSES), fp_fraction=0.4,
                          point_range=(16, 256))


def _common(store):
    return dict(store=store, classes=CLASSES, cls_to_idx=CLS_TO_IDX,
                tracking_classes=TRACKING, subsample_sparse=32,
                validation_seed=7)


def test_reference_pair_list_consumed_by_from_artifact():
    store = _store()
    pairs = _reference_val_pairs(store, CLASSES, CLS_TO_IDX, TRACKING,
                                 max_combinations=4, validation_seed=0)
    assert len(pairs["positives"]) > 50
    assert len(pairs["negatives"]) == len(pairs["positives"])

    # through JSON like a real artifact file
    pairs = json.loads(json.dumps(pairs))
    ds = ValEvenPairs.from_artifact(pairs, **_common(store))
    assert len(ds) == 2 * len(pairs["positives"])

    P = len(pairs["positives"])
    ds._perm(0)                      # materialize the shuffle table
    inv = {int(ds._perm_cache[i]): i for i in range(len(ds))}
    # every positive sampled under its artifact identity
    for j in (0, 1, P // 2, P - 1):
        x = pairs["positives"][j]
        it = ds.sample(inv[j])
        assert int(it["label_1"]) == int(it["label_2"]) == x["cls"]
        assert int(it["id_1"]) == int(it["id_2"]) == store.token_to_int[x["tok"]]
        assert int(it["size_1"]) == store.objects[x["tok"]].num_pts[str(x["o1"])]
    # every negative too (incl. FP -> id -1)
    n_fp = 0
    for j in range(P):
        x = pairs["negatives"][j]
        it = ds.sample(inv[P + j])
        assert int(it["label_1"]) == x["cls1"]
        assert int(it["label_2"]) == x["cls2"]
        if store.objects[x["tok2"]].is_fp:
            assert int(it["id_2"]) == -1
            n_fp += 1
        else:
            assert int(it["id_2"]) == store.token_to_int[x["tok2"]]
    assert n_fp > 0                                     # both branches hit

    # density matching held for the bulk of pairs: the reference lowers
    # b_idx until the class has candidates, and when none exist below, the
    # decrement wraps through python negative indexing into HIGH buckets
    # (faithful quirk of reidentification_base.py:379-415) — so a minority
    # of negatives may land in a larger bucket
    from point_cloud_reid_tpu.data.buckets import bucket_of
    ok = 0
    for j in range(P):
        x = pairs["negatives"][j]
        pos = pairs["positives"][j]          # negatives are index-aligned
        nb = bucket_of(store.objects[x["tok2"]].num_pts[str(x["o2"])])
        ok += nb <= bucket_of(pos["pts2"])
    assert ok / P > 0.8


def test_dump_pairs_roundtrip_identical_items():
    store = _store()
    ds = ValEvenPairs(max_combinations=4, **_common(store))
    art = json.loads(json.dumps(ds.dump_pairs()))
    ds2 = ValEvenPairs.from_artifact(art, **_common(store))
    assert len(ds) == len(ds2)
    idxs = list(range(0, len(ds), max(1, len(ds) // 40)))
    a = collate_pairs([ds.sample(i) for i in idxs])
    b = collate_pairs([ds2.sample(i) for i in idxs])
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
