"""Data frontend: crop store, density-bucket index, pair samplers, batch pipeline.

Rebuilds the reference's dataset stack (SURVEY.md §2.3) without lamtk/mmcv:
  store.py     — object crop store (pts_xyz.bin / img_crop.bin layout,
                 object_loader_base.py:247-301 semantics) + synthetic generator
  buckets.py   — power-of-2 density bucketing (object_loader_base.py:154-238)
  samplers.py  — train pair sampler (reidentification_nuscenes.py:37-72) and
                 seeded point-count-matched val pairs (ValEven, :151-246)
  pipeline.py  — subsamplePC + fixed-shape batch collation + device prefetch
"""
from .buckets import DensityBuckets, POW2_BUCKETS
from .pipeline import subsample_pc_np, collate_pairs, BatchLoader
from .samplers import (PairDataset, ValEvenPairs, ValErrPairs,
                       ClassBalancedPairs, ConcatPairs, RepeatPairs,
                       TrackingErrorsSampler, build_pair_dataset)
from .store import (CompleteStore, CropStore, FakeCompleteStore,
                    SyntheticStore, ObjectRecord)

__all__ = [
    "DensityBuckets", "POW2_BUCKETS", "subsample_pc_np", "collate_pairs",
    "BatchLoader", "PairDataset", "ValEvenPairs", "build_pair_dataset",
    "ConcatPairs", "RepeatPairs",
    "CropStore", "SyntheticStore", "ObjectRecord",
]
