"""Inference: amortized NxN pair scoring (the tracking workload).

Rebuilds the reference's PointReidentifier/ImageReidentifier cost-matrix path
(trackers/deprecated/tracking_point_reid.py:38-215, SURVEY.md §3.5) as one
fused batched program instead of per-pair forward passes.
"""
from .pair_scoring import PairScorer, FeatureCache

__all__ = ["PairScorer", "FeatureCache"]
