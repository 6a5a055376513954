"""Evaluation: stratified ReID matching metrics.

Rebuilds the reference's MatchingEval engine (mmdet3d/datasets/utils.py:249-531)
and the dataset-level evaluate() aggregator (reidentification_base.py:87-199) as
vectorized numpy — no GPU round-trip, no filesystem gather.
"""
from .matching import (
    MatchingEval,
    evaluate_results,
    f1_precision_recall,
)

__all__ = ["MatchingEval", "evaluate_results", "f1_precision_recall"]
