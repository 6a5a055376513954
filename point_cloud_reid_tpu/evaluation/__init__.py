"""Evaluation: stratified ReID matching metrics + tracking-eval summaries.

Rebuilds the reference's MatchingEval engine (mmdet3d/datasets/utils.py:249-531),
the dataset-level evaluate() aggregator (reidentification_base.py:87-199) and
the tracking-eval summarization tables (core/hooks/utils.py:26-242) as
vectorized numpy / plain counters — no GPU round-trip, no filesystem gather.
"""
from .matching import (
    MatchingEval,
    evaluate_results,
    f1_precision_recall,
)
from .tracking_summary import TrackingEvalAccumulator

__all__ = ["MatchingEval", "evaluate_results", "f1_precision_recall",
           "TrackingEvalAccumulator"]
