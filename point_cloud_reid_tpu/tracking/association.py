"""Track-detection association: cost gating + greedy / Hungarian assignment.

Equivalent of the reference TrackingAssociator / TrackingAssociatorMax
(trackers/deprecated/tracking_association.py:12-430) and the Center2DRange
distance gate (virtual_tracker.py:31-44). Pure numpy on host: assignment is
small and sequential; the expensive part (the ReID cost matrix) is produced
on device by inference.PairScorer.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def center_distance_gate(track_boxes: np.ndarray, det_boxes: np.ndarray,
                         max_distance: float = 2.0) -> np.ndarray:
    """(T, D) bool mask: BEV center distance within range (Center2DRange)."""
    if len(track_boxes) == 0 or len(det_boxes) == 0:
        return np.zeros((len(track_boxes), len(det_boxes)), bool)
    d = np.linalg.norm(track_boxes[:, None, :2] - det_boxes[None, :, :2],
                       axis=-1)
    return d <= max_distance


def greedy_assignment(cost: np.ndarray, threshold: float
                      ) -> List[Tuple[int, int]]:
    """Repeatedly match the globally cheapest (track, det) pair under the
    threshold (TrackingAssociatorMax greedy semantics).

    Implemented as ONE stable sort of the admissible candidates + a
    used-row/col sweep instead of a full-matrix argmin per match: the
    argmin loop re-scans T*D cells for every accepted pair, which measured
    14.9 ms/frame at the Waymo-dense tracker density (~360x256, about a
    third of the device-bound frame). Equivalent by induction: the sweep
    visits candidates in (value, flat-index) order — exactly argmin's
    first-minimum tie order — and skipping a candidate whose row/col is
    already used is the loop's post-match row/col invalidation."""
    matches = []
    if cost.size == 0:
        return matches
    T, D = cost.shape
    flat = cost.ravel()
    admissible = np.flatnonzero(np.isfinite(flat) & (flat <= threshold))
    order = admissible[np.argsort(flat[admissible], kind="stable")]
    used_t = np.zeros(T, bool)
    used_d = np.zeros(D, bool)
    for f in order:
        t, d = divmod(int(f), D)
        if not (used_t[t] or used_d[d]):
            used_t[t] = used_d[d] = True
            matches.append((t, d))
    return matches


def hungarian_assignment(cost: np.ndarray, threshold: float
                         ) -> List[Tuple[int, int]]:
    """Optimal assignment (scipy LSA — the reference's Hungarian path,
    hungarian_assigner.py:142), with post-hoc threshold filtering."""
    from scipy.optimize import linear_sum_assignment
    if cost.size == 0:
        return []
    finite = np.where(np.isfinite(cost), cost, 1e9)
    rows, cols = linear_sum_assignment(finite)
    return [(int(t), int(d)) for t, d in zip(rows, cols)
            if np.isfinite(cost[t, d]) and cost[t, d] <= threshold]


def associate(
    cost: np.ndarray,
    threshold: float = 0.5,
    method: str = "greedy",
    gate: Optional[np.ndarray] = None,
) -> Tuple[List[Tuple[int, int]], List[int], List[int]]:
    """Assign detections to tracks.

    Args:
        cost: (T, D) cost matrix (lower = better; e.g. 1 - sigmoid(reid logit)).
        threshold: maximal acceptable cost.
        method: 'greedy' or 'hungarian'.
        gate: optional (T, D) bool mask of admissible pairs (distance/class).
    Returns:
        (matches [(t, d)], unmatched_track_indices, unmatched_det_indices)
    """
    T, D = cost.shape
    c = np.asarray(cost, np.float64).copy()
    if gate is not None:
        c[~gate] = np.inf
    if method == "greedy":
        matches = greedy_assignment(c, threshold)
    elif method == "hungarian":
        matches = hungarian_assignment(c, threshold)
    else:
        raise ValueError(f"unknown association method {method}")
    mt = {t for t, _ in matches}
    md = {d for _, d in matches}
    return (matches, [t for t in range(T) if t not in mt],
            [d for d in range(D) if d not in md])
