"""Per-frame tracking orchestration.

Equivalent of the reference TrackingManager / VirtualTracker step loop
(trackers/deprecated/tracking_manager.py:221-533,
virtual_tracker.py:433-933): per frame — extract per-box crops, embed new
detections once, score the full tracks x detections grid through the ReID
match head, gate by class + BEV distance, associate, and update track
lifecycle. The whole per-frame device side (crop extraction + detection
embedding + grid scoring) is ONE jitted program with one host fetch;
everything else is tiny host numpy.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..inference import FeatureCache, PairScorer
from ..inference.pair_scoring import _round_up
from ..ops import nms_bev
from .association import associate, center_distance_gate
from .crops import extract_box_crops
from .track import Track, TrackStore

# sweep pad-bucket ladder (points per lidar frame). The crop stage's cost
# (points_in_rboxes membership + block-cumsum rank tables) is linear in the
# PADDED row count, so coarse 4x jumps directly waste device time: the r5
# intermediate rungs cut the Waymo-dense 153.6k sweep from a 262,144 pad
# (41% dead rows) to 196,608 and the 96-obj 57.6k sweep from 131,072 (2.3x)
# to 65,536. Real scenes sit in 1-2 adjacent rungs (sweep size is roughly
# constant per sensor), so the extra rungs do not multiply compiles.
SWEEP_SIZES = (2048, 8192, 32768, 65536, 131072, 196608, 262144,
               393216, 524288)


class TrackingManager:
    """ReID-driven 3D MOT.

    Args:
        scorer: inference.PairScorer over a trained ReIDNet.
        subsample_number: points per crop (128 in released configs).
        match_threshold: max association cost; cost = 1 - sigmoid(logit).
        max_distance: BEV center gate radius per frame (Center2DRange
            distance=2, virtual_tracker.py:34).
        method: 'greedy' | 'hungarian'.
        max_age / min_hits: track lifecycle (tentative-track suppression).
        nms_threshold: optional BEV-IoU NMS on incoming detections
            (tracking_manager.non_max_suppression, :172-192).
    """

    def __init__(self, scorer: PairScorer, subsample_number: int = 128,
                 match_threshold: float = 0.7, max_distance: float = 2.0,
                 method: str = "greedy", max_age: int = 3, min_hits: int = 1,
                 nms_threshold: Optional[float] = None, seed: int = 0,
                 crop_fn=None, eval_recorder=None,
                 device_cache: Optional[bool] = None,
                 cache_capacity: int = 512,
                 sparse_scoring: str = "auto"):
        """crop_fn(frame_data, boxes_padded (M,7)) -> (M, ...) crops overrides
        the default lidar extractor — the image branch passes a closure over
        tracking.image_crops.crops_per_frame (ImageReidentifier workload,
        tracking_point_reid.py:125-203). step()'s `points` argument is handed
        to crop_fn verbatim in that case."""
        self.scorer = scorer
        self.crop_fn = crop_fn
        # optional evaluation.TrackingEvalAccumulator; fed whenever step()
        # receives det_gt_ids (tracking-eval summarization,
        # core/hooks/utils.py:64-242 equivalent)
        self.eval_recorder = eval_recorder
        self.subsample_number = subsample_number
        self.match_threshold = match_threshold
        self.max_distance = max_distance
        self.method = method
        self.nms_threshold = nms_threshold
        self.store = TrackStore(max_age=max_age, min_hits=min_hits)
        self.cache = FeatureCache()
        self.timestep = -1
        self._rng = jax.random.PRNGKey(seed)
        # per-frame crop-RNG stream: constructor seed offsets the counter so
        # distinct seeds give distinct subsampling draws in the fused path
        self._seed = seed * 1_000_003
        # fused frame programs per (track, det) bucket (SURVEY §7 hard part 4:
        # variable counts -> bucketed padding, one compile per bucket)
        self._full_frame_fns = {}
        # device-resident track features (DeviceTrackCache): per frame only
        # the inputs go up and the logits come down — the host FeatureCache
        # round-trips ~8 MB of track/det features per dense frame, which
        # dominates PCIe/tunnel-bound deployments. Auto-on for the fused
        # point path AND (round 5) the fused image path: with no crop_fn the
        # image branch receives raw camera frames in step() and runs
        # projection + crops + ViT embed + scoring as ONE device program
        # (the host-cache crop_fn path stays available as the fallback).
        from ..inference.pair_scoring import DeviceTrackCache
        self._image_mode = bool(getattr(scorer, "image_mode", False))
        self._use_device_cache = (
            device_cache if device_cache is not None else crop_fn is None)
        self._dc = DeviceTrackCache(cache_capacity)
        self._cached_frame_fns = {}
        self._prev_h = None
        self._prev_xyz = None
        self._prev_d_pad = 8
        # gated sparse scoring: score ONLY the class+BEV gate survivors as a
        # bucket-padded pair list instead of the full t_pad x d_pad grid.
        # The reference itself never scores ungated pairs (it gathers the
        # survivors and loops match_forward_inference,
        # tracking_point_reid.py:110-116); at Waymo density the 2 m gate
        # kills ~99% of the grid, so this cuts the dominant kernel ~50x.
        # 'auto' switches on past _SPARSE_MIN_GRID padded pairs — small
        # frames keep the measured-optimal dense kernel (the pair list
        # double-pays the per-pair factor VMEM traffic, so it only wins when
        # the gate is sparse); 'always'/'never' force it for tests/benches.
        assert sparse_scoring in ("auto", "always", "never"), sparse_scoring
        self.sparse_scoring = sparse_scoring
        self._cached_pair_frame_fns = {}
        # image fused path: camera geometry is static per deployment; sizes
        # are discovered from the first frame's image shapes
        self._image_sizes = None

    def _full_frame_fn(self, t_pad: int, d_pad: int):
        """ONE jitted program per (track, det) bucket for the frame's device
        work (crops + embed + grid score), built by
        PairScorer.make_frame_fn(crop_points=...). Fusing everything and
        fetching results in a single device_get took the measured frame time
        from 4.3 s (per-track dispatches) -> ~130 ms, tunnel-RTT bound
        (~10 ms on local hardware)."""
        key = (t_pad, d_pad)
        if key not in self._full_frame_fns:
            self._full_frame_fns[key] = self.scorer.make_frame_fn(
                t_pad, d_pad, crop_points=self.subsample_number)
        return self._full_frame_fns[key]

    def _record_prune(self):
        """Drop aged-out tracks, feeding their lifetimes to the recorder."""
        if self.eval_recorder is not None:
            dying = [t for t in self.store.tracks.values()
                     if t.age > self.store.max_age]
            self.eval_recorder.observe_dead(dying)
        pruned = self.store.prune()
        self.cache.drop(pruned)
        self._dc.drop(pruned)

    def end_scene(self):
        """Scene boundary for the eval recorder, then reset tracker state."""
        if self.eval_recorder is not None:
            self.eval_recorder.end_scene(list(self.store.tracks.values()))
        self.reset()

    def reset(self):
        """New scene (VirtualTracker.reset)."""
        from ..inference.pair_scoring import DeviceTrackCache
        self.store = TrackStore(max_age=self.store.max_age,
                                min_hits=self.store.min_hits)
        self.cache = FeatureCache()
        self._dc = DeviceTrackCache(self._dc.capacity)
        self._prev_h = self._prev_xyz = None
        self._prev_d_pad = 8
        self._last_p_pad = 0
        self.timestep = -1

    def _cached_frame_fn(self, t_pad: int, d_pad: int, d_prev_pad: int):
        key = (t_pad, d_pad, d_prev_pad)
        if key not in self._cached_frame_fns:
            self._cached_frame_fns[key] = self.scorer.make_cached_frame_fn(
                t_pad, d_pad, d_prev_pad, self._dc.capacity,
                self.subsample_number)
        return self._cached_frame_fns[key]

    # padded-grid size past which 'auto' sparse scoring kicks in. Measured
    # on v5e (tools/profile_tracker_e2e.py --sparse/--dense): sparse wins
    # big at BOTH measured densities — 96 obj (128x128 bucket) 12.3 ms
    # device vs ~45-50 dense, 256 det Waymo-dense (512x256) 32.9 vs 172.9 —
    # so only small grids, where per-frame p_pad bucket churn would cost
    # more compiles than the kernel saves, stay dense. The >25%-gate-pass
    # fallback in step() guards the crowded-scene case at any size.
    _SPARSE_MIN_GRID = 4096

    def _sparse_on(self, n_tracks: int, d_pad: int) -> bool:
        if self.sparse_scoring == "never":
            return False
        if self.sparse_scoring == "always":
            return True
        return _round_up(max(n_tracks, 1)) * d_pad > self._SPARSE_MIN_GRID

    def _cached_pair_frame_fn(self, t_pad: int, d_pad: int, d_prev_pad: int,
                              p_pad: int):
        key = (t_pad, d_pad, d_prev_pad, p_pad)
        if key not in self._cached_pair_frame_fns:
            self._cached_pair_frame_fns[key] = (
                self.scorer.make_cached_pair_frame_fn(
                    t_pad, d_pad, d_prev_pad, p_pad, self._dc.capacity,
                    self.subsample_number))
        return self._cached_pair_frame_fns[key]

    def _cached_image_frame_fn(self, t_pad: int, d_pad: int,
                               d_prev_pad: int):
        key = ("img", t_pad, d_pad, d_prev_pad)
        if key not in self._cached_frame_fns:
            self._cached_frame_fns[key] = (
                self.scorer.make_cached_image_frame_fn(
                    t_pad, d_pad, d_prev_pad, self._dc.capacity,
                    *self._image_sizes))
        return self._cached_frame_fns[key]

    def _cached_image_pair_frame_fn(self, t_pad: int, d_pad: int,
                                    d_prev_pad: int, p_pad: int):
        key = ("img", t_pad, d_pad, d_prev_pad, p_pad)
        if key not in self._cached_pair_frame_fns:
            self._cached_pair_frame_fns[key] = (
                self.scorer.make_cached_image_pair_frame_fn(
                    t_pad, d_pad, d_prev_pad, p_pad, self._dc.capacity,
                    *self._image_sizes))
        return self._cached_pair_frame_fns[key]

    def _pad_pairs(self, pairs: np.ndarray):
        """Bucket-pad a gate-surviving pair list (sticky-bucket hysteresis:
        P fluctuates frame to frame around bucket edges and every new p_pad
        is a fresh compile — keep the larger bucket until the pair count
        drops to a quarter of it). Returns (pair_t, pair_d, p_pad)."""
        P = len(pairs)
        p_pad = _round_up(max(P, 1), sizes=(16, 32, 64, 128, 256, 512))
        last = getattr(self, "_last_p_pad", 0)
        if p_pad < last <= 4 * max(P, 1):
            p_pad = last
        self._last_p_pad = p_pad
        pair_t = np.zeros((p_pad,), np.int32)   # pad rows score pair (0, 0)
        pair_d = np.zeros((p_pad,), np.int32)
        if P:
            pair_t[:P] = pairs[:, 0]
            pair_d[:P] = pairs[:, 1]
        return pair_t, pair_d, p_pad

    def _step_device_cached_image(self, frame, boxes_p: np.ndarray, D: int,
                                  active,
                                  pairs: Optional[np.ndarray] = None):
        """Image-branch device-cache frame: ONE fused program per frame runs
        box projection + camera crops + ViT embed + grid (or gated sparse
        pair-list) scoring against the device-resident track tokens; only
        the logits cross the host boundary (plus the frame images, which are
        input data either way — uint8 frames upload at a quarter the f32
        bytes). Mirrors _step_device_cached; there is no xyz plumbing
        (CrossLinAttn has no positions).

        `frame` is (images (ncam, 3, H, W), lidar2cams (ncam, 4, 4),
        intrinsics (ncam, 3, 3)) — the ImageReidentifier inputs
        (tracking_point_reid.py:156-165)."""
        images, l2cams, intrins = frame
        images = np.asarray(images)
        l2cams = np.asarray(l2cams, np.float32)
        intrins = np.asarray(intrins, np.float32)
        self._ensure_image_sizes(images)
        dc = self._dc
        d_pad = boxes_p.shape[0]
        if dc.h_buf is None:
            # bootstrap: embed-only (first frame of the scene)
            from ..inference.pair_scoring import PairScorer
            crops = PairScorer._device_crops(
                jnp.asarray(images), jnp.asarray(l2cams),
                jnp.asarray(intrins), jnp.asarray(boxes_p),
                *self._image_sizes)
            _, h_d = self.scorer.embed(crops)   # device, NOT fetched
            dc.ensure(h_d.shape[1], h_d.shape[2], h_d.dtype, with_xyz=False)
            self._prev_h, self._prev_d_pad = h_d, d_pad
            return None, h_d
        T = len(active)
        t_pad = _round_up(max(T, 1))
        slot_idx = np.full((t_pad,), dc.capacity, np.int32)
        for i, t in enumerate(active):
            slot_idx[i] = dc.slot(t.track_id)
        upd_src, upd_dst = dc.take_updates(self._prev_d_pad)
        if pairs is None:
            fn = self._cached_image_frame_fn(t_pad, d_pad, self._prev_d_pad)
            (upd_src_d, upd_dst_d, slot_idx_d, img_d, l2c_d, K_d,
             boxes_d) = jax.device_put(
                (upd_src, upd_dst, slot_idx, images, l2cams, intrins,
                 boxes_p))
            dc.h_buf, logits_dev, h_d = fn(
                dc.h_buf, self._prev_h, upd_src_d, upd_dst_d, slot_idx_d,
                img_d, l2c_d, K_d, boxes_d)
            self._prev_h, self._prev_d_pad = h_d, d_pad
            logits = None
            if T:
                logits = np.asarray(logits_dev, np.float64)[:T, :D]
            return logits, h_d
        pair_t, pair_d, p_pad = self._pad_pairs(pairs)
        fn = self._cached_image_pair_frame_fn(t_pad, d_pad,
                                              self._prev_d_pad, p_pad)
        (upd_src_d, upd_dst_d, slot_idx_d, pair_t_d, pair_d_d, img_d,
         l2c_d, K_d, boxes_d) = jax.device_put(
            (upd_src, upd_dst, slot_idx, pair_t, pair_d, images, l2cams,
             intrins, boxes_p))
        dc.h_buf, logits_dev, h_d = fn(
            dc.h_buf, self._prev_h, upd_src_d, upd_dst_d, slot_idx_d,
            pair_t_d, pair_d_d, img_d, l2c_d, K_d, boxes_d)
        self._prev_h, self._prev_d_pad = h_d, d_pad
        P = len(pairs)
        logits = np.full((T, D), -np.inf, np.float64)
        if P:
            logits[pairs[:, 0], pairs[:, 1]] = np.asarray(
                logits_dev, np.float64)[:P]
        return logits, h_d

    def _step_device_cached(self, pts: np.ndarray, boxes_p: np.ndarray,
                            D: int, active, pairs: Optional[np.ndarray] = None):
        """Device-cache frame: returns (logits (T, D) np or None, h_d, xyz_d
        DEVICE handles). Applies last frame's pending feature scatters.

        With `pairs` ((P, 2) int gate-surviving (track, det) indices), only
        the listed pairs are scored (bucket-padded pair list through the
        fused pair kernel); every other cell of the returned matrix is -inf
        — exactly what the downstream class mask + gate would have forced."""
        dc = self._dc
        d_pad = boxes_p.shape[0]
        self._seed += 1
        if dc.h_buf is None:
            # bootstrap: embed-only (first frame of the scene)
            crops, _ = extract_box_crops(
                jax.random.PRNGKey(self._seed), jnp.asarray(pts),
                jnp.asarray(boxes_p), self.subsample_number)
            xyz_d, h_d = self.scorer.embed(crops)       # device, NOT fetched
            dc.ensure(h_d.shape[1], h_d.shape[2], h_d.dtype)
            self._prev_h, self._prev_xyz, self._prev_d_pad = h_d, xyz_d, d_pad
            return None, h_d, xyz_d
        T = len(active)
        t_pad = _round_up(max(T, 1))
        slot_idx = np.full((t_pad,), dc.capacity, np.int32)
        for i, t in enumerate(active):
            slot_idx[i] = dc.slot(t.track_id)
        upd_src, upd_dst = dc.take_updates(self._prev_d_pad)
        if pairs is None:
            fn = self._cached_frame_fn(t_pad, d_pad, self._prev_d_pad)
            # ONE host->device transfer for all per-frame inputs (each
            # separate jnp.asarray costs a full tunnel/PCIe round trip)
            upd_src_d, upd_dst_d, slot_idx_d, pts_d, boxes_d = jax.device_put(
                (upd_src, upd_dst, slot_idx, pts, boxes_p))
            dc.h_buf, dc.xyz_buf, logits_dev, h_d, xyz_d = fn(
                dc.h_buf, dc.xyz_buf, self._prev_h, self._prev_xyz,
                upd_src_d, upd_dst_d, slot_idx_d, np.int32(self._seed),
                pts_d, boxes_d)
            self._prev_h, self._prev_xyz, self._prev_d_pad = h_d, xyz_d, d_pad
            logits = None
            if T:
                logits = np.asarray(logits_dev, np.float64)[:T, :D]
            return logits, h_d, xyz_d
        P = len(pairs)
        pair_t, pair_d, p_pad = self._pad_pairs(pairs)
        fn = self._cached_pair_frame_fn(t_pad, d_pad, self._prev_d_pad, p_pad)
        (upd_src_d, upd_dst_d, slot_idx_d, pair_t_d, pair_d_d, pts_d,
         boxes_d) = jax.device_put(
            (upd_src, upd_dst, slot_idx, pair_t, pair_d, pts, boxes_p))
        dc.h_buf, dc.xyz_buf, logits_dev, h_d, xyz_d = fn(
            dc.h_buf, dc.xyz_buf, self._prev_h, self._prev_xyz,
            upd_src_d, upd_dst_d, slot_idx_d, pair_t_d, pair_d_d,
            np.int32(self._seed), pts_d, boxes_d)
        self._prev_h, self._prev_xyz, self._prev_d_pad = h_d, xyz_d, d_pad
        logits = np.full((T, D), -np.inf, np.float64)
        if P:
            logits[pairs[:, 0], pairs[:, 1]] = np.asarray(
                logits_dev, np.float64)[:P]
        return logits, h_d, xyz_d

    def _next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def _ensure_image_sizes(self, images: np.ndarray):
        """Cache ((W, H), (out, out)) from the first (ncam, 3, H, W) frame —
        single source for the fused and legacy image-crop paths."""
        if self._image_sizes is None:
            out = int(getattr(self.scorer.model, "image_size", 224))
            self._image_sizes = (
                (images.shape[3], images.shape[2]), (out, out))
        return self._image_sizes

    def _embed_dets(self, pts, boxes_p: np.ndarray, D: int):
        """Non-fused detection embedding (crops then embed)."""
        if self.crop_fn is not None:
            crops = self.crop_fn(pts, boxes_p)
        elif self._image_mode:
            # device_cache=False image path: camera crops, host-fetched
            # features (the legacy FeatureCache fallback)
            from ..inference.pair_scoring import PairScorer
            images, l2cams, intrins = pts
            self._ensure_image_sizes(np.asarray(images))
            crops = PairScorer._device_crops(
                jnp.asarray(images), jnp.asarray(np.asarray(l2cams,
                                                            np.float32)),
                jnp.asarray(np.asarray(intrins, np.float32)),
                jnp.asarray(boxes_p), *self._image_sizes)
        else:
            crops, _ = extract_box_crops(
                self._next_rng(), jnp.asarray(pts), jnp.asarray(boxes_p),
                self.subsample_number)
        xyz_d, h_d = self.scorer.embed(crops)
        h_d = np.asarray(h_d)[:D]
        xyz_d = np.asarray(xyz_d)[:D] if xyz_d is not None else None
        return h_d, xyz_d

    def step(self, points: np.ndarray, det_boxes: np.ndarray,
             det_scores: np.ndarray, det_labels: np.ndarray,
             det_gt_ids: Optional[np.ndarray] = None) -> List[Track]:
        """Process one frame; returns the confirmed tracks.

        Args:
            points: (N, 3+) lidar sweep in the common frame.
            det_boxes: (D, 7) detections [cx cy cz dx dy dz yaw].
            det_scores: (D,) detector confidences.
            det_labels: (D,) int class ids.
            det_gt_ids: optional (D,) gt object ids (-1 = detector FP) —
                when given with an eval_recorder attached, every association
                decision is classified into the tracking-eval summary.
        """
        self.timestep += 1
        det_boxes = np.asarray(det_boxes, np.float32).reshape(-1, 7)
        det_scores = np.asarray(det_scores, np.float32).reshape(-1)
        det_labels = np.asarray(det_labels, np.int64).reshape(-1)
        if det_gt_ids is not None:
            det_gt_ids = np.asarray(det_gt_ids, np.int64).reshape(-1)

        if self.nms_threshold is not None and len(det_boxes) > 1:
            keep = np.asarray(nms_bev(jnp.asarray(det_boxes),
                                      jnp.asarray(det_scores),
                                      self.nms_threshold))
            keep = keep[keep >= 0]
            det_boxes, det_scores, det_labels = (
                det_boxes[keep], det_scores[keep], det_labels[keep])
            if det_gt_ids is not None:
                det_gt_ids = det_gt_ids[keep]

        D = len(det_boxes)
        if D == 0:
            for t in self.store.tracks.values():
                t.missed()
            self._record_prune()
            return self.store.outputs()

        image_fused = self._image_mode and self.crop_fn is None
        # device: crops + embeddings for all detections at once; sweep and
        # box counts are bucket-padded so programs compile once per bucket
        if self.crop_fn is None and not image_fused:
            n_pad = _round_up(max(len(points), 1), sizes=SWEEP_SIZES)
            pts = np.zeros((n_pad, 3), np.float32)
            pts[:] = 1e6                           # padding far from any box
            pts[:len(points)] = np.asarray(points, np.float32)[:, :3]
        else:
            # opaque frame data: crop_fn input, or the image-fused path's
            # (images, lidar2cams, intrinsics) camera frame
            pts = points
        d_pad = _round_up(D)
        boxes_p = np.full((d_pad, 7), 1e6, np.float32)
        boxes_p[:D] = det_boxes

        active = self.store.active()
        use_dc = (self._use_device_cache and self.crop_fn is None
                  and (hasattr(self.scorer, "make_cached_image_frame_fn")
                       if image_fused
                       else hasattr(self.scorer, "make_cached_frame_fn")))
        if use_dc:
            # gate BEFORE dispatch when sparse scoring applies: the class +
            # BEV masks are pure host math on boxes, so the gate-surviving
            # pair list is known before any device work this frame
            pairs = gate = None
            if (active and self._dc.h_buf is not None
                    and self._sparse_on(len(active), d_pad)):
                pred_boxes = np.stack([t.predict(self.timestep)
                                       for t in active])
                gate = center_distance_gate(pred_boxes, det_boxes,
                                            self.max_distance)
                ok = (np.array([t.cls for t in active])[:, None]
                      == det_labels[None, :])
                pairs = np.argwhere(gate & ok).astype(np.int32)
                if 4 * len(pairs) > _round_up(len(active)) * d_pad:
                    pairs = None        # dense gate: the grid kernel wins
            if image_fused:
                logits, h_d = self._step_device_cached_image(
                    pts, boxes_p, D, active, pairs=pairs)
                xyz_d = None
            else:
                logits, h_d, xyz_d = self._step_device_cached(
                    pts, boxes_p, D, active, pairs=pairs)
            if active and logits is not None:
                ok = (np.array([t.cls for t in active])[:, None]
                      == det_labels[None, :])
                logits[~ok] = -np.inf
                cost = 1.0 - 1.0 / (1.0 + np.exp(-logits))
                if gate is None:
                    pred_boxes = np.stack([t.predict(self.timestep)
                                           for t in active])
                    gate = center_distance_gate(pred_boxes, det_boxes,
                                                self.max_distance)
                matches, unmatched_t, unmatched_d = associate(
                    cost, threshold=self.match_threshold, method=self.method,
                    gate=gate)
            else:
                matches, unmatched_t, unmatched_d = [], [], list(range(D))
        elif active:
            track_ids = [t.track_id for t in active]
            h_t, xyz_t = self.cache.gather(track_ids)
            T = len(track_ids)
            t_pad = _round_up(T)
            fused = (hasattr(self.scorer, "make_frame_fn")
                     and not getattr(self.scorer, "image_mode", False)
                     and self.crop_fn is None)
            if fused:
                # fully-fused path: crops + embed + grid in ONE program,
                # ONE device_get for everything this frame
                frame_fn = self._full_frame_fn(t_pad, d_pad)
                h_tp = np.pad(h_t, [(0, t_pad - T)] + [(0, 0)] * (h_t.ndim - 1))
                xyz_tp = np.pad(xyz_t,
                                [(0, t_pad - T)] + [(0, 0)] * (xyz_t.ndim - 1))
                self._seed += 1
                inputs = jax.device_put(
                    (h_tp.astype(np.float32), xyz_tp.astype(np.float32),
                     (np.int32(self._seed), pts, boxes_p)))
                logits_p, h_dp, xyz_dp = jax.device_get(frame_fn(*inputs))
                logits = logits_p[:T, :D]
                h_d = h_dp[:D]
                xyz_d = xyz_dp[:D]
            else:
                h_d, xyz_d = self._embed_dets(pts, boxes_p, D)
                logits = np.asarray(self.scorer.cost_matrix(
                    jnp.asarray(h_t),
                    jnp.asarray(xyz_t) if xyz_t is not None else None,
                    jnp.asarray(h_d),
                    jnp.asarray(xyz_d) if xyz_d is not None else None))
            # class gating (get_labels_to_compare semantics) on host numpy
            logits = np.asarray(logits, np.float64)
            ok = (np.array([t.cls for t in active])[:, None]
                  == det_labels[None, :])
            logits[~ok] = -np.inf
            cost = 1.0 - 1.0 / (1.0 + np.exp(-logits))

            pred_boxes = np.stack([t.predict(self.timestep) for t in active])
            gate = center_distance_gate(pred_boxes, det_boxes,
                                        self.max_distance)
            matches, unmatched_t, unmatched_d = associate(
                cost, threshold=self.match_threshold, method=self.method,
                gate=gate)
        else:
            h_d, xyz_d = self._embed_dets(pts, boxes_p, D)
            matches, unmatched_t, unmatched_d = [], [], list(range(D))

        matched_rec, newborn_rec = [], []
        for ti, di in matches:
            t = active[ti]
            t.update(det_boxes[di], det_scores[di], self.timestep)
            if use_dc:
                # features never touch the host: scatter at next frame start
                self._dc.queue_update(di, self._dc.slot(t.track_id))
            else:
                self.cache.update(
                    [t.track_id], h_d[di:di + 1],
                    xyz_d[di:di + 1] if xyz_d is not None else None)
            if det_gt_ids is not None:
                matched_rec.append((t.track_id, det_gt_ids[di],
                                    det_labels[di]))
        for ti in unmatched_t:
            active[ti].missed()
        for di in unmatched_d:
            t = self.store.new_track(det_labels[di], det_boxes[di],
                                     det_scores[di], self.timestep)
            if use_dc:
                self._dc.queue_update(di, self._dc.assign(t.track_id))
            else:
                self.cache.update(
                    [t.track_id], h_d[di:di + 1],
                    xyz_d[di:di + 1] if xyz_d is not None else None)
            if det_gt_ids is not None:
                newborn_rec.append((t.track_id, det_gt_ids[di],
                                    det_labels[di]))

        if self.eval_recorder is not None and det_gt_ids is not None:
            self.eval_recorder.observe_frame(
                matched_rec, newborn_rec,
                [active[ti].track_id for ti in unmatched_t],
                unmatched_det_gt=[])
        self._record_prune()
        return self.store.outputs()
