"""Amortized NxN pair scoring — the real-time tracking workload.

The reference scores track-detection pairs by gathering per-pair tensors and
looping the match head (PointReidentifier.__call__,
trackers/deprecated/tracking_point_reid.py:49-118): backbone once per object
(features cached per track, tracking_feature_set.py:12), then
match_forward_inference on the class-wise cartesian product, scattered into an
(n_tracks, n_dets) cost matrix. That design is re-expressed TPU-first:

  * embeddings: one batched backbone call per frame for all new detections
    (the expensive O(backbone) stage, amortized exactly as the reference does);
  * scoring: ALL NxM pairs evaluated in ONE jitted program — the pair axis is
    just a batch axis for the cross-attention match head, and linear attention
    makes each pair two (d x N)(N x d) MXU contractions. No gather loop, no
    per-pair dispatch.
  * static shapes: track/det counts are padded to fixed buckets so the program
    compiles once per bucket (SURVEY.md §7 hard part 4); masked entries score
    -inf.
  * scale-out: the NxM grid is broadcast INSIDE the jitted program with the
    flattened pair axis sharding-constrained over every mesh axis — each
    device materializes only its shard (never the host), non-divisible grids
    are GSPMD-padded, and 10k+ pair Waymo frames fit per-chip memory
    (>=100k pairs/s target, BASELINE.json).
  * the per-pair chain itself runs as a fused Pallas kernel where eligible
    (ops/pallas/match_grid — per-object factors in, pooled features out,
    nothing per-pair touches HBM), with the hoisted XLA path
    (ReIDNet.match_logits_grid) as the mesh/CPU/fallback backend.
  * deployment: DeviceTrackCache keeps track features device-resident so a
    tracking frame's host I/O is the sweep up and the logits down — nothing
    else crosses PCIe (or, here, the tunnel).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class FeatureCache:
    """Per-track embedding cache (PointFeatureSet/ImageFeatureSet,
    tracking_feature_set.py:12-120): host-side ring of device arrays keyed by
    track id; embeddings are computed once when a track is born/updated."""

    def __init__(self):
        self._h: Dict[int, Any] = {}
        self._xyz: Dict[int, Any] = {}

    def update(self, track_ids, h, xyz=None):
        # store host-side: per-track slicing of device arrays would cost one
        # dispatch each — hundreds of tiny transfers per frame
        h = np.asarray(h)
        xyz = np.asarray(xyz) if xyz is not None else None
        for i, tid in enumerate(track_ids):
            self._h[int(tid)] = h[i]
            if xyz is not None:
                self._xyz[int(tid)] = xyz[i]

    def gather(self, track_ids):
        h = np.stack([self._h[int(t)] for t in track_ids])
        xyz = (np.stack([self._xyz[int(t)] for t in track_ids])
               if self._xyz else None)
        return h, xyz

    def drop(self, track_ids):
        for tid in track_ids:
            self._h.pop(int(tid), None)
            self._xyz.pop(int(tid), None)

    def __len__(self):
        return len(self._h)


class DeviceTrackCache:
    """Device-RESIDENT per-track embedding store.

    The host FeatureCache round-trips every track's features through host
    memory each frame — ~8 MB of PCIe (or, here, tunnel) traffic per dense
    frame, which dominates the measured end-to-end tracker step. This cache
    keeps a fixed-capacity (cap, N, C) buffer ON DEVICE; the fused frame
    program gathers track rows by slot index, scatters last frame's
    detection features into their assigned slots, and only the (t_pad, d_pad)
    logits ever cross the host boundary.

    Slot bookkeeping (track id -> slot, free list, pending det->slot updates
    decided by the host-side association) is tiny host state. Slot `cap` is
    a scratch row: padded gathers read it, masked-out scatters write it.
    """

    # grow() sanity bound: a real denser-than-expected scene needs a
    # doubling or two; needing 16x the constructed capacity means the
    # caller is leaking slots (birthing tracks it never drop()s), and the
    # old loud error beats silently doubling device buffers into an OOM.
    _MAX_GROWTH = 16

    def __init__(self, capacity: int = 512):
        self.capacity = capacity
        self._initial_capacity = capacity
        self._slots: Dict[int, int] = {}
        self._free = list(range(capacity))
        self.h_buf = None                   # (cap+1, N, C) device
        self.xyz_buf = None                 # (cap+1, N, 3) device
        # (prev_h_dets, prev_xyz_dets) device handles + [(det_idx, slot)]
        self._prev = None
        self._pending: list = []

    def ensure(self, n: int, c: int, dtype, with_xyz: bool = True):
        if self.h_buf is None:
            self.h_buf = jnp.zeros((self.capacity + 1, n, c), dtype)
            if with_xyz:
                self.xyz_buf = jnp.zeros((self.capacity + 1, n, 3),
                                         jnp.float32)

    def slot(self, track_id: int) -> int:
        return self._slots[int(track_id)]

    def grow(self):
        """Double the capacity in place: live slots keep their indices, the
        scratch row moves to the new last index, the fresh rows join the
        free list. The device copy is one concat per buffer; callers' jitted
        frame programs retrace automatically on the new buffer shape (one
        extra compile per bucket) — the manager's fn caches stay valid
        because capacity is a runtime buffer shape there, not a baked
        constant. Denser-than-expected scenes degrade to a recompile
        instead of a RuntimeError mid-scene. Bounded at _MAX_GROWTH x the
        constructed capacity to keep slot leaks diagnosable."""
        old = self.capacity
        if old * 2 > self._initial_capacity * self._MAX_GROWTH:
            raise RuntimeError(
                f"DeviceTrackCache grew past {self._MAX_GROWTH}x its "
                f"constructed capacity ({self._initial_capacity} -> "
                f"{old * 2}): {len(self._slots)} slots are live. This is "
                "almost certainly a slot leak — drop() dead tracks — not a "
                "dense scene; construct with a larger cache_capacity if it "
                "truly is one.")
        self.capacity = old * 2
        self._free.extend(range(old, self.capacity))

        def widen(buf):
            if buf is None:
                return None
            pad = jnp.zeros((old + 1,) + buf.shape[1:], buf.dtype)
            # rows [0, old) keep; [old, 2*old) new free; row 2*old = scratch
            return jnp.concatenate([buf[:old], pad], axis=0)
        self.h_buf = widen(self.h_buf)
        self.xyz_buf = widen(self.xyz_buf)

    def assign(self, track_id: int) -> int:
        if not self._free:
            self.grow()
        s = self._free.pop()
        self._slots[int(track_id)] = s
        return s

    def drop(self, track_ids):
        for tid in track_ids:
            s = self._slots.pop(int(tid), None)
            if s is not None:
                self._free.append(s)

    def queue_update(self, det_idx: int, slot: int):
        self._pending.append((det_idx, slot))

    def take_updates(self, d_prev_pad: int):
        """Pending (src det row, dst slot) pairs as padded index arrays;
        unused entries read det row 0 and write the scratch slot."""
        src = np.zeros((d_prev_pad,), np.int32)
        dst = np.full((d_prev_pad,), self.capacity, np.int32)
        for i, (di, s) in enumerate(self._pending[:d_prev_pad]):
            src[i] = di
            dst[i] = s
        self._pending = []
        return src, dst

    def __len__(self):
        return len(self._slots)


def _round_up(n: int, sizes=(8, 16, 32, 64, 128, 256, 512)) -> int:
    for s in sizes:
        if n <= s:
            return s
    return int(2 ** np.ceil(np.log2(max(n, 1))))


def _pallas_grid_ok(model, image_mode: bool, interpret: bool = False) -> bool:
    """Fused match-grid kernel eligibility: the flagship head shape
    (xcorr_eff / point-cat / both-pool, linear attention) whose per-pair
    chain the kernel hard-codes — corss_attention stages on the point branch,
    cross_lin_attn (same chain minus the pos-MLP) on the image branch. Mesh
    scale-out runs the shard_map'd kernel (ops.pallas.match_grid.sharded_*);
    on CPU the kernel needs interpret mode (Mosaic is TPU-only)."""
    if jax.default_backend() != "tpu" and not interpret:
        return False        # CPU runs use the XLA path (kernel needs Mosaic)
    if image_mode:
        if type(model).__name__ != "ImageReIDNet":
            return False
        s = dict(model.cross_lin_attn or {})
        return (model.match_type == "xcorr_eff"
                and model.combine == "point-cat"
                and model.pool_type == "both"
                and s.get("type") == "cross_lin_attn"
                and s.get("attention", "linear") == "linear")
    if type(model).__name__ != "ReIDNet":
        return False
    s1 = dict(model.cross_stage1 or {})
    s2 = dict(model.cross_stage2 or {})
    return (model.match_type == "xcorr_eff"
            and model.combine == "point-cat"
            and model.pool_type == "both"
            and s1.get("type") == "corss_attention"
            and s2.get("type") == "corss_attention"
            and s1.get("attention", "linear") == "linear"
            and s2.get("attention", "linear") == "linear")


def _pallas_det_block(nd: int, image_mode: bool = False) -> int:
    """Largest det block <=32 dividing nd (callers guarantee nd % 8 == 0).

    32 needs the kernel's raised 20 MB VMEM scoped limit; fewer, bigger grid
    cells amortize per-op issue overhead (measured 24.5 -> 18.9 ms on the
    128x128 frame across the r3 kernel rework). Image blocks carry ~1.6x the
    rows (200 padded tokens vs 128 points), so they cap at 16 to stay inside
    the same VMEM budget."""
    cap = 16 if image_mode else 32
    for b in (32, 16, 8):
        if b <= cap and nd % b == 0:
            return b
    return 8


def _embed_tokens(model, variables, crops, image_mode: bool):
    """Backbone embedding; image mode applies the per-token downsample MLP
    the match stages expect (ReIDNet.py:1232-1237)."""
    if image_mode:
        toks = model.apply(variables, crops, train=False, method="embed")
        h = model.apply(variables, toks, train=False,
                        method="downsample_tokens")
        return None, h
    return model.apply(variables, crops, train=False, method="embed")


class PairScorer:
    """Batched NxM match scoring on top of a ReIDNet-family model.

    Args:
        model: ReIDNet (points) or ImageReIDNet (images).
        variables: flax variables {'params': ..., 'batch_stats': ...}.
        image_mode: skip xyz plumbing for the image branch.
    """

    def __init__(self, model, variables, image_mode: bool = False, mesh=None,
                 backend: str = "auto", pallas_interpret: bool = False):
        self.model = model
        self.variables = variables
        self.image_mode = image_mode
        # 'auto' uses the fused pallas match-grid kernel where eligible
        # (measured 1.5x the hoisted XLA grid at 128x128 on v5e) — including
        # under a mesh, where the shard_map'd kernel runs per det shard;
        # 'xla' forces the hoisted XLA path (e.g. for debugging).
        # pallas_interpret runs the kernel in interpret mode (CPU-mesh
        # validation; never set it on real hardware).
        assert backend in ("auto", "pallas", "xla"), backend
        self._backend = backend
        self._interpret = pallas_interpret
        # fused SA-stage backbone (ops/pallas/sa_stage): swap the embed path
        # onto the VMEM-resident gather+MLP+max kernel for point-branch
        # inference (same params, eval-only compute path). Single-chip: the
        # model itself is cloned, every embed call routes the kernel. Mesh:
        # GSPMD cannot partition the pallas_call, so the base model keeps
        # the XLA embed and frame programs shard_map the cloned model's
        # embed per det shard (crops are independent rows) when the det
        # count divides the mesh.
        self._pallas_embed_model = None
        if (not image_mode and backend in ("auto", "pallas")
                and (jax.default_backend() == "tpu" or pallas_interpret)
                and isinstance(getattr(model, "backbone", None), dict)
                and model.backbone.get("type") in ("Pointnet_Backbone",
                                                   "point_transformer")
                and not model.backbone.get("pallas_inference")):
            cloned = model.clone(backbone=dict(
                model.backbone, pallas_inference=True,
                pallas_interpret=pallas_interpret))
            if mesh is None:
                model = cloned
                self.model = model
            else:
                self._pallas_embed_model = cloned
        self._use_pallas = (backend in ("auto", "pallas")
                            and _pallas_grid_ok(model, image_mode,
                                                pallas_interpret))
        if backend == "pallas" and not self._use_pallas:
            raise ValueError("pallas grid backend incompatible with this "
                             "model configuration")
        # optional multi-chip scale-out: the flattened pair batch is sharded
        # over every mesh axis (SURVEY.md §2.6 'sharded NxN pair-scoring' row);
        # XLA partitions the match head SPMD with zero collectives in the
        # forward (pairs are independent).
        self.mesh = mesh
        self._flat_spec = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            # leading axis sharded over EVERY mesh axis; GSPMD pads
            # non-divisible extents, so arbitrary grid sizes scale out
            self._flat_spec = NamedSharding(
                mesh, PartitionSpec(tuple(mesh.axis_names)))

        @jax.jit
        def _embed(variables, pts):
            xyz, h = _embed_tokens(model, variables, pts, image_mode)
            return h if image_mode else (xyz, h)
        self._embed = _embed

        flat_spec = self._flat_spec
        grid_backend = self._grid_backend
        grid_logits = self._grid_logits

        @jax.jit
        def _score_grid(variables, h_t, xyz_t, h_d, xyz_d):
            """Per-object embeddings in, (nt, nd) logits out.

            Point branch: the fused pallas kernel where eligible (shard_map'd
            per det shard under a mesh), else ReIDNet.match_logits_grid — the
            NxM grid is built INSIDE the sharded program with per-object work
            (q/k/v, KV summaries, pos-MLPs) hoisted out of the pair batch;
            each device materializes only its own shard of the flattened pair
            axis (never the full (nt*nd, N, C) tensor on the host), which is
            what lets cost_matrix scale to Waymo-size 10k+ pair frames."""
            if image_mode:
                return self._image_grid_logits(variables, h_t, h_d,
                                               grid_backend(h_d.shape[0]))
            return grid_logits(variables, h_t, xyz_t, h_d, xyz_d,
                               grid_backend(h_d.shape[0]))
        self._score_grid = _score_grid

    # ---- grid dispatch -------------------------------------------------------

    def _grid_backend(self, nd_p: int) -> str:
        """Static per-det-count dispatch: 'pallas-sharded' when a mesh is set
        and every shard gets whole det blocks, 'pallas' single-chip, else
        'xla'. Det blocks < 8 would violate Mosaic's (8, 128) output-block
        rule, so non-divisible counts (pad=False callers) use XLA — silently
        under 'auto', loudly when pallas was forced."""
        if not self._use_pallas:
            return "xla"
        if self.mesh is not None:
            if nd_p % (self.mesh.size * 8) == 0:
                return "pallas-sharded"
            if self._backend == "pallas":
                raise ValueError(
                    f"backend='pallas' on a {self.mesh.size}-device mesh "
                    f"requires a det count divisible by "
                    f"{self.mesh.size * 8}, got {nd_p}")
            return "xla"
        if nd_p % 8 == 0:
            return "pallas"
        if self._backend == "pallas":
            raise ValueError(
                f"backend='pallas' requires a det count divisible by 8, "
                f"got {nd_p} (use pad=True or backend='auto')")
        return "xla"

    def _grid_logits(self, variables, h_t, xyz_t, h_d, xyz_d, backend: str):
        """Point-branch grid scorer body (shared by every jitted frame
        program). `backend` must come from _grid_backend for this det count."""
        if backend == "pallas-sharded":
            from ..ops.pallas.match_grid import sharded_grid_logits
            return sharded_grid_logits(
                self.model, variables, h_t, xyz_t, h_d, xyz_d, self.mesh,
                det_block=_pallas_det_block(h_d.shape[0] // self.mesh.size),
                interpret=self._interpret)
        if backend == "pallas":
            from ..ops.pallas.match_grid import pallas_grid_logits
            return pallas_grid_logits(
                self.model, variables, h_t, xyz_t, h_d, xyz_d,
                det_block=_pallas_det_block(h_d.shape[0]),
                interpret=self._interpret)
        return self.model.apply(variables, h_t, xyz_t, h_d, xyz_d,
                                train=False, method="match_logits_grid",
                                pair_sharding=self._flat_spec)

    def _image_grid_logits(self, variables, h_t, h_d, backend: str):
        """Image-branch grid scorer body (no xyz; CrossLinAttn head)."""
        if backend == "pallas-sharded":
            from ..ops.pallas.match_grid import sharded_image_grid_logits
            return sharded_image_grid_logits(
                self.model, variables, h_t, h_d, self.mesh,
                det_block=_pallas_det_block(h_d.shape[0] // self.mesh.size,
                                            image_mode=True),
                interpret=self._interpret)
        if backend == "pallas":
            from ..ops.pallas.match_grid import pallas_image_grid_logits
            return pallas_image_grid_logits(
                self.model, variables, h_t, h_d,
                det_block=_pallas_det_block(h_d.shape[0], image_mode=True),
                interpret=self._interpret)
        return self.model.apply(variables, h_t, h_d, train=False,
                                method="match_logits_grid",
                                pair_sharding=self._flat_spec)

    def _make_embed_fn(self, n_dets: int):
        """Frame-program embed: (variables, det_crops) -> (xyz_d, h_d).

        Mesh + point branch + divisible det count: shard_map the fused
        SA-stage pallas embed per det shard (crops are independent rows, so
        sharding the crop axis needs zero collectives; GSPMD cannot
        partition the pallas_call itself, which is why the plain mesh path
        keeps the XLA embed). Everything else: direct apply."""
        model, image_mode = self.model, self.image_mode
        pallas_embed = self._pallas_embed_model
        if (self.mesh is None or image_mode or pallas_embed is None
                or n_dets % self.mesh.size != 0):
            return lambda variables, crops: _embed_tokens(
                model, variables, crops, image_mode)

        from jax.sharding import PartitionSpec as P
        from ..ops.pallas.match_grid import _shard_map_nocheck
        shard_map, kw = _shard_map_nocheck()
        axes = tuple(self.mesh.axis_names)

        def _local(variables, crops_local):
            return _embed_tokens(pallas_embed, variables, crops_local, False)

        return shard_map(_local, mesh=self.mesh,
                         in_specs=(P(), P(axes)),
                         out_specs=(P(axes), P(axes)), **kw)

    # ---- embedding stage (amortized per object) ------------------------------

    def embed(self, crops: jnp.ndarray):
        """(B, N, 3) crops -> (xyz (B,N,3), h (B,N,C)); image mode:
        (B, 3, H, W) -> tokens then downsample (forward_inference paths,
        ReIDNet.py:189-192 / :914-926)."""
        if self.image_mode:
            toks = self._embed(self.variables, crops)
            return None, toks
        return self._embed(self.variables, crops)

    # ---- scoring stage --------------------------------------------------------

    def cost_matrix(self, h_tracks, xyz_tracks, h_dets, xyz_dets,
                    track_classes: Optional[np.ndarray] = None,
                    det_classes: Optional[np.ndarray] = None,
                    pad: bool = True) -> jnp.ndarray:
        """Score every (track, det) pair -> (n_tracks, n_dets) logits.

        Class gating mirrors get_labels_to_compare
        (tracking_point_reid.py:15-33): pairs with mismatched classes get -inf
        without being evaluated (they ARE evaluated here — masking beats
        dynamic shapes on TPU — but cost nothing extra since the grid is one
        fused batch).
        """
        nt, nd = h_tracks.shape[0], h_dets.shape[0]
        nt_p = _round_up(nt) if pad else nt
        nd_p = _round_up(nd) if pad else nd

        def pad0(x, n):
            if x is None or x.shape[0] == n:
                return x
            pad_width = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad_width)

        h_t, h_d = pad0(h_tracks, nt_p), pad0(h_dets, nd_p)
        x_t, x_d = pad0(xyz_tracks, nt_p), pad0(xyz_dets, nd_p)
        if self.image_mode:
            x_t = jnp.zeros((nt_p, 0), h_t.dtype)
            x_d = jnp.zeros((nd_p, 0), h_d.dtype)
        # the grid is broadcast inside the jitted, mesh-sharded program —
        # only per-object embeddings cross the host boundary
        mat = self._score_grid(self.variables, h_t, x_t, h_d, x_d)[:nt, :nd]

        if track_classes is not None and det_classes is not None:
            ok = (np.asarray(track_classes)[:, None] ==
                  np.asarray(det_classes)[None, :])
            mat = jnp.where(jnp.asarray(ok), mat, -jnp.inf)
        return mat

    def make_frame_fn(self, n_tracks: int, n_dets: int,
                      crop_points: Optional[int] = None):
        """Fully-fused tracking frame for fixed bucket sizes: ONE jitted
        program runs [optional crop extraction +] embed(dets) + the full NxM
        grid score.

        This is the production fast path: splitting embed and scoring into
        two dispatches costs ~9x at frame scale (measured: 6.8M -> 59.8M
        pairs/s/chip at 128x128) because each dispatch round-trips
        host<->device.

        Returns fn(h_tracks, xyz_tracks, dets) -> ((n_tracks, n_dets) logits,
        h_dets, xyz_dets). With crop_points set (point mode only), `dets` is
        (seed, sweep_points (N,3), boxes (n_dets,7)) and crops are extracted
        on device (tracking.crops.extract_box_crops); otherwise `dets` is the
        pre-cut crop batch. Weights are read from self.variables AT CALL TIME
        (runtime argument, not baked into the executable), so checkpoint
        swaps apply to already-compiled buckets.
        """
        model, image_mode = self.model, self.image_mode
        flat_spec = self._flat_spec
        grid_backend = self._grid_backend(n_dets)
        grid_logits = self._grid_logits
        image_grid_logits = self._image_grid_logits
        embed_fn = self._make_embed_fn(n_dets)
        assert not (image_mode and crop_points), \
            "on-device box crops are a point-branch path"

        @jax.jit
        def frame(variables, h_t, xyz_t, dets):
            if crop_points is not None:
                from ..tracking.crops import extract_box_crops
                seed, pts, boxes = dets
                det_crops, _ = extract_box_crops(
                    jax.random.PRNGKey(seed), pts, boxes, crop_points)
            else:
                det_crops = dets
            if flat_spec is not None:
                # embed stage: detections sharded over the mesh too
                det_crops = jax.lax.with_sharding_constraint(det_crops,
                                                             flat_spec)
            xyz_d, h_d = embed_fn(variables, det_crops)

            if image_mode:
                logits = image_grid_logits(variables, h_t, h_d, grid_backend)
                return logits, h_d, xyz_d
            logits = grid_logits(variables, h_t, xyz_t, h_d, xyz_d,
                                 grid_backend)
            return logits, h_d, xyz_d

        def call(h_t, xyz_t, dets):
            return frame(self.variables, h_t, xyz_t, dets)

        call.jitted = frame     # expose for AOT cost analysis (bench MFU)
        return call

    def make_cached_frame_fn(self, t_pad: int, d_pad: int, d_prev_pad: int,
                             capacity: int, crop_points: int):
        """Fused frame against a DeviceTrackCache: ONE program does
        [scatter last frame's det features into their track slots] ->
        [gather this frame's track rows by slot] -> [crop + embed dets] ->
        [full grid score]. Only the logits are fetched; detection features
        stay on device as next frame's scatter source.

        Point branch only. Returns fn(h_buf, xyz_buf, prev_h, prev_xyz,
        upd_src (d_prev_pad,), upd_dst, slot_idx (t_pad,), seed, pts, boxes)
        -> (new_h_buf, new_xyz_buf, logits (t_pad, d_pad), h_dets, xyz_dets).
        """
        assert not self.image_mode, "device cache is a point-branch path"
        grid_backend = self._grid_backend(d_pad)
        grid_logits = self._grid_logits
        embed_fn = self._make_embed_fn(d_pad)

        @jax.jit
        def frame(variables, h_buf, xyz_buf, prev_h, prev_xyz,
                  upd_src, upd_dst, slot_idx, seed, pts, boxes):
            # scatter: masked-out rows target the scratch slot `capacity`
            h_buf = h_buf.at[upd_dst].set(prev_h[upd_src])
            xyz_buf = xyz_buf.at[upd_dst].set(prev_xyz[upd_src])
            h_t = h_buf[slot_idx]
            xyz_t = xyz_buf[slot_idx]

            from ..tracking.crops import extract_box_crops
            det_crops, _ = extract_box_crops(jax.random.PRNGKey(seed), pts,
                                             boxes, crop_points)
            xyz_d, h_d = embed_fn(variables, det_crops)
            logits = grid_logits(variables, h_t, xyz_t, h_d, xyz_d,
                                 grid_backend)
            return h_buf, xyz_buf, logits, h_d, xyz_d

        def call(h_buf, xyz_buf, prev_h, prev_xyz, upd_src, upd_dst,
                 slot_idx, seed, pts, boxes):
            return frame(self.variables, h_buf, xyz_buf, prev_h, prev_xyz,
                         upd_src, upd_dst, slot_idx, seed, pts, boxes)

        call.jitted = frame
        return call

    # ---- gated sparse scoring (pair lists) -----------------------------------

    def _pair_backend(self, p_pad: int) -> str:
        """Sparse pair-list dispatch: the fused pallas pair kernel — sharded
        over the mesh's pair axis when every shard gets whole 16-row pair
        blocks, single-chip otherwise — else the XLA match_logits gather
        path (non-divisible P or incompatible heads; the pair batch is flat
        there, so XLA shards it like any training batch)."""
        if not self._use_pallas:
            return "xla"
        if self.mesh is not None:
            if p_pad % (self.mesh.size * 16) == 0:
                return "pallas-sharded"
            return "xla"
        if p_pad % 16 == 0:
            return "pallas"
        return "xla"

    def _pair_logits(self, variables, h_t, xyz_t, h_d, xyz_d,
                     t_idx, d_idx, backend: str):
        if backend == "pallas-sharded":
            from ..ops.pallas.match_grid import sharded_pair_logits
            return sharded_pair_logits(self.model, variables, h_t, xyz_t,
                                       h_d, xyz_d, t_idx, d_idx, self.mesh,
                                       interpret=self._interpret)
        if backend == "pallas":
            from ..ops.pallas.match_grid import pallas_pair_logits
            return pallas_pair_logits(self.model, variables, h_t, xyz_t,
                                      h_d, xyz_d, t_idx, d_idx,
                                      interpret=self._interpret)
        from ..ops.pallas.match_grid import xla_pair_logits
        return xla_pair_logits(self.model, variables, h_t, xyz_t, h_d, xyz_d,
                               t_idx, d_idx)

    def make_cached_pair_frame_fn(self, t_pad: int, d_pad: int,
                                  d_prev_pad: int, p_pad: int,
                                  capacity: int, crop_points: int):
        """Gated sparse variant of make_cached_frame_fn: identical scatter /
        gather / crop / embed plumbing, but only an explicit pair LIST is
        scored — (p_pad,) logits out instead of the (t_pad, d_pad) grid.

        This is the dense-frame fast path: the reference only scores pairs
        that survive its class + BEV gates (tracking_point_reid.py:110-116),
        and at Waymo density that is ~1% of the grid — the all-pairs kernel
        spends ~150 ms of a 173 ms device frame on pairs the gate discards.
        Callers pad the pair list to p_pad; padded rows point at (0, 0) and
        their logits are discarded on host.

        Returns fn(h_buf, xyz_buf, prev_h, prev_xyz, upd_src, upd_dst,
        slot_idx (t_pad,), pair_t (p_pad,), pair_d (p_pad,), seed, pts,
        boxes) -> (new_h_buf, new_xyz_buf, logits (p_pad,), h_dets,
        xyz_dets)."""
        assert not self.image_mode, "device cache is a point-branch path"
        pair_backend = self._pair_backend(p_pad)
        pair_logits = self._pair_logits
        embed_fn = self._make_embed_fn(d_pad)

        @jax.jit
        def frame(variables, h_buf, xyz_buf, prev_h, prev_xyz,
                  upd_src, upd_dst, slot_idx, pair_t, pair_d, seed, pts,
                  boxes):
            h_buf = h_buf.at[upd_dst].set(prev_h[upd_src])
            xyz_buf = xyz_buf.at[upd_dst].set(prev_xyz[upd_src])
            h_t = h_buf[slot_idx]
            xyz_t = xyz_buf[slot_idx]

            from ..tracking.crops import extract_box_crops
            det_crops, _ = extract_box_crops(jax.random.PRNGKey(seed), pts,
                                             boxes, crop_points)
            xyz_d, h_d = embed_fn(variables, det_crops)
            logits = pair_logits(variables, h_t, xyz_t, h_d, xyz_d,
                                 pair_t, pair_d, pair_backend)
            return h_buf, xyz_buf, logits, h_d, xyz_d

        def call(h_buf, xyz_buf, prev_h, prev_xyz, upd_src, upd_dst,
                 slot_idx, pair_t, pair_d, seed, pts, boxes):
            return frame(self.variables, h_buf, xyz_buf, prev_h, prev_xyz,
                         upd_src, upd_dst, slot_idx, pair_t, pair_d, seed,
                         pts, boxes)

        call.jitted = frame
        return call

    def _image_pair_logits(self, variables, h_t, h_d, t_idx, d_idx,
                           backend: str):
        if backend == "pallas-sharded":
            from ..ops.pallas.match_grid import sharded_image_pair_logits
            return sharded_image_pair_logits(self.model, variables, h_t, h_d,
                                             t_idx, d_idx, self.mesh,
                                             interpret=self._interpret)
        if backend == "pallas":
            from ..ops.pallas.match_grid import pallas_image_pair_logits
            return pallas_image_pair_logits(self.model, variables, h_t, h_d,
                                            t_idx, d_idx,
                                            interpret=self._interpret)
        from ..ops.pallas.match_grid import xla_image_pair_logits
        return xla_image_pair_logits(self.model, variables, h_t, h_d,
                                     t_idx, d_idx)

    def _embed_image_crops(self, variables, crops):
        """In-frame-program image embedding: ViT tokens + per-token
        downsample (the two-stage forward_inference path,
        ReIDNet.py:914-926 / :1232-1237)."""
        toks = self.model.apply(variables, crops, train=False, method="embed")
        return self.model.apply(variables, toks, train=False,
                                method="downsample_tokens")

    @staticmethod
    def _device_crops(images, l2cams, intrins, boxes, image_size,
                      output_size):
        """On-device camera crops inside a frame program. uint8 frames are
        accepted natively (uploading uint8 quarters the per-frame
        host->device image bytes — the dominant transfer — and
        crops_per_frame gathers uint8 rows before converting)."""
        from ..tracking.image_crops import crops_per_frame
        crops, _ = crops_per_frame(images, l2cams, intrins, boxes,
                                   image_size=image_size,
                                   output_size=output_size)
        return crops

    def make_cached_image_frame_fn(self, t_pad: int, d_pad: int,
                                   d_prev_pad: int, capacity: int,
                                   image_size, output_size):
        """Image-branch fused frame against a DeviceTrackCache: ONE program
        does [scatter last frame's det tokens into their track slots] ->
        [gather this frame's track rows by slot] -> [project boxes into the
        cameras + bilinear crops + ViT embed + token downsample] -> [full
        grid score]. Only the logits are fetched; detection token features
        stay on device as next frame's scatter source — the image analog of
        make_cached_frame_fn (the host-cache path round-trips ~8 MB of ViT
        tokens per dense frame, the same PCIe/tunnel tax the point branch
        eliminated).

        Matches the reference ImageReidentifier workload
        (tracking_point_reid.py:125-203: get_crops_per_image + cached
        ImageFeatureSet + pair scoring, pc_utils.py:239-303).

        Returns fn(h_buf, prev_h, upd_src (d_prev_pad,), upd_dst,
        slot_idx (t_pad,), images (ncam, 3, H, W) [uint8 ok], lidar2cams
        (ncam, 4, 4), intrinsics (ncam, 3, 3), boxes (d_pad, 7)) ->
        (new_h_buf, logits (t_pad, d_pad), h_dets)."""
        assert self.image_mode, "image frame fns are an image-branch path"
        grid_backend = self._grid_backend(d_pad)
        image_grid_logits = self._image_grid_logits
        embed_crops = self._embed_image_crops
        device_crops = functools.partial(self._device_crops,
                                         image_size=tuple(image_size),
                                         output_size=tuple(output_size))

        @jax.jit
        def frame(variables, h_buf, prev_h, upd_src, upd_dst, slot_idx,
                  images, l2cams, intrins, boxes):
            h_buf = h_buf.at[upd_dst].set(prev_h[upd_src])
            h_t = h_buf[slot_idx]
            crops = device_crops(images, l2cams, intrins, boxes)
            h_d = embed_crops(variables, crops)
            logits = image_grid_logits(variables, h_t, h_d, grid_backend)
            return h_buf, logits, h_d

        def call(h_buf, prev_h, upd_src, upd_dst, slot_idx, images, l2cams,
                 intrins, boxes):
            return frame(self.variables, h_buf, prev_h, upd_src, upd_dst,
                         slot_idx, images, l2cams, intrins, boxes)

        call.jitted = frame
        return call

    def make_cached_image_pair_frame_fn(self, t_pad: int, d_pad: int,
                                        d_prev_pad: int, p_pad: int,
                                        capacity: int, image_size,
                                        output_size):
        """Gated sparse variant of make_cached_image_frame_fn: identical
        scatter / gather / crop / embed plumbing, but only an explicit pair
        LIST is scored — (p_pad,) logits out instead of the (t_pad, d_pad)
        grid. The image analog of make_cached_pair_frame_fn.

        Returns fn(h_buf, prev_h, upd_src, upd_dst, slot_idx (t_pad,),
        pair_t (p_pad,), pair_d (p_pad,), images, lidar2cams, intrinsics,
        boxes) -> (new_h_buf, logits (p_pad,), h_dets)."""
        assert self.image_mode, "image frame fns are an image-branch path"
        pair_backend = self._pair_backend(p_pad)
        pair_logits = self._image_pair_logits
        embed_crops = self._embed_image_crops
        device_crops = functools.partial(self._device_crops,
                                         image_size=tuple(image_size),
                                         output_size=tuple(output_size))

        @jax.jit
        def frame(variables, h_buf, prev_h, upd_src, upd_dst, slot_idx,
                  pair_t, pair_d, images, l2cams, intrins, boxes):
            h_buf = h_buf.at[upd_dst].set(prev_h[upd_src])
            h_t = h_buf[slot_idx]
            crops = device_crops(images, l2cams, intrins, boxes)
            h_d = embed_crops(variables, crops)
            logits = pair_logits(variables, h_t, h_d, pair_t, pair_d,
                                 pair_backend)
            return h_buf, logits, h_d

        def call(h_buf, prev_h, upd_src, upd_dst, slot_idx, pair_t, pair_d,
                 images, l2cams, intrins, boxes):
            return frame(self.variables, h_buf, prev_h, upd_src, upd_dst,
                         slot_idx, pair_t, pair_d, images, l2cams, intrins,
                         boxes)

        call.jitted = frame
        return call

    def score_frame(self, cache: FeatureCache, track_ids, det_crops,
                    track_classes=None, det_classes=None):
        """One tracking frame (10 Hz workload): embed new detections, score
        against cached track features, return (cost_matrix, det_h, det_xyz).

        A frame with no active tracks (scene start) returns an empty
        (0, n_dets) matrix — every detection births a track downstream."""
        xyz_d, h_d = self.embed(det_crops)
        if len(track_ids) == 0:
            return jnp.zeros((0, h_d.shape[0])), h_d, xyz_d
        h_t, xyz_t = cache.gather(track_ids)
        mat = self.cost_matrix(h_t, xyz_t, h_d, xyz_d,
                               track_classes, det_classes)
        return mat, h_d, xyz_d
