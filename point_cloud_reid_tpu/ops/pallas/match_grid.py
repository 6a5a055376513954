"""Fused pair-grid match head: the whole per-pair pipeline in one TPU kernel.

The NxM tracking grid (SURVEY.md §3.5; reference loops match_forward_inference
per gathered pair, tracking_point_reid.py:110-116) is HBM-bandwidth-bound as
an XLA program: every stage materializes (nt*nd, N, C) intermediates, and the
profiled 128x128 frame moves ~32 GB at ~700 GB/s for < 1 TFLOP of work.

This kernel keeps the per-pair chain — stage-1 linear-attention finish (from
hoisted per-object summaries), full stage-2 cross attention both directions,
point-cat max+avg pooling — entirely in VMEM. HBM traffic collapses to the
per-object factors in (O(n) backbone-sized tensors) and the pooled (nt, nd,
2C) features out; nothing per-pair ever touches HBM.

Grid layout: (nd / det_block, nt) — the detection block is resident across
the inner track sweep (fetched once per outer step), the track-side rows are
small. Per cell the kernel scores 1 track x det_block pairs; per-pair matmuls
are batched over the block's points (det_block*N rows) so every MXU call is a
tall GEMM against shared weights.

Everything that depends on ONE object is hoisted out of the kernel into
`grid_factors` (computed once per object, not once per pair): the stage-1
queries and [KV | Z] summaries (Z = diag(ksum) @ head-mask folds the
normalizer into the same contraction as the message), the stage-1 fc1
search-half products, and the stage-2 pos-MLP @ v_proj term.  The 1/N value
pre-scale and the xN message rescale cancel exactly and both sides drop them
(msg * N / (z+eps) with v/N == msg_noN / (z+eps)); numerics equality with
the XLA path is pinned by tests/test_pair_grid.py::test_pallas_grid_matches_xla.

Mosaic notes: elu has no primitive (exp-based select), iota >= 2D
(broadcasted_iota), per-head structure is expressed as block-diagonal (C, C)
summary matrices + head-selector matmuls so nothing reshapes lanes.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6


def _elu1(x: jnp.ndarray) -> jnp.ndarray:
    """elu(x) + 1 without the elu primitive (Mosaic has no expm1/elu).

    Branch-free identity: for x < 0 this is exp(x) + 0, for x >= 0 it is
    1 + x — no select, and no comparison (v5e Mosaic rejects bf16
    compares)."""
    zero = jnp.zeros((), x.dtype)
    return jnp.exp(jnp.minimum(x, zero)) + jnp.maximum(x, zero)


def _make_dot(dt):
    """MXU matmul: operands in the model dtype (bf16 on TPU — native MXU
    precision; f32 matmuls cost multiple passes), f32 accumulation and f32
    results. Measured both ways on v5e: keeping the big (bd*N, C) tensors
    resident in bf16 between ops was ~10% SLOWER than f32 residency (27.9
    vs 25.3 ms at 128x128) — this VPU runs elementwise f32 at full rate and
    bf16 costs conversions, so only the MXU operands drop to bf16."""
    def dot(a, b):
        return jnp.dot(a.astype(dt), b.astype(dt),
                       preferred_element_type=jnp.float32)
    return dot


def _kernel(*refs, nhead: int, det_block: int, n_true: int = 0,
            with_pos: bool = True, pair_mode: bool = False,
            debug_skip: frozenset = frozenset()):
    if with_pos:
        (ht_ref, qt_ref, kvzt_ref, at_ref, pvt_ref,
         hd_ref, qd_ref, kvzd_ref, ad_ref, pvd_ref,
         m1_ref, ln1s_ref, ln1b_ref, f11_ref, f12_ref, ln2s_ref, ln2b_ref,
         wq2_ref, wkv2_ref,
         m2_ref, ln21s_ref, ln21b_ref, f21_ref, f22_ref, ln22s_ref,
         ln22b_ref, out_ref) = refs
    else:
        # image head (CrossLinAttn): no pos-MLP terms anywhere
        (ht_ref, qt_ref, kvzt_ref, at_ref,
         hd_ref, qd_ref, kvzd_ref, ad_ref,
         m1_ref, ln1s_ref, ln1b_ref, f11_ref, f12_ref, ln2s_ref, ln2b_ref,
         wq2_ref, wkv2_ref,
         m2_ref, ln21s_ref, ln21b_ref, f21_ref, f22_ref, ln22s_ref,
         ln22b_ref, out_ref) = refs
        pvt_ref = pvd_ref = None
    N, C = ht_ref.shape[1], ht_ref.shape[2]
    H, bd = nhead, det_block
    D = C // H
    f32 = jnp.float32
    dt = ht_ref.dtype
    _dot = _make_dot(dt)

    # block-diagonal head mask (C, C): G[c', c] = 1 iff same head.  Doubles
    # as the normalizer reducer: (q * ksum) @ G sums each head's lanes and
    # broadcasts the sum back across them in ONE MXU op — the r2 kernel's
    # per-head lane-slice/sum/concat loop (zexp_rows) cost lane relayouts
    # that the cost bisection showed dominating the non-matmul time.
    r = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0) // D
    c = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1) // D
    head_mask = (r == c).astype(f32)

    # token-pad mask: rows >= n_live are sublane padding (image sequences,
    # S=198 tokens, are not 8-aligned). Padded rows must not leak into the
    # stage-2 template summaries or the pooled features; everything else is
    # row-local (LN over lanes, residuals) so garbage pad rows are harmless.
    n_live = n_true or N
    live3 = None
    if n_live < N:
        # (N, C) full-lane mask (a (1, N, 1) iota would need two squeezed
        # dims — a Mosaic lowering gotcha; this matches head_mask's pattern)
        tok = jax.lax.broadcasted_iota(jnp.int32, (N, C), 0)
        live3 = (tok < n_live).astype(f32)[None]             # (1, N, C)

    def layer_norm(x, scale_row, bias_row):
        if "ln" in debug_skip:          # cost-bisection variant (profiling)
            return x * scale_row + bias_row
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) * (x - mu), axis=-1, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        return xn * scale_row + bias_row

    def ffn(search3, msg3, a3, merge_w, l1s, l1b, fc1, fc2, l2s, l2b):
        """merge -> LN -> FFN([search || msg]) -> LN -> residual
        (CrossAttentionBlock._ffn), on (*, N, C) blocks.

        a3 is the search-half fc1 product: for the stage-1 calls it is
        per-OBJECT (search is the raw backbone feature) and arrives
        precomputed from `grid_factors` — hoisted out of the per-pair
        kernel entirely; the stage-2 calls pass None and compute it here
        (search is pair-dependent there).

        search3 may be (1, N, C): the track side stays un-broadcast — the
        relu-add and residual broadcast over the leading dim inside the
        elementwise ops, instead of materializing bd stacked copies (the
        r2 kernel's HT/POST concats were pure VMEM copy passes).

        fc1 is applied as two row-split matmuls (search @ fc1[:C] +
        msg @ fc1[C:]) instead of concatenating [search || msg] along lanes
        first — same MXU cycles (2x K=C vs 1x K=2C), no lane-offset concat
        copy, and Mosaic handles sublane weight slices natively."""
        m = layer_norm(_dot(msg3.reshape(bd * N, C), merge_w[:]), l1s, l1b)
        if "ffn" in debug_skip:         # cost-bisection variant (profiling)
            return search3 + m.reshape(bd, N, C)
        if a3 is None:
            ns = search3.shape[0]
            a3 = _dot(search3.reshape(ns * N, C),
                      fc1[:C]).reshape(ns, N, 2 * C)
        b3 = _dot(m, fc1[C:]).reshape(bd, N, 2 * C)
        h = jnp.maximum(a3 + b3, 0.0)                        # (bd, N, 2C)
        h2 = layer_norm(_dot(h.reshape(bd * N, 2 * C), fc2[:]), l2s, l2b)
        return search3 + h2.reshape(bd, N, C)

    def bdot(a3, b3):
        """Batched (bd, M, K) @ (bd, K, L) -> (bd, M, L) on the MXU — one
        batched dot_general instead of bd small launches (each small dot
        carries fixed issue overhead; the per-d loops dominated the r2
        kernel's cost bisection)."""
        return jax.lax.dot_general(a3.astype(dt), b3.astype(dt),
                                   (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=f32)

    def split_norm(mz3):
        """[message | normalizer] lanes from one fused [KV | Z]
        contraction -> msg / (z + eps).  Both lane halves are 64-aligned
        slices of the 128-lane result."""
        return mz3[..., :C] / (mz3[..., C:] + EPS)

    # ---- stage 1, direction track->det -------------------------------------
    # ONE batched matmul: broadcast qt across the det block (grid mode; in
    # pair mode the track side is already per-pair and the broadcast is the
    # identity), contract with each det's fused [KV | diag(ksum) @ G]
    # summary — message and normalizer from the same MXU pass.
    QT = jnp.broadcast_to(qt_ref[...], (bd, N, C))               # bf16
    M1 = split_norm(bdot(QT, kvzd_ref[...]))                     # (bd, N, C)
    o1a = ffn(ht_ref[...], M1, at_ref[...], m1_ref, ln1s_ref[:],
              ln1b_ref[:], f11_ref, f12_ref, ln2s_ref[:], ln2b_ref[:])

    # ---- stage 1, direction det->track ------------------------------------
    # qd/hd feed the matmuls in bf16 directly (the MXU casts anyway); only
    # the normalizer div / residual add promote to f32 on the fly.
    if pair_mode:
        # per-pair track summaries: same batched contraction as M1
        mz2_3 = bdot(qd_ref[...], kvzt_ref[...])             # (bd, N, 2C)
    else:
        mz2_3 = _dot(qd_ref[...].reshape(bd * N, C),
                     kvzt_ref[0]).reshape(bd, N, 2 * C)
    o2a = ffn(hd_ref[...], split_norm(mz2_3), ad_ref[...], m1_ref,
              ln1s_ref[:], ln1b_ref[:], f11_ref, f12_ref, ln2s_ref[:],
              ln2b_ref[:])                                   # (bd, N, C)

    # ---- stage 2 (full cross attention, pair-dependent both sides) --------
    def stage2_direction(search3, template3, pv3):
        """search/template (bd, N, C) f32: per-det-block full linear
        attention, the KV builds and message matmuls batched over bd.
        pv3 is the hoisted pos-MLP @ v_proj term, (1, N, C) on the track
        side — broadcast in the add.  k and v come from ONE fused
        template @ [Wk | Wv] matmul (tile-aligned 64-lane halves)."""
        q = _elu1(_dot(search3.reshape(bd * N, C), wq2_ref[:]))
        tkv = _dot(template3.reshape(bd * N, C),
                   wkv2_ref[:]).reshape(bd, N, 2 * C)
        k3 = _elu1(tkv[..., :C])                             # (bd, N, C)
        if live3 is not None:
            k3 = k3 * live3      # padded template rows: elu1(junk) > 0
        v3 = tkv[..., C:] if pv3 is None else tkv[..., C:] + pv3
        # (bd, C, C) = k_d^T v_d for every det at once
        kv = jax.lax.dot_general(k3.astype(dt), v3.astype(dt),
                                 (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=f32)
        kv = kv * head_mask[None]
        msg = bdot(q.reshape(bd, N, C), kv)
        ks = jnp.sum(k3, axis=1, keepdims=True)              # (bd, 1, C)
        z = _dot((q.reshape(bd, N, C) * ks).reshape(bd * N, C),
                 head_mask).reshape(bd, N, C)
        return msg / (z + EPS)

    if "stage2" in debug_skip:          # cost-bisection variant (profiling)
        o1b, o2b = o1a, o2a
    else:
        s2_msg1 = stage2_direction(
            o1a, o2a, None if pvd_ref is None else pvd_ref[...])
        s2_msg2 = stage2_direction(
            o2a, o1a, None if pvt_ref is None else pvt_ref[...])
        o1b = ffn(o1a, s2_msg1, None, m2_ref, ln21s_ref[:], ln21b_ref[:],
                  f21_ref, f22_ref, ln22s_ref[:], ln22b_ref[:])
        o2b = ffn(o2a, s2_msg2, None, m2_ref, ln21s_ref[:], ln21b_ref[:],
                  f21_ref, f22_ref, ln22s_ref[:], ln22b_ref[:])

    # ---- point-cat pool: max/avg over the 2N combined points --------------
    # 3D reductions over the point axis (the r2 kernel looped bd sublane
    # slices + a row concat); one aligned lane-concat of the (bd, C) halves.
    if live3 is None:
        mx = jnp.maximum(jnp.max(o1b, axis=1), jnp.max(o2b, axis=1))
        av = 0.5 * (jnp.mean(o1b, axis=1) + jnp.mean(o2b, axis=1))
    else:
        neg = (1.0 - live3) * 1e9
        mx = jnp.maximum(jnp.max(o1b - neg, axis=1),
                         jnp.max(o2b - neg, axis=1))
        inv = 1.0 / (2.0 * n_live)
        av = (jnp.sum(o1b * live3, axis=1)
              + jnp.sum(o2b * live3, axis=1)) * inv
    feats = jnp.concatenate([mx, av], axis=1).astype(out_ref.dtype)
    if pair_mode:
        out_ref[...] = feats                     # (bd, 2C) pair block
    else:
        out_ref[0] = feats                       # (1, bd, 2C) grid cell


def fused_match_grid(h_t: jnp.ndarray, qt: jnp.ndarray, kvzt: jnp.ndarray,
                     at1: jnp.ndarray, pvt: jnp.ndarray,
                     h_d: jnp.ndarray, qd: jnp.ndarray, kvzd: jnp.ndarray,
                     ad1: jnp.ndarray, pvd: jnp.ndarray,
                     stage1: Dict[str, Any], stage2: Dict[str, Any],
                     nhead: int, det_block: int = 8,
                     interpret: bool = False,
                     n_true: int = 0,
                     vmem_limit_mb: int = 20,
                     debug_skip: frozenset = frozenset()) -> jnp.ndarray:
    """All-pairs pooled match features.

    Args:
        h_t/h_d: (nt/nd, N, C) backbone features.
        qt/qd: (n, N, C) elu+1 stage-1 queries (per object).
        kvzt/kvzd: (n, C, 2C) fused [KV | Z] stage-1 summaries
            (`grid_factors`): KV is the block-diagonal key-value summary
            (no 1/N — it cancels against the xN message rescale),
            Z = diag(ksum) @ head-mask so the same contraction yields the
            normalizer.
        at1/ad1: (n, N, 2C) hoisted stage-1 fc1 search-half products.
        pvt/pvd: (n, N, C) hoisted stage-2 pos-MLP @ v_proj terms — None for
            the image head (CrossLinAttn has no pos-MLP), which also drops
            the corresponding kernel inputs entirely.
        stage1/stage2: weight dicts — stage1: merge (C,C), ln1_scale/ln1_bias
            (C,), fc1 (2C,2C), fc2 (2C,C), ln2_scale/ln2_bias; stage2 adds
            q (C,C) and kv (C,2C) = [Wk | Wv].
        n_true: true token count when the point axis was zero-padded to a
            sublane multiple (image sequences, S=198); 0 = all rows live.
    Returns:
        (nt, nd, 2C) pooled [max || avg] features; feed the match head.
    """
    nt, N, C = h_t.shape
    nd = h_d.shape[0]
    assert nd % det_block == 0, (nd, det_block)
    assert (pvt is None) == (pvd is None)
    # a typo'd skip name would silently time the FULL kernel and corrupt a
    # cost bisection — unknown names must fail loudly
    assert frozenset(debug_skip) <= frozenset({"stage2", "ffn", "ln"}), \
        f"unknown debug_skip names: {set(debug_skip) - {'stage2', 'ffn', 'ln'}}"
    with_pos = pvt is not None
    bd = det_block
    nb = nd // bd

    row = lambda v: v.reshape(1, -1)    # 1-D weight vectors -> (1, C) rows

    weights = [stage1["merge"], row(stage1["ln1_scale"]), row(stage1["ln1_bias"]),
               stage1["fc1"], stage1["fc2"],
               row(stage1["ln2_scale"]), row(stage1["ln2_bias"]),
               stage2["q"], stage2["kv"],
               stage2["merge"], row(stage2["ln1_scale"]), row(stage2["ln1_bias"]),
               stage2["fc1"], stage2["fc2"],
               row(stage2["ln2_scale"]), row(stage2["ln2_bias"])]

    track = lambda j, i: (i, 0, 0)
    det = lambda j, i: (j, 0, 0)
    const = lambda j, i: (0, 0)

    t_specs = [
        pl.BlockSpec((1, N, C), track, memory_space=pltpu.VMEM),    # ht
        pl.BlockSpec((1, N, C), track, memory_space=pltpu.VMEM),    # qt
        pl.BlockSpec((1, C, 2 * C), track, memory_space=pltpu.VMEM),  # kvzt
        pl.BlockSpec((1, N, 2 * C), track, memory_space=pltpu.VMEM),  # at
        pl.BlockSpec((1, N, C), track, memory_space=pltpu.VMEM),    # pvt
    ]
    d_specs = [
        pl.BlockSpec((bd, N, C), det, memory_space=pltpu.VMEM),     # hd
        pl.BlockSpec((bd, N, C), det, memory_space=pltpu.VMEM),     # qd
        pl.BlockSpec((bd, C, 2 * C), det, memory_space=pltpu.VMEM),  # kvzd
        pl.BlockSpec((bd, N, 2 * C), det, memory_space=pltpu.VMEM),  # ad
        pl.BlockSpec((bd, N, C), det, memory_space=pltpu.VMEM),     # pvd
    ]
    t_args = [h_t, qt, kvzt, at1, pvt]
    d_args = [h_d, qd, kvzd, ad1, pvd]
    if not with_pos:
        t_specs, d_specs = t_specs[:-1], d_specs[:-1]
        t_args, d_args = t_args[:-1], d_args[:-1]
    in_specs = t_specs + d_specs + [
        pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM) for w in weights]

    out_spec = pl.BlockSpec((1, bd, 2 * C), lambda j, i: (i, j, 0),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, nhead=nhead, det_block=bd,
                             n_true=n_true, with_pos=with_pos,
                             debug_skip=debug_skip)
    # det_block 32 wants ~18 MB of VMEM stack — well inside v5e's physical
    # VMEM but over the 16 MB default scoped limit (a 100 MB limit makes the
    # Mosaic allocator thrash, 25x slower — keep it tight).  Fewer, bigger
    # cells amortize per-op issue overhead, the dominant cost at C=64 widths.
    # Image blocks carry ~1.6x the rows (200 padded tokens), so callers bump
    # vmem_limit_mb when they raise det_block past 16 there.
    params = (None if interpret else
              pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_mb * 1024 * 1024))
    return pl.pallas_call(
        kern,
        grid=(nb, nt),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nt, nd, 2 * C), h_t.dtype),
        compiler_params=params,
        interpret=interpret,
    )(*t_args, *d_args, *weights)


def fused_match_pairs(h_t: jnp.ndarray, qt: jnp.ndarray, kvzt: jnp.ndarray,
                      at1: jnp.ndarray, pvt: jnp.ndarray,
                      h_d: jnp.ndarray, qd: jnp.ndarray, kvzd: jnp.ndarray,
                      ad1: jnp.ndarray, pvd: jnp.ndarray,
                      stage1: Dict[str, Any], stage2: Dict[str, Any],
                      nhead: int, pair_block: int = 16,
                      interpret: bool = False, n_true: int = 0,
                      vmem_limit_mb: int = 20) -> jnp.ndarray:
    """Pair-LIST pooled match features: the same fused VMEM chain as
    fused_match_grid, but both sides are already gathered per pair — every
    input is (P, ...) and row p scores the pair (track_p, det_p).

    This is the gated sparse scorer: the reference only ever scores the
    pairs that survive its class + BEV gates (it gathers them and loops
    match_forward_inference, tracking_point_reid.py:110-116) — the all-pairs
    grid is this repo's densification, and at Waymo density the 2 m gate
    kills ~99% of the T x D grid. The kernel is `_kernel` in pair_mode: the
    track refs carry (pb, N, C) blocks indexed like the det side, the
    stage-1 det->track message contracts per-pair [KV | Z] summaries with
    the same batched dot as track->det, and the output is a flat (P, 2C).

    VMEM: both sides are per-pair, so a pair block costs ~2x a grid det
    block — pair_block 16 fits the 20 MB scoped default.
    """
    P, N, C = h_t.shape
    pb = pair_block
    assert P % pb == 0, (P, pb)
    assert (pvt is None) == (pvd is None)
    with_pos = pvt is not None

    row = lambda v: v.reshape(1, -1)
    weights = [stage1["merge"], row(stage1["ln1_scale"]), row(stage1["ln1_bias"]),
               stage1["fc1"], stage1["fc2"],
               row(stage1["ln2_scale"]), row(stage1["ln2_bias"]),
               stage2["q"], stage2["kv"],
               stage2["merge"], row(stage2["ln1_scale"]), row(stage2["ln1_bias"]),
               stage2["fc1"], stage2["fc2"],
               row(stage2["ln2_scale"]), row(stage2["ln2_bias"])]

    blk = lambda j: (j, 0, 0)
    const = lambda j: (0, 0)

    def side_specs():
        specs = [
            pl.BlockSpec((pb, N, C), blk, memory_space=pltpu.VMEM),      # h
            pl.BlockSpec((pb, N, C), blk, memory_space=pltpu.VMEM),      # q
            pl.BlockSpec((pb, C, 2 * C), blk, memory_space=pltpu.VMEM),  # kvz
            pl.BlockSpec((pb, N, 2 * C), blk, memory_space=pltpu.VMEM),  # a1
            pl.BlockSpec((pb, N, C), blk, memory_space=pltpu.VMEM),      # pv
        ]
        return specs if with_pos else specs[:-1]

    t_args = [h_t, qt, kvzt, at1, pvt]
    d_args = [h_d, qd, kvzd, ad1, pvd]
    if not with_pos:
        t_args, d_args = t_args[:-1], d_args[:-1]
    in_specs = side_specs() + side_specs() + [
        pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM) for w in weights]
    out_spec = pl.BlockSpec((pb, 2 * C), lambda j: (j, 0),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, nhead=nhead, det_block=pb,
                             n_true=n_true, with_pos=with_pos,
                             pair_mode=True)
    params = (None if interpret else
              pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_mb * 1024 * 1024))
    return pl.pallas_call(
        kern,
        grid=(P // pb,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((P, 2 * C), h_t.dtype),
        compiler_params=params,
        interpret=interpret,
    )(*t_args, *d_args, *weights)


def _gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(n, ...) -> (P, ...) leading-axis row gather, routed through the
    one-hot MXU path (ops.geometry.index_points) — XLA's native gather
    lowers poorly on TPU and the source side here is small (n <= the track
    cache capacity), exactly the regime where the one-hot contraction wins."""
    from ..geometry import index_points
    n = x.shape[0]
    out = index_points(x.reshape(1, n, -1), idx[None].astype(jnp.int32))
    return out.reshape((idx.shape[0],) + x.shape[1:])


def pallas_pair_logits(model, variables, h_t, xyz_t, h_d, xyz_d,
                       t_idx, d_idx, pair_block: int = 16,
                       interpret: bool = False) -> jnp.ndarray:
    """Gated sparse match scoring: logits for an explicit (track, det) pair
    list. Per-object factors are computed once (O(T + D), shared with the
    grid path), gathered per pair on the MXU, and the fused pair kernel
    scores only the P survivors — at Waymo density that is ~50x less
    per-pair work than the full grid. Callers bucket-pad P to a multiple of
    pair_block; padded rows score garbage pairs and are discarded on host.

    Numerically identical to pallas_grid_logits[t_idx, d_idx] (tested)."""
    params = variables["params"]
    nhead = dict(model.cross_stage1)["nhead"]
    qt, kvzt, at1, pvt = grid_factors(params, h_t, xyz_t, nhead)
    qd, kvzd, ad1, pvd = grid_factors(params, h_d, xyz_d, nhead)
    w1, w2 = stage_weights(params)
    ht_p, qt_p, kvzt_p, at_p, pvt_p = (
        _gather_rows(x, t_idx) for x in (h_t, qt, kvzt, at1, pvt))
    hd_p, qd_p, kvzd_p, ad_p, pvd_p = (
        _gather_rows(x, d_idx) for x in (h_d, qd, kvzd, ad1, pvd))
    pooled = fused_match_pairs(ht_p, qt_p, kvzt_p, at_p, pvt_p,
                               hd_p, qd_p, kvzd_p, ad_p, pvd_p,
                               w1, w2, nhead, pair_block, interpret)
    return model.apply(
        variables, pooled,
        method=lambda m, x: m._match_head(x, train=False))[..., 0]


def sharded_pair_logits(model, variables, h_t, xyz_t, h_d, xyz_d,
                        t_idx, d_idx, mesh, pair_block: int = 16,
                        interpret: bool = False) -> jnp.ndarray:
    """Multi-chip gated sparse scoring: the pair LIST sharded over every
    mesh axis — each device recomputes the (tiny, O(T+D)) per-object
    factors, gathers its own pair shard, and runs the fused pair kernel.
    Zero collectives in the forward (pairs are independent), the same
    scale-out structure as sharded_grid_logits.

    Requires P % (mesh.size * pair_block) == 0 (each shard needs whole
    pair blocks); callers bucket-pad the pair list accordingly."""
    from jax.sharding import PartitionSpec as P
    shard_map, no_check_kw = _shard_map_nocheck()

    n_dev = mesh.size
    assert t_idx.shape[0] % (n_dev * pair_block) == 0, \
        (t_idx.shape[0], n_dev, pair_block)
    axes = tuple(mesh.axis_names)

    def local(h_t, xyz_t, h_d, xyz_d, t_loc, d_loc):
        return pallas_pair_logits(model, variables, h_t, xyz_t, h_d, xyz_d,
                                  t_loc, d_loc, pair_block=pair_block,
                                  interpret=interpret)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(), P(), P(axes), P(axes)),
                   out_specs=P(axes), **no_check_kw)
    return fn(h_t, xyz_t, h_d, xyz_d, t_idx, d_idx)


def xla_pair_logits(model, variables, h_t, xyz_t, h_d, xyz_d,
                    t_idx, d_idx) -> jnp.ndarray:
    """XLA fallback for the gated sparse scorer: gather the pair batch and
    reuse the model's aligned-pair forward (ReIDNet.match_logits — the
    training-path pair chain). Works for every match_type, not just the
    pallas-eligible flagship config."""
    h1, x1 = _gather_rows(h_t, t_idx), _gather_rows(xyz_t, t_idx)
    h2, x2 = _gather_rows(h_d, d_idx), _gather_rows(xyz_d, d_idx)
    logits, _ = model.apply(variables, h1, x1, h2, x2, train=False,
                            method="match_logits")
    return logits


def pallas_image_pair_logits(model, variables, h_t, h_d, t_idx, d_idx,
                             pair_block: int = 16,
                             interpret: bool = False) -> jnp.ndarray:
    """Image-branch gated sparse scoring: logits for an explicit
    (track, det) pair list through the fused pair kernel, minus the pos-MLP
    terms (CrossLinAttn has none) — the image analog of pallas_pair_logits.
    Token sequences are zero-padded to a sublane multiple and masked
    in-kernel (n_true), exactly like pallas_image_grid_logits.

    This is what lets the image tracker's deployment path skip ~99% of a
    dense frame's grid: the reference's ImageReidentifier also only scores
    gate survivors (tracking_point_reid.py:200-203)."""
    params = variables["params"]
    nhead = dict(model.cross_lin_attn)["nhead"]
    S = h_t.shape[1]
    n_pad = -(-S // 8) * 8
    qt, kvzt, at1 = image_grid_factors(params, h_t, nhead)
    qd, kvzd, ad1 = image_grid_factors(params, h_d, nhead)
    w1, w2 = stage_weights(params)
    ht_p, qt_p, at_p = (_pad_tokens(h_t, n_pad), _pad_tokens(qt, n_pad),
                        _pad_tokens(at1, n_pad))
    hd_p, qd_p, ad_p = (_pad_tokens(h_d, n_pad), _pad_tokens(qd, n_pad),
                        _pad_tokens(ad1, n_pad))
    ht_g, qt_g, kvzt_g, at_g = (
        _gather_rows(x, t_idx) for x in (ht_p, qt_p, kvzt, at_p))
    hd_g, qd_g, kvzd_g, ad_g = (
        _gather_rows(x, d_idx) for x in (hd_p, qd_p, kvzd, ad_p))
    pooled = fused_match_pairs(ht_g, qt_g, kvzt_g, at_g, None,
                               hd_g, qd_g, kvzd_g, ad_g, None,
                               w1, w2, nhead, pair_block, interpret,
                               n_true=(S if S != n_pad else 0))
    return model.apply(
        variables, pooled,
        method=lambda m, x: m._match_head(x, train=False))[..., 0]


def sharded_image_pair_logits(model, variables, h_t, h_d, t_idx, d_idx,
                              mesh, pair_block: int = 16,
                              interpret: bool = False) -> jnp.ndarray:
    """Multi-chip image gated sparse scoring: pair list sharded over every
    mesh axis, per-object factors recomputed per device (tiny, O(T+D)),
    zero collectives — the image analog of sharded_pair_logits. Requires
    P % (mesh.size * pair_block) == 0."""
    from jax.sharding import PartitionSpec as P
    shard_map, no_check_kw = _shard_map_nocheck()

    n_dev = mesh.size
    assert t_idx.shape[0] % (n_dev * pair_block) == 0, \
        (t_idx.shape[0], n_dev, pair_block)
    axes = tuple(mesh.axis_names)

    def local(h_t, h_d, t_loc, d_loc):
        return pallas_image_pair_logits(model, variables, h_t, h_d,
                                        t_loc, d_loc, pair_block=pair_block,
                                        interpret=interpret)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(axes), P(axes)),
                   out_specs=P(axes), **no_check_kw)
    return fn(h_t, h_d, t_idx, d_idx)


def xla_image_pair_logits(model, variables, h_t, h_d,
                          t_idx, d_idx) -> jnp.ndarray:
    """XLA fallback for the image sparse scorer: gather the pair batch and
    reuse ImageReIDNet.match_logits (works for every image match_type)."""
    h1, h2 = _gather_rows(h_t, t_idx), _gather_rows(h_d, d_idx)
    return model.apply(variables, h1, h2, train=False,
                       method="match_logits")


def _shard_map_nocheck():
    """(shard_map, no-check kwargs) across the jax-version rename: the
    experimental module predates check_vma and only accepts check_rep."""
    try:
        from jax import shard_map                   # jax >= 0.4.35
        return shard_map, {"check_vma": False}
    except ImportError:                             # pragma: no cover
        from jax.experimental.shard_map import shard_map
        return shard_map, {"check_rep": False}


def _stage1_factors(s1: Dict[str, Any], h: jnp.ndarray, v_in: jnp.ndarray,
                    nhead: int) -> Tuple[jnp.ndarray, ...]:
    """Shared per-object stage-1 factor math (point and image heads differ
    only in what feeds v_proj: h + pos_mlp(xyz) vs plain h)."""
    n, N, C = h.shape
    D = C // nhead
    q = _elu1(h @ s1["q_proj"]["kernel"])                        # (n, N, C)
    k = _elu1(h @ s1["k_proj"]["kernel"])
    v = v_in @ s1["v_proj"]["kernel"]
    kv = jnp.einsum("bnc,bnd->bcd", k, v)                        # (n, C, C)
    rr = jnp.arange(C)[:, None] // D
    cc = jnp.arange(C)[None, :] // D
    gmask = (rr == cc)
    kv = kv * gmask.astype(kv.dtype)                             # block-diag
    zmat = k.sum(axis=1)[:, :, None] * gmask[None].astype(kv.dtype)
    kvz = jnp.concatenate([kv, zmat], axis=-1)                   # (n, C, 2C)
    a1 = h @ s1["mlp_fc1"]["kernel"][:C]                         # (n, N, 2C)
    return q, kvz, a1


def grid_factors(params: Dict[str, Any], h: jnp.ndarray, xyz: jnp.ndarray,
                 nhead: int) -> Tuple[jnp.ndarray, ...]:
    """Per-object factors from raw cross_stage1/cross_stage2 params.

    Mirrors CrossAttentionBlock.query_features/template_summary and the
    stage-2 pos-MLP on plain weight arrays (param-tree paths are the
    converter-stable names).  Everything per-OBJECT in the pair chain is
    computed here, once, instead of per pair inside the kernel:

    Returns (q, kvz, a1, pv), all cast to h.dtype (bf16 on TPU — they feed
    MXU contractions, which cast anyway, and halve the VMEM blocks):
        q:   (n, N, C)  elu+1 stage-1 queries.
        kvz: (n, C, 2C) [KV | Z]: KV = k^T v block-diagonal summary (no 1/N;
             it cancels against the xN rescale), Z = diag(ksum) @ head-mask
             so q @ kvz yields message and normalizer in one contraction.
        a1:  (n, N, 2C) h @ stage1.fc1[:C] — the search half of the stage-1
             FFN's first layer (per-object, so hoisted).
        pv:  (n, N, C)  stage-2 pos-MLP(xyz) @ v_proj — the position half of
             the stage-2 value projection (per-object, so hoisted).
    """
    s1, s2 = params["cross_stage1"], params["cross_stage2"]
    pos1 = jax.nn.relu(xyz @ s1["pos_mlp"]["fc1"]["kernel"]
                       + s1["pos_mlp"]["fc1"]["bias"])
    pos1 = pos1 @ s1["pos_mlp"]["fc2"]["kernel"] + s1["pos_mlp"]["fc2"]["bias"]
    q, kvz, a1 = _stage1_factors(s1, h, h + pos1, nhead)
    pos2 = jax.nn.relu(xyz @ s2["pos_mlp"]["fc1"]["kernel"]
                       + s2["pos_mlp"]["fc1"]["bias"])
    pos2 = pos2 @ s2["pos_mlp"]["fc2"]["kernel"] + s2["pos_mlp"]["fc2"]["bias"]
    pv = pos2 @ s2["v_proj"]["kernel"]                           # (n, N, C)
    dt = h.dtype
    return q.astype(dt), kvz.astype(dt), a1.astype(dt), pv.astype(dt)


def image_grid_factors(params: Dict[str, Any], h: jnp.ndarray, nhead: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-object factors for the image head (CrossLinAttn — no pos-MLP):
    (q, kvz, a1) with the same conventions as grid_factors, computed on the
    TRUE token count (callers pad the outputs to a sublane multiple)."""
    q, kvz, a1 = _stage1_factors(params["cross_stage1"], h, h, nhead)
    dt = h.dtype
    return q.astype(dt), kvz.astype(dt), a1.astype(dt)


def _divisor_block(det_block: int, local_nd: int) -> int:
    """Largest block <= det_block that divides local_nd, preferring sublane
    alignment. The kernel needs whole det blocks per grid cell (a bare min()
    clamp can hand it a non-divisor, e.g. det_block=16 with 24 local dets),
    and its (1, bd, 2C) out block wants bd to be a multiple of Mosaic's
    8-row sublane tile — so an aligned divisor (8 for 16/24) wins over a
    larger unaligned one (12). When local_nd has no aligned divisor at all
    (tiny dryrun grids like 4 dets/device), fall back to the largest plain
    divisor; those shapes only run in interpret mode."""
    hi = max(1, min(det_block, local_nd))
    aligned = [b for b in range(8, hi + 1, 8) if local_nd % b == 0]
    if aligned:
        return aligned[-1]
    b = hi
    while local_nd % b:
        b -= 1
    return b


def _pad_tokens(x: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """Zero-pad the token axis (axis 1) to n_pad rows."""
    s = x.shape[1]
    if s == n_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, n_pad - s), (0, 0)))


def pallas_image_grid_logits(model, variables, h_t, h_d,
                             det_block: int = 8, interpret: bool = False,
                             vmem_limit_mb: int = 20,
                             debug_skip: frozenset = frozenset()
                             ) -> jnp.ndarray:
    """Image-branch pallas grid scorer: the same fused per-pair kernel as the
    point path, minus the pos-MLP terms (CrossLinAttn, attention.py:312-370
    has none). Token sequences (S=198 for DeiT-distilled) are zero-padded to
    a sublane multiple of 8 and masked in-kernel (stage-2 template keys +
    pooling — everything else is row-local).

    Drop-in equivalent of ImageReIDNet.match_logits_grid for the flagship
    image config (xcorr_eff / cross_lin_attn / linear / point-cat / both);
    the caller checks eligibility (PairScorer does)."""
    params = variables["params"]
    nhead = dict(model.cross_lin_attn)["nhead"]
    S = h_t.shape[1]
    n_pad = -(-S // 8) * 8
    qt, kvzt, at1 = image_grid_factors(params, h_t, nhead)
    qd, kvzd, ad1 = image_grid_factors(params, h_d, nhead)
    w1, w2 = stage_weights(params)
    ht_p, qt_p, at_p = (_pad_tokens(h_t, n_pad), _pad_tokens(qt, n_pad),
                        _pad_tokens(at1, n_pad))
    hd_p, qd_p, ad_p = (_pad_tokens(h_d, n_pad), _pad_tokens(qd, n_pad),
                        _pad_tokens(ad1, n_pad))
    nt, nd = h_t.shape[0], h_d.shape[0]

    def head(lo, hi):
        pooled = fused_match_grid(
            ht_p[lo:hi], qt_p[lo:hi], kvzt[lo:hi], at_p[lo:hi], None,
            hd_p, qd_p, kvzd, ad_p, None,
            w1, w2, nhead, det_block, interpret,
            n_true=(S if S != n_pad else 0), vmem_limit_mb=vmem_limit_mb,
            debug_skip=debug_skip)
        logits = model.apply(
            variables, pooled.reshape((hi - lo) * nd, pooled.shape[-1]),
            method=lambda m, x: m._match_head(x, train=False))[..., 0]
        return logits.reshape(hi - lo, nd)

    chunks = _track_chunks(nt, nd)
    if len(chunks) == 1:
        return head(0, nt)
    return jnp.concatenate([head(lo, hi) for lo, hi in chunks], axis=0)


def sharded_image_grid_logits(model, variables, h_t, h_d, mesh,
                              det_block: int = 8,
                              interpret: bool = False) -> jnp.ndarray:
    """Multi-chip image pallas grid: det tokens sharded over every mesh axis,
    tracks replicated, zero collectives — the image analog of
    sharded_grid_logits (same divisibility contract: nd % (mesh.size * 8))."""
    from jax.sharding import PartitionSpec as P
    shard_map, no_check_kw = _shard_map_nocheck()

    n_dev = mesh.size
    nd = h_d.shape[0]
    assert nd % (n_dev * 8) == 0, (nd, n_dev)
    axes = tuple(mesh.axis_names)

    def local(h_t, h_d):
        return pallas_image_grid_logits(
            model, variables, h_t, h_d,
            det_block=_divisor_block(det_block, nd // n_dev),
            interpret=interpret)

    fn = shard_map(local, mesh=mesh, in_specs=(P(), P(axes)),
                   out_specs=P(None, axes), **no_check_kw)
    return fn(h_t, h_d)


# Track-axis chunking bound for one fused kernel call, in PAIRS. XLA
# stack-allocates the kernel's pooled (nt, nd, 2C) output in scoped VMEM
# when it feeds the match head; past the largest measured-good grid
# (256x256 = 65,536 pairs, the bench's Waymo-dense frame) that promotion
# blows the 24 MB scoped-vmem limit and the whole program FAILS TO COMPILE
# ("Ran out of memory in memory space vmem ... for %frame = bf16[512,256,128]
# custom-call", first seen when a noisy-weights tracker birthed 512 live
# tracks). Chunks of <= this many pairs keep every sub-call bit-identical in
# structure to the proven shapes; only the (nt, nd) logits are concatenated.
_MAX_PAIRS_PER_CALL = 65536


def _track_chunks(nt: int, nd: int):
    """Even track-slice bounds so each kernel call scores <= the pair cap
    (one slice -> [(0, nt)] -> the call is byte-identical to unchunked)."""
    n_chunks = max(1, -(-nt * nd // _MAX_PAIRS_PER_CALL))
    step = -(-nt // n_chunks)
    return [(s, min(nt, s + step)) for s in range(0, nt, step)]


def pallas_grid_logits(model, variables, h_t, xyz_t, h_d, xyz_d,
                       det_block: int = 8, interpret: bool = False,
                       debug_skip: frozenset = frozenset()) -> jnp.ndarray:
    """Full pallas-backed grid scorer: factors -> fused kernel -> match head.

    Drop-in equivalent of ReIDNet.match_logits_grid for the flagship config
    (xcorr_eff / linear / point-cat / both-pool); the caller is responsible
    for checking compatibility (PairScorer does). Grids past
    _MAX_PAIRS_PER_CALL run the kernel + head per track slice (factors are
    computed once; pairs are independent along tracks)."""
    params = variables["params"]
    nhead = dict(model.cross_stage1)["nhead"]
    qt, kvzt, at1, pvt = grid_factors(params, h_t, xyz_t, nhead)
    qd, kvzd, ad1, pvd = grid_factors(params, h_d, xyz_d, nhead)
    w1, w2 = stage_weights(params)
    nt, nd = h_t.shape[0], h_d.shape[0]

    def head(lo, hi):
        pooled = fused_match_grid(h_t[lo:hi], qt[lo:hi], kvzt[lo:hi],
                                  at1[lo:hi], pvt[lo:hi],
                                  h_d, qd, kvzd, ad1, pvd,
                                  w1, w2, nhead, det_block, interpret,
                                  debug_skip=debug_skip)
        logits = model.apply(
            variables, pooled.reshape((hi - lo) * nd, pooled.shape[-1]),
            method=lambda m, x: m._match_head(x, train=False))[..., 0]
        return logits.reshape(hi - lo, nd)

    chunks = _track_chunks(nt, nd)
    if len(chunks) == 1:
        return head(0, nt)
    return jnp.concatenate([head(lo, hi) for lo, hi in chunks], axis=0)


def sharded_grid_logits(model, variables, h_t, xyz_t, h_d, xyz_d,
                        mesh, det_block: int = 8,
                        interpret: bool = False) -> jnp.ndarray:
    """Multi-chip pallas grid: detections sharded over every mesh axis, each
    device runs the fused kernel on its det shard (tracks replicated — the
    small side), results concatenated along the det axis. Zero collectives in
    the forward: pairs are independent, exactly the scale-out structure of
    the XLA path's pair-axis sharding constraint.

    Requires nd % (mesh.size * 8) == 0 (each shard needs whole det blocks).
    `interpret=True` lets the 8-device virtual CPU mesh validate the exact
    same program (tests/test_pair_grid.py).

    Traceable under jit (shard_map carries the mesh): this is what
    PairScorer routes through when a mesh is set, so the production scale-out
    path runs the fused kernel, not the slower XLA grid. GSPMD reshards the
    operands if the caller didn't place them; the eager wrapper below
    device_puts explicitly.
    """
    from jax.sharding import PartitionSpec as P
    shard_map, no_check_kw = _shard_map_nocheck()

    n_dev = mesh.size
    nd = h_d.shape[0]
    assert nd % (n_dev * 8) == 0, (nd, n_dev)
    axes = tuple(mesh.axis_names)

    def local(h_t, xyz_t, h_d, xyz_d):
        return pallas_grid_logits(model, variables, h_t, xyz_t, h_d, xyz_d,
                                  det_block=_divisor_block(det_block,
                                                           nd // n_dev),
                                  interpret=interpret)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(axes), P(axes)),
                   out_specs=P(None, axes), **no_check_kw)
    return fn(h_t, xyz_t, h_d, xyz_d)


def sharded_pallas_grid_logits(model, variables, h_t, xyz_t, h_d, xyz_d,
                               mesh, det_block: int = 8,
                               interpret: bool = False) -> jnp.ndarray:
    """Eager entry: place the det tensors on the mesh, then run the
    shard_map'd grid (see sharded_grid_logits)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    axes = tuple(mesh.axis_names)
    h_d = jax.device_put(h_d, NamedSharding(mesh, P(axes)))
    xyz_d = jax.device_put(xyz_d, NamedSharding(mesh, P(axes)))
    return sharded_grid_logits(model, variables, h_t, xyz_t, h_d, xyz_d,
                               mesh, det_block=det_block, interpret=interpret)


def stage_weights(params: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Extract the kernel weight dicts from the flax param tree."""
    s1, s2 = params["cross_stage1"], params["cross_stage2"]

    def common(s):
        return dict(merge=s["merge"]["kernel"],
                    ln1_scale=s["norm1"]["scale"], ln1_bias=s["norm1"]["bias"],
                    fc1=s["mlp_fc1"]["kernel"], fc2=s["mlp_fc2"]["kernel"],
                    ln2_scale=s["norm2"]["scale"], ln2_bias=s["norm2"]["bias"])

    w1 = common(s1)
    w2 = common(s2)
    w2.update(q=s2["q_proj"]["kernel"],
              kv=jnp.concatenate([s2["k_proj"]["kernel"],
                                  s2["v_proj"]["kernel"]], axis=1))
    return w1, w2
