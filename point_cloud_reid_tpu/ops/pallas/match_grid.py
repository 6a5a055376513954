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

Numerics follow models/attention_blocks.CrossAttentionBlock exactly (same
decomposition as finish_from_summary; the 1/v_length pre-scale folded into
the KV summaries, eps-regularized normalizer); equality with the XLA path is
pinned by tests/test_pair_grid.py::test_pallas_grid_matches_xla.

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


def _kernel(ht_ref, qt_ref, kvt_ref, kst_ref, post_ref,
            hd_ref, qd_ref, kvd_ref, ksd_ref, posd_ref,
            m1_ref, ln1s_ref, ln1b_ref, f11_ref, f12_ref, ln2s_ref, ln2b_ref,
            wq2_ref, wk2_ref, wv2_ref,
            m2_ref, ln21s_ref, ln21b_ref, f21_ref, f22_ref, ln22s_ref,
            ln22b_ref, out_ref, *, nhead: int, det_block: int,
            debug_skip: frozenset = frozenset()):
    N, C = ht_ref.shape[1], ht_ref.shape[2]
    H, bd = nhead, det_block
    D = C // H
    f32 = jnp.float32
    _dot = _make_dot(ht_ref.dtype)

    # block-diagonal head mask (C, C)
    r = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0) // D
    c = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1) // D
    head_mask = (r == c).astype(f32)

    def layer_norm(x, scale_row, bias_row):
        if "ln" in debug_skip:          # cost-bisection variant (profiling)
            return x * scale_row + bias_row
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) * (x - mu), axis=-1, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        return xn * scale_row + bias_row

    def ffn(search, msg, merge_w, l1s, l1b, fc1, fc2, l2s, l2b):
        """merge -> LN -> FFN([search || msg]) -> LN -> residual
        (CrossAttentionBlock._ffn).

        fc1 is applied as two row-split matmuls (search @ fc1[:C] +
        msg @ fc1[C:]) instead of concatenating [search || msg] along lanes
        first — same MXU cycles (2x K=C vs 1x K=2C), no lane-offset concat
        copy, and Mosaic handles sublane weight slices natively."""
        m = layer_norm(_dot(msg, merge_w[:]), l1s, l1b)
        if "ffn" in debug_skip:         # cost-bisection variant (profiling)
            return search + m
        h = jnp.maximum(_dot(search, fc1[:C]) + _dot(m, fc1[C:]), 0.0)
        h = layer_norm(_dot(h, fc2[:]), l2s, l2b)
        return search + h

    dt = ht_ref.dtype
    ht = ht_ref[0].astype(f32)                                   # (N, C)
    qt = qt_ref[0].astype(f32)
    kvt = kvt_ref[0].astype(f32)                                 # (C, C)
    kst = kst_ref[0].astype(f32)                                 # (1, C)
    post = post_ref[0].astype(f32)                               # (N, C)

    def bdot(a3, b3):
        """Batched (bd, M, K) @ (bd, K, L) -> (bd, M, L) on the MXU — one
        batched dot_general instead of bd small launches (each small dot
        carries fixed issue overhead; the per-d loops dominated the r2
        kernel's cost bisection)."""
        return jax.lax.dot_general(a3.astype(dt), b3.astype(dt),
                                   (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=f32)

    def zexp_rows(qk):
        """Batched normalizer from elementwise q*ksum rows (R, C)."""
        parts = []
        for h in range(H):
            z = jnp.sum(qk[:, h * D:(h + 1) * D], axis=1, keepdims=True)
            z = 1.0 / (z + EPS)                                  # (R, 1)
            parts.append(jnp.broadcast_to(z, (qk.shape[0], D)))
        return jnp.concatenate(parts, axis=1)                    # (R, C)

    # ---- stage 1, direction track->det -------------------------------------
    # ONE batched matmul: broadcast qt across the det block, contract with
    # each det's KV summary
    QT = jnp.broadcast_to(qt[None], (bd, N, C))                  # (bd, N, C)
    M1 = bdot(QT, kvd_ref[...]).reshape(bd * N, C)
    KSD = jnp.broadcast_to(ksd_ref[...].astype(f32),
                           (bd, N, C)).reshape(bd * N, C)
    QTr = QT.reshape(bd * N, C)
    M1 = M1 * zexp_rows(QTr * KSD) * N
    HT = jnp.concatenate([ht] * bd, axis=0)                      # (bd*N, C)
    o1a = ffn(HT, M1, m1_ref, ln1s_ref[:], ln1b_ref[:], f11_ref,
              f12_ref, ln2s_ref[:], ln2b_ref[:])

    # ---- stage 1, direction det->track ------------------------------------
    QD = qd_ref[...].astype(f32).reshape(bd * N, C)
    HD = hd_ref[...].astype(f32).reshape(bd * N, C)
    msg2 = _dot(QD, kvt)                                         # (bd*N, C)
    M2 = msg2 * zexp_rows(QD * kst) * N
    o2a = ffn(HD, M2, m1_ref, ln1s_ref[:], ln1b_ref[:], f11_ref,
              f12_ref, ln2s_ref[:], ln2b_ref[:])

    # ---- stage 2 (full cross attention, pair-dependent both sides) --------
    POSD = posd_ref[...].astype(f32).reshape(bd * N, C)
    POST = jnp.concatenate([post] * bd, axis=0)

    def stage2_direction(search, template, template_pos):
        """search/template (bd*N, C): per-det-block full linear attention,
        with the per-det KV builds and message matmuls batched over bd."""
        q = _elu1(_dot(search, wq2_ref[:].astype(f32)))
        k = _elu1(_dot(template, wk2_ref[:].astype(f32)))
        v = _dot(template + template_pos, wv2_ref[:].astype(f32)) / N
        k3 = k.reshape(bd, N, C)
        v3 = v.reshape(bd, N, C)
        # (bd, C, C) = k_d^T v_d for every det at once
        kv = jax.lax.dot_general(k3.astype(dt), v3.astype(dt),
                                 (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=f32)
        kv = kv * head_mask[None]
        msg = bdot(q.reshape(bd, N, C), kv).reshape(bd * N, C)
        ks = jnp.broadcast_to(jnp.sum(k3, axis=1, keepdims=True),
                              (bd, N, C)).reshape(bd * N, C)
        return msg * zexp_rows(q * ks) * N

    if "stage2" in debug_skip:          # cost-bisection variant (profiling)
        o1b, o2b = o1a, o2a
    else:
        s2_msg1 = stage2_direction(o1a, o2a, POSD)
        s2_msg2 = stage2_direction(o2a, o1a, POST)
        o1b = ffn(o1a, s2_msg1, m2_ref, ln21s_ref[:], ln21b_ref[:], f21_ref,
                  f22_ref, ln22s_ref[:], ln22b_ref[:])
        o2b = ffn(o2a, s2_msg2, m2_ref, ln21s_ref[:], ln21b_ref[:], f21_ref,
                  f22_ref, ln22s_ref[:], ln22b_ref[:])

    # ---- point-cat pool: max/avg over the 2N combined points --------------
    rows = []
    for d in range(bd):
        a = o1b[d * N:(d + 1) * N]
        b = o2b[d * N:(d + 1) * N]
        mx = jnp.maximum(jnp.max(a, axis=0, keepdims=True),
                         jnp.max(b, axis=0, keepdims=True))      # (1, C)
        av = 0.5 * (jnp.mean(a, axis=0, keepdims=True)
                    + jnp.mean(b, axis=0, keepdims=True))
        rows.append(jnp.concatenate([mx, av], axis=1))           # (1, 2C)
    out_ref[0] = jnp.concatenate(rows, axis=0).astype(out_ref.dtype)


def fused_match_grid(h_t: jnp.ndarray, qt: jnp.ndarray, kvt: jnp.ndarray,
                     kst: jnp.ndarray, post2: jnp.ndarray,
                     h_d: jnp.ndarray, qd: jnp.ndarray, kvd: jnp.ndarray,
                     ksd: jnp.ndarray, posd2: jnp.ndarray,
                     stage1: Dict[str, Any], stage2: Dict[str, Any],
                     nhead: int, det_block: int = 8,
                     interpret: bool = False,
                     debug_skip: frozenset = frozenset()) -> jnp.ndarray:
    """All-pairs pooled match features.

    Args:
        h_t/h_d: (nt/nd, N, C) backbone features.
        qt/qd: (n, N, C) elu+1 stage-1 queries (per object).
        kvt/kvd: (n, C, C) block-diagonal stage-1 KV summaries (values carry
            the 1/N pre-scale).
        kst/ksd: (n, C) stage-1 key sums.
        post2/posd2: (n, N, C) stage-2 pos-MLP outputs.
        stage1/stage2: weight dicts — stage1: merge (C,C), ln1_scale/ln1_bias
            (C,), fc1 (2C,2C), fc2 (2C,C), ln2_scale/ln2_bias; stage2 adds
            q/k/v (C,C).
    Returns:
        (nt, nd, 2C) pooled [max || avg] features; feed the match head.
    """
    nt, N, C = h_t.shape
    nd = h_d.shape[0]
    assert nd % det_block == 0, (nd, det_block)
    bd = det_block
    nb = nd // bd

    row = lambda v: v.reshape(1, -1)    # 1-D weight vectors -> (1, C) rows

    weights = [stage1["merge"], row(stage1["ln1_scale"]), row(stage1["ln1_bias"]),
               stage1["fc1"], stage1["fc2"],
               row(stage1["ln2_scale"]), row(stage1["ln2_bias"]),
               stage2["q"], stage2["k"], stage2["v"],
               stage2["merge"], row(stage2["ln1_scale"]), row(stage2["ln1_bias"]),
               stage2["fc1"], stage2["fc2"],
               row(stage2["ln2_scale"]), row(stage2["ln2_bias"])]

    track = lambda j, i: (i, 0, 0)
    det = lambda j, i: (j, 0, 0)
    const = lambda j, i: (0, 0)

    in_specs = [
        pl.BlockSpec((1, N, C), track, memory_space=pltpu.VMEM),   # ht
        pl.BlockSpec((1, N, C), track, memory_space=pltpu.VMEM),   # qt
        pl.BlockSpec((1, C, C), track, memory_space=pltpu.VMEM),   # kvt
        pl.BlockSpec((1, 1, C), track, memory_space=pltpu.VMEM),   # kst
        pl.BlockSpec((1, N, C), track, memory_space=pltpu.VMEM),   # post
        pl.BlockSpec((bd, N, C), det, memory_space=pltpu.VMEM),    # hd
        pl.BlockSpec((bd, N, C), det, memory_space=pltpu.VMEM),    # qd
        pl.BlockSpec((bd, C, C), det, memory_space=pltpu.VMEM),    # kvd
        pl.BlockSpec((bd, 1, C), det, memory_space=pltpu.VMEM),    # ksd
        pl.BlockSpec((bd, N, C), det, memory_space=pltpu.VMEM),    # posd
    ] + [pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM) for w in weights]

    out_spec = pl.BlockSpec((1, bd, 2 * C), lambda j, i: (i, j, 0),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, nhead=nhead, det_block=bd,
                             debug_skip=debug_skip)
    return pl.pallas_call(
        kern,
        grid=(nb, nt),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nt, nd, 2 * C), h_t.dtype),
        interpret=interpret,
    )(h_t, qt, kvt, kst[:, None, :], post2,
      h_d, qd, kvd, ksd[:, None, :], posd2, *weights)


def grid_factors(params: Dict[str, Any], h: jnp.ndarray, xyz: jnp.ndarray,
                 nhead: int) -> Tuple[jnp.ndarray, ...]:
    """Per-object factors from raw cross_stage1/cross_stage2 params.

    Mirrors CrossAttentionBlock.query_features/template_summary and the
    stage-2 pos-MLP on plain weight arrays (param-tree paths are the
    converter-stable names). Returns (q, kv_blockdiag, ksum, pos2).
    """
    s1, s2 = params["cross_stage1"], params["cross_stage2"]
    n, N, C = h.shape
    D = C // nhead

    q = _elu1(h @ s1["q_proj"]["kernel"])                        # (n, N, C)
    k = _elu1(h @ s1["k_proj"]["kernel"])
    pos1 = jax.nn.relu(xyz @ s1["pos_mlp"]["fc1"]["kernel"]
                       + s1["pos_mlp"]["fc1"]["bias"])
    pos1 = pos1 @ s1["pos_mlp"]["fc2"]["kernel"] + s1["pos_mlp"]["fc2"]["bias"]
    v = (h + pos1) @ s1["v_proj"]["kernel"] / N
    kv = jnp.einsum("bnc,bnd->bcd", k, v)                        # (n, C, C)
    rr = jnp.arange(C)[:, None] // D
    cc = jnp.arange(C)[None, :] // D
    kv = kv * (rr == cc).astype(kv.dtype)                        # block-diag
    ksum = k.sum(axis=1)                                         # (n, C)
    pos2 = jax.nn.relu(xyz @ s2["pos_mlp"]["fc1"]["kernel"]
                       + s2["pos_mlp"]["fc1"]["bias"])
    pos2 = pos2 @ s2["pos_mlp"]["fc2"]["kernel"] + s2["pos_mlp"]["fc2"]["bias"]
    return q, kv, ksum, pos2


def pallas_grid_logits(model, variables, h_t, xyz_t, h_d, xyz_d,
                       det_block: int = 8, interpret: bool = False,
                       debug_skip: frozenset = frozenset()) -> jnp.ndarray:
    """Full pallas-backed grid scorer: factors -> fused kernel -> match head.

    Drop-in equivalent of ReIDNet.match_logits_grid for the flagship config
    (xcorr_eff / linear / point-cat / both-pool); the caller is responsible
    for checking compatibility (PairScorer does)."""
    params = variables["params"]
    nhead = dict(model.cross_stage1)["nhead"]
    qt, kvt, kst, post = grid_factors(params, h_t, xyz_t, nhead)
    qd, kvd, ksd, posd = grid_factors(params, h_d, xyz_d, nhead)
    w1, w2 = stage_weights(params)
    pooled = fused_match_grid(h_t, qt, kvt, kst, post,
                              h_d, qd, kvd, ksd, posd,
                              w1, w2, nhead, det_block, interpret,
                              debug_skip=debug_skip)
    nt, nd = h_t.shape[0], h_d.shape[0]
    logits = model.apply(
        variables, pooled.reshape(nt * nd, pooled.shape[-1]),
        method=lambda m, x: m._match_head(x, train=False))[..., 0]
    return logits.reshape(nt, nd)


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
    try:
        from jax import shard_map                   # jax >= 0.4.35
        no_check_kw = {"check_vma": False}
    except ImportError:                             # pragma: no cover
        # the experimental module predates the check_vma rename and only
        # accepts check_rep — pass the matching kwarg per import path
        from jax.experimental.shard_map import shard_map
        no_check_kw = {"check_rep": False}

    n_dev = mesh.size
    nd = h_d.shape[0]
    assert nd % (n_dev * 8) == 0, (nd, n_dev)
    axes = tuple(mesh.axis_names)

    def local(h_t, xyz_t, h_d, xyz_d):
        return pallas_grid_logits(model, variables, h_t, xyz_t, h_d, xyz_d,
                                  det_block=min(det_block, nd // n_dev),
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
    w2.update(q=s2["q_proj"]["kernel"], k=s2["k_proj"]["kernel"],
              v=s2["v_proj"]["kernel"])
    return w1, w2
