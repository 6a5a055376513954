"""Sparse-voxel and position-adaptive conv equivalents, pure XLA.

Functional coverage for the last two native-extension rows of SURVEY.md §2.7
(neither is used by the active ReID path; both ship so the op surface is
complete):

  assign_score_withk      <- mmdet3d/ops/paconv (PAConv's weight-bank score
                             assembly, src/assign_score_withk_cuda.cu)
  SubmanifoldConv3d path  <- mmdet3d/ops/spconv (indice-pair building +
                             gather-matmul-scatter; the reference's
                             rulebook/reordering machinery collapses into one
                             kNN-style neighbor table + segment ops under XLA)
  sparse_conv3d           <- spconv SparseConv3d (subm=False: strided conv
                             whose output sites are the deduplicated cover of
                             the inputs' kernel footprints, conv.py:49-455)
  sparse_inverse_conv3d   <- spconv SparseInverseConv3d (inverse=True: reuses
                             the couple conv's indice pairs to scatter back
                             onto the pre-strided sites, conv.py:153-208)
  sparse_maxpool3d        <- spconv SparseMaxPool3d (pool.py:21-81)
  to_dense                <- spconv ToDense (modules.py:193-198)

Design: fixed-capacity voxel sets (pad + mask) instead of dynamic rulebooks —
the TPU-native replacement for spconv's indice_pairs (include/spconv/*.h).
Output sites of strided ops are assigned by a jit-compatible open-addressing
hash insert (first-occurrence order, counter-allocated slots) under a static
`capacity`; everything stays fixed-shape for XLA.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def assign_score_withk(scores: jnp.ndarray, points: jnp.ndarray,
                       centers: jnp.ndarray, knn_idx: jnp.ndarray,
                       aggregate: str = "sum") -> jnp.ndarray:
    """PAConv score-weighted kernel assembly.

    Args:
        scores: (B, N, K, M) softmax scores over M weight banks for each of
            the K neighbors of N query points.
        points: (B, Npoint, M, O) per-point features pre-multiplied by each
            weight bank (the reference's 'point_features').
        centers: (B, Npoint, M, O) center features pre-multiplied per bank.
        knn_idx: (B, N, K) neighbor indices into Npoint.
        aggregate: 'sum' | 'avg' | 'max' over banks (reference supports sum).
    Returns:
        (B, N, K, O) assembled features:
            out[b,n,k] = sum_m scores[b,n,k,m] *
                         (points[b, idx[b,n,k], m] - centers[b, n->center, m])
        Following the CUDA kernel, the center contribution uses the query
        point's own features (identity neighbor 0 semantics).
    """
    B, N, K, M = scores.shape
    O = points.shape[-1]
    idx = knn_idx.reshape(B, N * K).astype(jnp.int32)
    gathered = jnp.take_along_axis(
        points, idx[:, :, None, None].repeat(M, 2).repeat(O, 3), axis=1
    ).reshape(B, N, K, M, O)
    center = centers[:, :, None, :, :]                       # (B, N, 1, M, O)
    diff = gathered - center
    if aggregate == "sum":
        return jnp.einsum("bnkm,bnkmo->bnko", scores, diff)
    if aggregate == "avg":
        return jnp.einsum("bnkm,bnkmo->bnko", scores, diff) / M
    if aggregate == "max":
        return jnp.max(scores[..., None] * diff, axis=3)
    raise ValueError(aggregate)


_PROBES = 64   # linear-probing budget; tables are sized ≥2x load for this


def _coord_hash(c: jnp.ndarray, size: int) -> jnp.ndarray:
    # 3D coordinate hash (large primes; mirrors spconv's spatial hashing)
    x = (c[..., 0].astype(jnp.uint32) * jnp.uint32(73856093) ^
         c[..., 1].astype(jnp.uint32) * jnp.uint32(19349663) ^
         c[..., 2].astype(jnp.uint32) * jnp.uint32(83492791))
    return (x % jnp.uint32(size)).astype(jnp.int32)


def _hash_build(coords: jnp.ndarray, valid: jnp.ndarray, size: int):
    """Open-addressing insert of (coord -> row index), fixed probe budget."""
    table_key = jnp.full((size, 3), jnp.iinfo(jnp.int32).max, jnp.int32)
    table_val = jnp.full((size,), -1, jnp.int32)

    def insert(i, state):
        tk, tv = state
        slot = _coord_hash(coords[i], size)

        def probe(j, carry):
            tk, tv, done = carry
            s = (slot + j) % size
            empty = tv[s] < 0
            write = empty & ~done & valid[i]
            tk = jnp.where(write, tk.at[s].set(coords[i]), tk)
            tv = jnp.where(write, tv.at[s].set(i), tv)
            return tk, tv, done | write

        tk, tv, _ = jax.lax.fori_loop(0, _PROBES, probe, (tk, tv, False))
        return tk, tv

    return jax.lax.fori_loop(0, coords.shape[0], insert,
                             (table_key, table_val))


def _hash_lookup(table_key: jnp.ndarray, table_val: jnp.ndarray,
                 queries: jnp.ndarray) -> jnp.ndarray:
    """Vectorized lookup of (..., 3) coords -> row index or -1."""
    size = table_val.shape[0]

    def lookup(c):
        slot = _coord_hash(c, size)

        def probe(j, carry):
            found, done = carry
            s = (slot + j) % size
            hit = jnp.all(table_key[s] == c) & (table_val[s] >= 0)
            miss = table_val[s] < 0
            found = jnp.where(hit & ~done, table_val[s], found)
            return found, done | hit | miss

        found, _ = jax.lax.fori_loop(0, _PROBES, probe, (-1, False))
        return found

    flat = queries.reshape(-1, 3)
    return jax.vmap(lookup)(flat).reshape(queries.shape[:-1])


def build_indice_pairs(coords: jnp.ndarray, valid: jnp.ndarray,
                       kernel_offsets: jnp.ndarray,
                       hash_size: Optional[int] = None
                       ) -> jnp.ndarray:
    """Submanifold neighbor table: for each active voxel and kernel offset,
    the index of the active voxel at coords+offset (or -1).

    TPU-native replacement for spconv's getIndicePairs (src/indice.cc): an
    open-addressing integer hash over the fixed-capacity voxel set instead of
    a dynamic rulebook.

    Args:
        coords: (V, 3) int32 voxel coordinates (padded rows arbitrary).
        valid: (V,) bool mask of real voxels.
        kernel_offsets: (P, 3) int32 offsets (e.g. the 27 of a 3^3 kernel).
    Returns:
        (V, P) int32 neighbor indices, -1 where absent/invalid.
    """
    V = coords.shape[0]
    size = hash_size or max(2 * V, 16)
    table_key, table_val = _hash_build(coords, valid, size)
    queries = coords[:, None, :] + kernel_offsets[None, :, :]   # (V, P, 3)
    pairs = _hash_lookup(table_key, table_val, queries)
    return jnp.where(valid[:, None], pairs, -1)


def submanifold_conv3d(features: jnp.ndarray, coords: jnp.ndarray,
                       valid: jnp.ndarray, weights: jnp.ndarray,
                       bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Submanifold sparse 3D convolution over a fixed-capacity voxel set.

    Equivalent of spconv's SubMConv3d (ops/spconv/conv.py:49-455): output
    sites == input sites; each output is sum over kernel offsets of
    W[p] @ feat[neighbor(p)].

    Args:
        features: (V, Cin) voxel features (padded rows zero).
        coords: (V, 3) int32 voxel coords; valid: (V,) mask.
        weights: (P, Cin, Cout) one matrix per kernel offset, with
            kernel_offsets implied by the caller via build_indice_pairs.
        bias: optional (Cout,).
    Returns:
        (V, Cout) features (invalid rows zero).
    """
    P, Cin, Cout = weights.shape
    k = int(round(P ** (1 / 3)))
    r = (k - 1) // 2
    offs = jnp.stack(jnp.meshgrid(*([jnp.arange(-r, r + 1)] * 3),
                                  indexing="ij"), -1).reshape(-1, 3)
    pairs = build_indice_pairs(coords, valid, offs.astype(jnp.int32))  # (V,P)
    mask = pairs >= 0
    safe = jnp.maximum(pairs, 0)
    gathered = features[safe] * mask[..., None]            # (V, P, Cin)
    out = jnp.einsum("vpc,pcd->vd", gathered, weights)
    if bias is not None:
        out = out + bias
    return out * valid[:, None]


def _corner_offsets(kernel_size: int) -> jnp.ndarray:
    """(k^3, 3) kernel offsets in corner convention: out*s - p + off == in."""
    ax = jnp.arange(kernel_size)
    return jnp.stack(jnp.meshgrid(ax, ax, ax, indexing="ij"),
                     -1).reshape(-1, 3).astype(jnp.int32)


def build_strided_output(coords: jnp.ndarray, valid: jnp.ndarray,
                         kernel_size: int, stride: int, padding: int,
                         capacity: int,
                         spatial_shape: Optional[tuple] = None):
    """Output-site construction for strided sparse ops (spconv getIndicePairs
    with subm=False, src/indice.cc): the deduplicated set of output coords o
    such that o*stride - padding + offset hits an active input voxel, with
    o >= 0 (and o < ceil-div output shape when spatial_shape is given).

    Dynamic rulebook -> fixed capacity: output slots are allocated by a
    counter inside a jit-compatible hash insert, first-occurrence order
    (deterministic). Overflow beyond `capacity` is dropped silently — the
    exact worst case is V * ceil(k/s)^3 (each input voxel covers at most
    ceil(k/s) output sites per axis), which is what the callers default to.

    Returns:
        out_coords: (capacity, 3) int32 (padded rows zero)
        out_valid: (capacity,) bool
        pairs: (capacity, P) int32 indices into the INPUT rows, -1 absent —
            pairs[o, p] = input at out_coords[o]*stride - padding + offs[p]
    """
    V = coords.shape[0]
    offs = _corner_offsets(kernel_size)                       # (P, 3)
    P = offs.shape[0]
    cand = coords[:, None, :] + padding - offs[None, :, :]    # (V,P,3) = o*s
    ok = (valid[:, None]
          & jnp.all(cand % stride == 0, -1) & jnp.all(cand >= 0, -1))
    out = cand // stride
    if spatial_shape is not None:
        out_shape = jnp.asarray(
            [(d + 2 * padding - kernel_size) // stride + 1
             for d in spatial_shape], jnp.int32)
        ok = ok & jnp.all(out < out_shape[None, None, :], -1)
    flat, okf = out.reshape(-1, 3), ok.reshape(-1)

    size = max(4 * capacity, 16)
    tk = jnp.full((size, 3), jnp.iinfo(jnp.int32).max, jnp.int32)
    tv = jnp.full((size,), -1, jnp.int32)
    out_coords = jnp.zeros((capacity, 3), jnp.int32)

    def insert(i, state):
        tk, tv, oc, cnt = state
        c = flat[i]
        slot = _coord_hash(c, size)

        def probe(j, carry):
            tk, tv, oc, cnt, done = carry
            s = (slot + j) % size
            hit = jnp.all(tk[s] == c) & (tv[s] >= 0)
            empty = tv[s] < 0
            write = empty & ~done & (cnt < capacity)
            tk = jnp.where(write, tk.at[s].set(c), tk)
            tv = jnp.where(write, tv.at[s].set(cnt), tv)
            oc = jnp.where(write, oc.at[cnt].set(c), oc)
            cnt = cnt + write.astype(jnp.int32)
            # stop on: existing site (hit), claimed a slot, or table full of
            # other keys never happens under the 4x sizing + probe budget
            return tk, tv, oc, cnt, done | hit | write

        done0 = ~okf[i]
        tk, tv, oc, cnt, _ = jax.lax.fori_loop(
            0, _PROBES, probe, (tk, tv, oc, cnt, done0))
        return tk, tv, oc, cnt

    tk, tv, out_coords, n_out = jax.lax.fori_loop(
        0, V * P, insert, (tk, tv, out_coords, jnp.int32(0)))
    out_valid = jnp.arange(capacity) < n_out

    # neighbor table: output site x kernel offset -> input row
    in_tk, in_tv = _hash_build(coords, valid, max(2 * V, 16))
    queries = out_coords[:, None, :] * stride - padding + offs[None, :, :]
    pairs = _hash_lookup(in_tk, in_tv, queries)               # (capacity, P)
    pairs = jnp.where(out_valid[:, None], pairs, -1)
    return out_coords, out_valid, pairs


def sparse_conv3d(features: jnp.ndarray, coords: jnp.ndarray,
                  valid: jnp.ndarray, weights: jnp.ndarray,
                  stride: int = 2, padding: int = 1,
                  bias: Optional[jnp.ndarray] = None,
                  capacity: Optional[int] = None,
                  spatial_shape: Optional[tuple] = None):
    """Strided ("native") sparse 3D conv — spconv SparseConv3d with
    subm=False (conv.py:49-455): output sites are the kernel-footprint cover
    of the active inputs, downsampled by `stride`.

    Args:
        features: (V, Cin); coords: (V, 3) int32; valid: (V,).
        weights: (P, Cin, Cout), P = k^3 in corner-offset order
            (out*s - p + off == in).
        capacity: static output-row budget. A strided sparse conv DILATES a
            sparse active set (each voxel covers up to ceil(k/s)^3 output
            sites), so the default is the exact worst case
            V * ceil(k/s)^3; pass a tighter bound to trade memory when the
            occupancy is dense enough that footprints overlap.
    Returns:
        (out_features (capacity, Cout), out_coords, out_valid, pairs) —
        `pairs` feeds the couple sparse_inverse_conv3d.
    """
    P, Cin, Cout = weights.shape
    k = int(round(P ** (1 / 3)))
    capacity = capacity or coords.shape[0] * (-(-k // stride)) ** 3
    out_coords, out_valid, pairs = build_strided_output(
        coords, valid, k, stride, padding, capacity, spatial_shape)
    mask = pairs >= 0
    safe = jnp.maximum(pairs, 0)
    gathered = features[safe] * mask[..., None]          # (capacity, P, Cin)
    out = jnp.einsum("vpc,pcd->vd", gathered, weights)
    if bias is not None:
        out = out + bias
    return out * out_valid[:, None], out_coords, out_valid, pairs


def sparse_inverse_conv3d(features: jnp.ndarray, pairs: jnp.ndarray,
                          weights: jnp.ndarray, n_out: int,
                          bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Inverse sparse conv — spconv SparseInverseConv3d (conv.py:153-208):
    reuses the COUPLE strided conv's indice pairs to map features on the
    strided sites back onto the exact pre-strided site set ("inverse conv
    must have same kernel size as its couple conv", conv.py:156-158).

    Args:
        features: (Vo, Cin) on the strided conv's output sites.
        pairs: (Vo, P) the couple's pair table (into the original V rows).
        weights: (P, Cin, Cout); n_out: original row count V.
    Returns:
        (n_out, Cout): out[i] = sum over (o, p) with pairs[o, p] == i of
        weights[p]^T applied to features[o]  (+ bias on touched rows).
    """
    P, Cin, Cout = weights.shape
    contrib = jnp.einsum("vc,pcd->vpd", features, weights)   # (Vo, P, Cout)
    mask = pairs >= 0
    safe = jnp.where(mask, pairs, n_out)                     # overflow row
    out = jnp.zeros((n_out + 1, Cout), features.dtype).at[
        safe.reshape(-1)].add(contrib.reshape(-1, Cout)
                              * mask.reshape(-1, 1))[:n_out]
    if bias is not None:
        touched = jnp.zeros((n_out + 1,), jnp.float32).at[
            safe.reshape(-1)].max(mask.reshape(-1).astype(jnp.float32))[:n_out]
        out = out + bias * touched[:, None]
    return out


def sparse_maxpool3d(features: jnp.ndarray, coords: jnp.ndarray,
                     valid: jnp.ndarray, kernel_size: int,
                     stride: Optional[int] = None, padding: int = 0,
                     capacity: Optional[int] = None,
                     spatial_shape: Optional[tuple] = None):
    """Sparse max pooling — spconv SparseMaxPool3d (pool.py:21-81): same
    output-site construction as the strided conv; each output is the max
    over PRESENT neighbors only (absent kernel taps contribute nothing, not
    zeros — matching the reference's rulebook-gathered max).

    Returns (out_features, out_coords, out_valid). Default capacity is the
    exact worst case V * ceil(k/s)^3 (= V for the usual stride == kernel
    non-overlapping pool; larger when stride < kernel_size)."""
    stride = stride or kernel_size
    capacity = capacity or coords.shape[0] * (-(-kernel_size // stride)) ** 3
    out_coords, out_valid, pairs = build_strided_output(
        coords, valid, kernel_size, stride, padding, capacity, spatial_shape)
    mask = pairs >= 0                                        # (capacity, P)
    safe = jnp.maximum(pairs, 0)
    neg = jnp.finfo(features.dtype).min
    gathered = jnp.where(mask[..., None], features[safe], neg)
    out = jnp.max(gathered, axis=1)                          # (capacity, C)
    # sites always have >=1 present neighbor by construction; masked rows -> 0
    return (jnp.where(out_valid[:, None], out, 0.0), out_coords, out_valid)


def to_dense(features: jnp.ndarray, coords: jnp.ndarray, valid: jnp.ndarray,
             spatial_shape: tuple) -> jnp.ndarray:
    """Scatter a voxel set into a dense (D, H, W, C) grid — spconv ToDense
    (modules.py:193-198, NCDHW there; channel-last here for TPU layouts)."""
    D, H, W = spatial_shape
    C = features.shape[-1]
    lin = (coords[:, 0] * H + coords[:, 1]) * W + coords[:, 2]
    lin = jnp.where(valid, lin, D * H * W)                    # overflow row
    dense = jnp.zeros((D * H * W + 1, C), features.dtype).at[lin].add(
        features * valid[:, None])[:-1]
    return dense.reshape(D, H, W, C)
