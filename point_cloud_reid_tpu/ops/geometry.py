"""Core point-set ops, pure JAX/XLA.

TPU-native equivalents of the reference's point utilities
(reference: mmdet3d/models/pointnet2_utils.py:116-307 and the CUDA op extensions in
mmdet3d/ops/ — furthest_point_sample, knn, ball_query, group_points, gather_points,
interpolate). All functions are batched, fixed-shape, jit-friendly, and differentiable
where meaningful. Hot paths (kNN) additionally have Pallas variants in
point_cloud_reid_tpu.ops.pallas.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared euclidean distance.

    Args:
        src: (..., N, C)
        dst: (..., M, C)
    Returns:
        (..., N, M) squared distances.

    Reference semantics: mmdet3d/models/pointnet2_utils.py:169-188 (expanded form
    ||s||^2 + ||d||^2 - 2 s.d so the matmul rides the MXU).
    """
    # Contract over the channel dim with one matmul (MXU) + two cheap reductions (VPU).
    inner = jnp.matmul(src, jnp.swapaxes(dst, -1, -2), preferred_element_type=src.dtype)
    s2 = jnp.sum(src * src, axis=-1, keepdims=True)
    d2 = jnp.sum(dst * dst, axis=-1, keepdims=True)
    return s2 - 2.0 * inner + jnp.swapaxes(d2, -1, -2)


_SELECTOR_BUDGET_BYTES = 1_073_741_824  # per one-hot selector slice


def index_points(points: jnp.ndarray, idx: jnp.ndarray,
                 method: str = "auto") -> jnp.ndarray:
    """Gather points/features by index along the point axis.

    Args:
        points: (B, N, C)
        idx: (B, ...) int indices into N
    Returns:
        (B, ..., C)

    Equivalent of reference index_points (pointnet2_utils.py:151-167) and the
    gather_points CUDA op (ops/gather_points).

    On TPU, float gathers at backbone scale are routed through a one-hot
    MATMUL instead of XLA's gather: measured on v5e at the SA2 grouping shape
    (B=128, S*K=3072, N=128, C=64), take_along_axis moves 1.39 GB in 3.96 ms
    while the one-hot contraction moves 0.16 GB in 2.5 ms — gathers lower
    poorly on TPU, matmuls ride the MXU. The rewrite is EXACT (each one-hot
    row has a single 1.0, so the contraction reproduces the gathered value
    bit-for-bit; asserted on hardware). Falls back to take_along_axis for
    integer dtypes, CPU, N > 4096 (jit traces GLOBAL shapes — pod-scale DP
    batches must still pick the MXU path per device, and one-hot goes
    compute-bound past N~2048 where native catches up), or when a single
    (B, K, N) selector SLICE would exceed 1 GiB even after splitting K 64
    ways.

    The per-selector budget is 1 GiB, not the round-2 256 MB: at the
    flagship TRAIN shapes the old guard forced SA1/SA2 onto native gathers
    whose measured cost is 6-10x the one-hot's (tools/profile_gather.py,
    v5e bf16 — SA1 (512,128,128) x idx (512,128,32): take 20.6 ms fwd /
    34.3 ms scatter-vjp vs one-hot 3.3 / 3.3; SA2 (512,128,256) x
    (512,64,48): 17.8 / 29.9 vs 2.8 / 2.8 — XLA's native scatter runs at
    ~6 GB/s effective). Selectors above the budget are split into <=64 equal
    UNROLLED K-slices, each its own one-hot einsum writing an adjacent
    output slice (no lax.scan, no layout shuffles — a scanned variant
    measured slower than native); this keeps B=512+ training batches on the
    MXU path. The budget caps transient HBM residency per selector slice.
    """
    B, N, C = points.shape
    # Clamp out-of-range indices (e.g. query_ball_point's empty-ball sentinel
    # idx == N) so the one-hot and take_along_axis paths agree: both read the
    # last point, matching take_along_axis's clamping on every backend. The
    # one-hot path would otherwise silently return zeros for idx >= N.
    flat = jnp.clip(idx.reshape(B, -1).astype(jnp.int32), 0, N - 1)  # (B, K)
    K = flat.shape[1]
    budget = _SELECTOR_BUDGET_BYTES
    selector_bytes = B * K * N * points.dtype.itemsize
    splits = next((s for s in (1, 2, 4, 8, 16, 32, 64)
                   if K % s == 0 and selector_bytes // s <= budget), None)
    # One-hot arithmetic intensity is ~N FLOP/byte of output: compute-bound
    # past N ~ 2048 on v5e (59 TFLOP/s 64-wide vs ~700 GB/s), where the
    # native gather catches up — keep auto on the matmul path only for
    # N <= 4096. Crossover MEASURED at the SA1 train shape (B=512, K=4096,
    # tools/profile_ablation.py --gather, v5e f32): one-hot fwd/vjp ms
    # N=512 3.3/3.1, 1024 3.4/3.4, 2048 4.8/4.8, 4096 8.3/8.8, 8192
    # 17.6/15.9 vs native 25.3/33.3, 16.2/88.4, 16.2/85.6, 16.3/86.1,
    # 16.4/86.1 — inside the guard one-hot wins >=2x both directions; the
    # fwd-only crossover is ~N=8192 (native +7%) while the scatter-vjp
    # NEVER crosses (5.4x at 8192), so the N<=4096 bound is conservative
    # for fwd-only consumers and safe for training ones.
    # The generous split ceiling matters under multi-chip DP:
    # jit traces GLOBAL shapes, so a pod-scale batch must still pick the
    # one-hot path (GSPMD then partitions each split einsum per-device).
    use_onehot = method == "onehot" or (
        method == "auto" and jax.default_backend() == "tpu"
        and jnp.issubdtype(points.dtype, jnp.floating)
        and splits is not None and N <= 4096)
    if use_onehot:
        if splits is None or splits == 1:
            oh = jax.nn.one_hot(flat, N, dtype=points.dtype)          # (B, K, N)
            out = jnp.einsum("bkn,bnc->bkc", oh, points)
        else:
            parts = []
            for sl in jnp.split(flat, splits, axis=1):
                oh = jax.nn.one_hot(sl, N, dtype=points.dtype)
                parts.append(jnp.einsum("bkn,bnc->bkc", oh, points))
            out = jnp.concatenate(parts, axis=1)
    else:
        out = jnp.take_along_axis(points, flat[:, :, None], axis=1)   # (B, K, C)
    return out.reshape(idx.shape + (C,))


def knn_indices(
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    method: str = "argsort",
) -> jnp.ndarray:
    """k nearest neighbors of each query in `new_xyz` among `xyz`.

    Args:
        nsample: number of neighbors k.
        xyz: (B, N, C) database points.
        new_xyz: (B, S, C) query points.
        method: 'argsort' reproduces the reference's stable-argsort tie-breaking
            (pointnet2_utils.py:190-216, used by all released checkpoints);
            'topk' uses lax.top_k (faster on TPU, may break ties differently for
            duplicated points after resample-with-replacement);
            'pallas' uses the fused VMEM-resident kernel (ops.pallas.knn_pallas,
            same tie-breaking as 'argsort').
    Returns:
        (B, S, nsample) int32 neighbor indices.
    """
    if method == "pallas":
        from .pallas import knn_pallas
        return knn_pallas(new_xyz, xyz, nsample)
    d = square_distance(new_xyz, xyz)
    if method == "argsort":
        idx = jnp.argsort(d, axis=-1, stable=True)[..., :nsample]
    elif method == "topk":
        _, idx = jax.lax.top_k(-d, nsample)
    else:
        raise ValueError(f"unknown knn method: {method}")
    return idx.astype(jnp.int32)


def knn_feature_space(x: jnp.ndarray, k: int, method: str = "topk") -> jnp.ndarray:
    """kNN in feature space on channel-first input.

    Args:
        x: (B, C, N) features.
    Returns:
        (B, N, k) indices.

    Reference: attention.py:101-107 / dgcnn_orig.py:22-28 (uses topk on negative
    distance — torch.topk, which we mirror with lax.top_k).
    """
    xt = jnp.swapaxes(x, -1, -2)  # (B, N, C)
    d = square_distance(xt, xt)
    if method == "topk":
        _, idx = jax.lax.top_k(-d, k)
    else:
        idx = jnp.argsort(d, axis=-1, stable=True)[..., :k]
    return idx.astype(jnp.int32)


def random_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """'RANDOM' sampling as defined by the reference: deterministic first-n indices.

    The reference's random_point_sample (pointnet2_utils.py:139-149) returns
    arange(npoint) for every batch element — the randomness comes from the upstream
    resample-with-replacement in the data pipeline. We keep this contract for
    checkpoint parity (documented quirk, see SURVEY.md §7).
    """
    B = xyz.shape[0]
    return jnp.broadcast_to(jnp.arange(npoint, dtype=jnp.int32)[None], (B, npoint))


def farthest_point_sample(
    xyz: jnp.ndarray,
    npoint: int,
    rng: Optional[jax.Array] = None,
    deterministic_start: bool = False,
) -> jnp.ndarray:
    """Iterative farthest point sampling.

    Args:
        xyz: (B, N, 3)
        npoint: number of samples.
        rng: PRNG key for the random start point (reference uses randint start,
            pointnet2_utils.py:128). If None or deterministic_start, start at 0.
    Returns:
        (B, npoint) int32 indices.

    The selection loop is inherently sequential in npoint; each iteration is a
    batched distance update + argmax which XLA vectorizes on the VPU. Equivalent of
    the furthest_point_sample CUDA extension (ops/furthest_point_sample).
    """
    B, N, _ = xyz.shape
    if rng is None or deterministic_start:
        start = jnp.zeros((B,), dtype=jnp.int32)
    else:
        start = jax.random.randint(rng, (B,), 0, N, dtype=jnp.int32)

    def body(i, carry):
        centroids, distance, farthest = carry
        centroids = centroids.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)  # (B,1,3)
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)                         # (B,N)
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return centroids, distance, farthest

    centroids = jnp.zeros((B, npoint), dtype=jnp.int32)
    distance = jnp.full((B, N), 1e10, dtype=xyz.dtype)
    centroids, _, _ = jax.lax.fori_loop(0, npoint, body, (centroids, distance, start))
    return centroids


def farthest_point_sample_with_dist(
    dist: jnp.ndarray, npoint: int, start: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """FPS given a precomputed (B, N, N) distance matrix.

    Equivalent of FurthestPointSamplingWithDist
    (ops/furthest_point_sample/furthest_point_sample.py:42).
    """
    B, N, _ = dist.shape
    if start is None:
        start = jnp.zeros((B,), dtype=jnp.int32)

    def body(i, carry):
        centroids, running, farthest = carry
        centroids = centroids.at[:, i].set(farthest)
        d = jnp.take_along_axis(dist, farthest[:, None, None], axis=1)[:, 0]  # (B,N)
        running = jnp.minimum(running, d)
        farthest = jnp.argmax(running, axis=-1).astype(jnp.int32)
        return centroids, running, farthest

    centroids = jnp.zeros((B, npoint), dtype=jnp.int32)
    running = jnp.full((B, N), 1e10, dtype=dist.dtype)
    centroids, _, _ = jax.lax.fori_loop(0, npoint, body, (centroids, running, start))
    return centroids


def query_ball_point(
    radius: float, nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray
) -> jnp.ndarray:
    """Fixed-radius neighbor query with first-k fill semantics.

    Indices of up to `nsample` points within `radius` of each query; slots beyond the
    in-radius count are filled with the first in-radius neighbor, exactly as the
    reference (pointnet2_utils.py:218-240) and the ball_query CUDA op do.
    Returns (B, S, nsample) int32.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    d = square_distance(new_xyz, xyz)                                  # (B,S,N)
    arange = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, S, N))
    group_idx = jnp.where(d > radius * radius, N, arange)
    group_idx = jnp.sort(group_idx, axis=-1)[..., :nsample]
    first = jnp.broadcast_to(group_idx[..., :1], group_idx.shape)
    return jnp.where(group_idx == N, first, group_idx).astype(jnp.int32)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor features: (B, N, C), (B, S, K) -> (B, S, K, C).

    Equivalent of the group_points CUDA op (ops/group_points); the backward pass is
    XLA's scatter-add from autodiff of gather.
    """
    return index_points(points, idx)


def three_nn(unknown: jnp.ndarray, known: jnp.ndarray):
    """3 nearest neighbors + distances of `unknown` queries among `known` points.

    Returns (dist, idx): (B, N, 3) each. Equivalent of ops/interpolate/three_nn.py.
    """
    d = square_distance(unknown, known)
    neg, idx = jax.lax.top_k(-d, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(
    features: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """Inverse-distance-weighted interpolation of features.

    Args:
        features: (B, M, C) features at known points.
        idx: (B, N, 3) neighbor indices.
        weight: (B, N, 3) normalized weights.
    Returns:
        (B, N, C). Equivalent of ops/interpolate/three_interpolate.py.
    """
    gathered = index_points(features, idx)                 # (B, N, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def interpolate_idw(unknown: jnp.ndarray, known: jnp.ndarray, features: jnp.ndarray,
                    eps: float = 1e-8) -> jnp.ndarray:
    """Full 3-NN inverse-distance interpolation (PointNet++ FP layer primitive)."""
    dist, idx = three_nn(unknown, known)
    inv = 1.0 / (dist * dist + eps)
    weight = inv / jnp.sum(inv, axis=-1, keepdims=True)
    return three_interpolate(features, idx, weight)


def conv1_edge_factors(kernel: jnp.ndarray, bias: Optional[jnp.ndarray],
                       xyz: jnp.ndarray, points: Optional[jnp.ndarray],
                       center_xyz: jnp.ndarray,
                       center_points: Optional[jnp.ndarray], dt):
    """Per-point / per-center factors of the SA stage's first conv over the
    edge features [dxyz || center_feat || grouped_feat - center_feat]
    (reference layout: pointnet2_utils.py:242-288). conv1 is linear, so with
    the kernel split into the three row blocks W_d / W_c / W_g:

        conv1(edge)[b, s, k] = A[b, idx[b, s, k]] + Ct[b, s]
        A  = xyz @ W_d + points @ W_g                  # (B, N, C1) per-POINT
        Ct = -center_xyz @ W_d
             + center_points @ (W_c - W_g) + bias      # (B, S, C1) per-CENTER

    The grouped edge tensor is never materialized and the only grouped op is
    ONE C1-wide gather of A (K-times fewer MACs than convolving the edges;
    shared by SetAbstractionEdgeSA's edge_split/fused-train paths and the
    pallas sa_stage kernel so the algebra cannot drift between them).
    Exact up to float reassociation.
    """
    w_d = kernel[:3]
    A = xyz.astype(dt) @ w_d.astype(dt)
    Ct = -(center_xyz.astype(dt) @ w_d.astype(dt))
    if points is not None:
        D = points.shape[-1]
        w_c = kernel[3:3 + D]
        w_g = kernel[3 + D:]
        A = A + points.astype(dt) @ w_g.astype(dt)
        Ct = Ct + center_points.astype(dt) @ (w_c - w_g).astype(dt)
    if bias is not None:
        Ct = Ct + bias.astype(dt)
    return A, Ct


def sample_and_group_edge(
    nsample: int,
    xyz: jnp.ndarray,
    points: Optional[jnp.ndarray],
    numpoints: int,
    sampling: str = "RANDOM",
    radius: float = 0.0,
    use_knn: bool = True,
    fps_rng: Optional[jax.Array] = None,
    knn_method: str = "argsort",
):
    """Sample centers, group kNN neighborhoods, and build edge features.

    Edge feature layout per group: [grouped_xyz - center_xyz  ||  center_feat ||
    grouped_feat - center_feat], matching reference sample_and_group_edge
    (pointnet2_utils.py:242-288).

    Args:
        xyz: (B, N, 3); points: (B, N, D) or None.
    Returns:
        new_xyz (B, S, 3), new_points (B, S, K, 3[+2D]).
    """
    B, N, C = xyz.shape
    S = numpoints
    if sampling == "FPS":
        fps_idx = farthest_point_sample(xyz, S, rng=fps_rng)
    elif sampling == "RANDOM":
        fps_idx = random_point_sample(xyz, S)
    else:
        raise ValueError(f"unknown sampling {sampling}")

    new_xyz = index_points(xyz, fps_idx)                               # (B,S,3)
    if use_knn:
        idx = knn_indices(nsample, xyz, new_xyz, method=knn_method)
    else:
        idx = query_ball_point(radius, nsample, xyz, new_xyz)

    grouped_xyz = index_points(xyz, idx)                               # (B,S,K,3)
    grouped_xyz_norm = grouped_xyz - new_xyz[:, :, None, :]

    if points is not None:
        center = index_points(points, fps_idx)                         # (B,S,D)
        grouped = index_points(points, idx)                            # (B,S,K,D)
        new_points = jnp.concatenate(
            [
                grouped_xyz_norm,
                jnp.broadcast_to(center[:, :, None, :], grouped.shape),
                grouped - center[:, :, None, :],
            ],
            axis=-1,
        )
    else:
        new_points = grouped_xyz_norm
    return new_xyz, new_points


def sample_and_group_all(xyz: jnp.ndarray, points: Optional[jnp.ndarray]):
    """Single global group (reference pointnet2_utils.py:290-307)."""
    B, N, C = xyz.shape
    new_xyz = jnp.zeros((B, 1, C), dtype=xyz.dtype)
    grouped_xyz = xyz[:, None]
    if points is not None:
        new_points = jnp.concatenate([grouped_xyz, points[:, None]], axis=-1)
    else:
        new_points = grouped_xyz
    return new_xyz, new_points


def get_graph_feature(x: jnp.ndarray, k: int, idx: Optional[jnp.ndarray] = None,
                      edge: bool = True) -> jnp.ndarray:
    """DGCNN EdgeConv feature builder on channel-first input.

    Args:
        x: (B, C, N).
        edge: if True returns [neighbor - center || center] (dgcnn_orig.py:31-54);
            if False returns plain gathered neighbors (attention.py:109-131).
    Returns:
        (B, 2C, N, k) if edge else (B, C, N, k).
    """
    if idx is None:
        idx = knn_feature_space(x, k)
    xt = jnp.swapaxes(x, -1, -2)                                       # (B,N,C)
    feature = index_points(xt, idx)                                    # (B,N,k,C)
    if edge:
        center = jnp.broadcast_to(xt[:, :, None, :], feature.shape)
        feature = jnp.concatenate([feature - center, center], axis=-1)  # (B,N,k,2C)
    return jnp.transpose(feature, (0, 3, 1, 2))


def subsample_pc(
    rng: jax.Array, pc: jnp.ndarray, num_valid: jnp.ndarray, subsample_number: int
) -> jnp.ndarray:
    """Device-side random resample-with-replacement to a fixed point count.

    JAX equivalent of the data-frontend subsamplePC (datasets/utils.py:606-621):
    draws `subsample_number` uniform indices in [0, num_valid) with replacement;
    clouds with fewer than 3 valid points become all-zeros.

    Args:
        pc: (N_max, 3) padded cloud; num_valid: () int count of valid rows.
    Returns:
        (subsample_number, 3).
    """
    n = jnp.maximum(num_valid, 1)
    idx = jax.random.randint(rng, (subsample_number,), 0, n)
    out = jnp.take(pc, idx, axis=0)
    return jnp.where(num_valid >= 3, out, jnp.zeros_like(out))


def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray,
                     x_mask: Optional[jnp.ndarray] = None,
                     y_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Symmetric squared chamfer distance, mean over batch.

    Replaces pytorch3d.loss.chamfer_distance (used by the reference shape loss,
    ReIDNet.py:27,508-523). x, y: (B, N, 3) / (B, M, 3); optional masks (B, N)/(B, M).
    """
    d = square_distance(x, y)                                          # (B,N,M)
    big = jnp.asarray(1e10, d.dtype)
    if y_mask is not None:
        d = jnp.where(y_mask[:, None, :], d, big)
    if x_mask is not None:
        d_t = jnp.where(x_mask[:, :, None], d, big)
    else:
        d_t = d
    min_xy = jnp.min(d, axis=-1)                                       # (B,N)
    min_yx = jnp.min(d_t, axis=-2)                                     # (B,M)
    if x_mask is not None:
        cham_x = jnp.sum(min_xy * x_mask, -1) / jnp.maximum(jnp.sum(x_mask, -1), 1)
    else:
        cham_x = jnp.mean(min_xy, -1)
    if y_mask is not None:
        cham_y = jnp.sum(min_yx * y_mask, -1) / jnp.maximum(jnp.sum(y_mask, -1), 1)
    else:
        cham_y = jnp.mean(min_yx, -1)
    return jnp.mean(cham_x + cham_y)
