"""The "point-transformer" backbone: PointNet++ SSG with linear self-attention.

Behavioral rebuild of Pointnet_Backbone (mmdet3d/models/backbone_net.py:25-124) and
its SA/FP modules (pointnet2_utils.py:309-473):

  3x SetAbstractionEdgeSA  — RANDOM (first-n) center sampling, kNN grouping, edge
     features [dxyz || center || df], Conv-BN-ReLU MLP x3 over groups, max over k,
     then a linear self-attention block.
  3x FeaturePropagationSA  — attention-based upsampling from coarse to fine.
  Final pointwise conv -> (B, N, 3), (B, N, conv_out).

Widths: sa = (32, 64, 128) * mul; npoints and nsample come from config
(backbone_list=[128,64,32], nsample=[32,48,48] in released configs).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import sample_and_group_edge, sample_and_group_all
from ..ops.geometry import (conv1_edge_factors, farthest_point_sample,
                            index_points, knn_indices, query_ball_point,
                            random_point_sample)
from .attention_blocks import FPSA, SelfAttentionBlock
from .layers import ConvBNReLU


class SetAbstractionEdgeSA(nn.Module):
    """One SA stage: sample+group edge features -> shared MLP -> max over k -> SA.

    The first MLP layer is applied in FACTORED form when features are present
    (edge_split=True, the default): the edge tensor
    [dxyz || center || grouped-center] is never materialized — conv1 is
    linear, so it splits into a per-POINT factor A and a per-CENTER term Ct
    with out1[b,s,k] = A[b, idx[b,s,k]] + Ct[b,s]
    (ops.geometry.conv1_edge_factors, shared with the pallas sa_stage kernel
    so the algebra cannot drift between paths). K-times fewer MACs (flagship
    SA3: 434 -> 105 GFLOP) and ONE C1-wide gather per stage. Exact up to
    float reassociation — equality pinned by
    tests/test_models.py::test_sa_edge_split_matches_materialized.
    """

    mlp: Sequence[int]          # [in, h1, h2, h3]; in gets +3 when use_xyz
    nsample: int
    radius: float = 0.5
    sampling: str = "RANDOM"
    use_xyz: bool = True
    use_knn: bool = True
    group_all: bool = False
    knn_method: str = "argsort"
    edge_split: bool = True
    # train-mode fused-residual path (ops/sa_train): one op for the whole
    # gather->conv/BN/relu x3->max chain. Output, batch stats, and gradients
    # match the unfused path (tests/test_sa_train.py) but the full train step
    # measured SLOWER than the flax path at the flagship shapes (see
    # ops/sa_train.py docstring for the numbers) — default OFF, kept as a
    # measured-dead-end record and an opt-in for re-evaluation.
    fused_train: bool = False
    # True: custom-VJP residual policy (ops/sa_train.sa_train_pooled);
    # False: same fused forward math, plain autodiff backward.
    fused_train_vjp: bool = True
    # eval-mode fused pallas path (ops/pallas/sa_stage): gather + conv MLP +
    # max-over-k in one VMEM-resident kernel per crop. Inference only — train
    # runs the XLA/custom-VJP path (autodiff + batch-stat updates).
    pallas_inference: bool = False
    pallas_interpret: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, points: Optional[jnp.ndarray],
                 numpoints: int, train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """xyz: (B, N, 3); points: (B, N, D) or None -> (B, S, 3), (B, S, C_out)."""
        blocks = [ConvBNReLU(f, dtype=self.dtype, name=f"mlp_{i}")
                  for i, f in enumerate(self.mlp[1:])]

        use_fused = (self.pallas_inference and not train
                     and not self.is_initializing()
                     and not self.group_all and self.use_knn
                     and self.sampling == "RANDOM" and len(blocks) == 3)
        if use_fused:
            from ..ops.pallas.sa_stage import sa_stage_inference
            cidx = jnp.clip(jnp.arange(numpoints), 0, xyz.shape[1] - 1)
            new_xyz = xyz[:, cidx]
            idx = knn_indices(self.nsample, xyz, new_xyz,
                              method=self.knn_method)
            params = {}
            stats = {}
            for i, blk in enumerate(blocks):
                p = blk.conv.variables["params"]
                params[f"mlp_{i}"] = {
                    "conv": dict(kernel=p["kernel"], bias=p.get("bias")),
                    "bn": blk.bn.variables["params"],
                }
                stats[f"mlp_{i}"] = {"bn": blk.bn.variables["batch_stats"]}
            h = sa_stage_inference(xyz, points, idx, params, stats,
                                   dtype=self.dtype,
                                   eps=float(blocks[0].bn.epsilon),
                                   interpret=self.pallas_interpret)
            h = SelfAttentionBlock(self.mlp[-1], nhead=2, dtype=self.dtype,
                                   name="self_attention")(h, new_xyz)
            return new_xyz, h

        use_fused_train = (self.fused_train and train
                           and not self.is_initializing()
                           and not self.group_all and len(blocks) == 3)
        if use_fused_train:
            new_xyz, h, stats = self._fused_train_forward(
                blocks, xyz, points, numpoints)
            for blk, (m, v) in zip(blocks, stats):
                blk.update_stats(m, v)
            h = SelfAttentionBlock(self.mlp[-1], nhead=2, dtype=self.dtype,
                                   name="self_attention")(h, new_xyz)
            return new_xyz, h

        use_split = (self.edge_split and not self.group_all
                     and points is not None)
        if use_split:
            new_xyz, h = self._split_first_layer(blocks[0], xyz, points,
                                                 numpoints, train)
            rest = blocks[1:]
        else:
            if self.group_all:
                new_xyz, new_points = sample_and_group_all(xyz, points)
            else:
                new_xyz, new_points = sample_and_group_edge(
                    nsample=self.nsample, xyz=xyz, points=points,
                    numpoints=numpoints, sampling=self.sampling,
                    radius=self.radius, use_knn=self.use_knn,
                    knn_method=self.knn_method,
                )
            h = blocks[0](new_points, train=train)
            rest = blocks[1:]
        for blk in rest:
            h = blk(h, train=train)
        h = jnp.max(h, axis=2)                                   # max over k
        h = SelfAttentionBlock(self.mlp[-1], nhead=2, dtype=self.dtype,
                               name="self_attention")(h, new_xyz)
        return new_xyz, h

    def _centers_and_idx(self, xyz, numpoints):
        """Center sampling + neighbor indices (shared by the factored paths)."""
        if self.sampling == "FPS":
            fps_idx = farthest_point_sample(xyz, numpoints)
        elif self.sampling == "RANDOM":
            fps_idx = random_point_sample(xyz, numpoints)
        else:
            # mirror sample_and_group_edge's validation (ops/geometry.py) so a
            # config typo fails the same way on every path
            raise ValueError(f"unknown sampling {self.sampling}")
        new_xyz = index_points(xyz, fps_idx)
        if self.use_knn:
            idx = knn_indices(self.nsample, xyz, new_xyz,
                              method=self.knn_method)
        else:
            idx = query_ball_point(self.radius, self.nsample, xyz, new_xyz)
        return fps_idx, new_xyz, idx

    def _fused_train_forward(self, blocks, xyz, points, numpoints):
        """conv1 factors (A, Ct) + the fused chain (ops/sa_train)."""
        from ..ops.sa_train import sa_train_pooled, sa_train_reference
        chain = sa_train_pooled if self.fused_train_vjp else sa_train_reference
        blk0 = blocks[0]
        fps_idx, new_xyz, idx = self._centers_and_idx(xyz, numpoints)
        params = blk0.conv.variables["params"]
        dt = self.dtype
        A, Ct = conv1_edge_factors(
            params["kernel"], params.get("bias"), xyz, points, new_xyz,
            None if points is None else index_points(points, fps_idx), dt)

        def conv_params(blk):
            p = blk.conv.variables["params"]
            b = p.get("bias")
            return p["kernel"], (jnp.zeros((p["kernel"].shape[-1],),
                                           jnp.float32) if b is None else b)

        def bn_params(blk):
            p = blk.bn.variables["params"]
            return p["scale"], p["bias"]

        w2, b2 = conv_params(blocks[1])
        w3, b3 = conv_params(blocks[2])
        g1, be1 = bn_params(blocks[0])
        g2, be2 = bn_params(blocks[1])
        g3, be3 = bn_params(blocks[2])
        cfg = (float(blk0.bn.epsilon), jnp.dtype(dt).name)
        out, stats = chain(cfg, A, Ct, idx.astype(jnp.int32),
                           w2, b2, w3, b3,
                           g1, be1, g2, be2, g3, be3)
        return new_xyz, out, stats

    def _split_first_layer(self, blk0, xyz, points, numpoints, train):
        """Factored conv1 over edge features (see class docstring)."""
        D = points.shape[-1]
        if self.is_initializing():
            # create conv params at the full edge width without the big tensor
            blk0.conv(jnp.zeros((1, 3 + 2 * D), points.dtype))
        fps_idx, new_xyz, idx = self._centers_and_idx(xyz, numpoints)

        p = blk0.conv.variables["params"]
        A, Ct = conv1_edge_factors(
            p["kernel"], p.get("bias"), xyz, points, new_xyz,
            index_points(points, fps_idx), self.dtype)
        out1 = index_points(A, idx) + Ct[:, :, None, :]
        return new_xyz, blk0.norm_act(out1, train=train)


class FeaturePropagationSA(nn.Module):
    """FP stage — pure attention interpolation (the conv list in the reference
    PointNetFeaturePropagationSA is constructed but unused in forward,
    pointnet2_utils.py:460-473; we keep only the live FP_SA path)."""

    feat1_dim: int
    feat2_dim: int
    d_model: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz1, xyz2, points1, points2) -> jnp.ndarray:
        return FPSA(feat1_dim=self.feat1_dim, feat2_dim=self.feat2_dim,
                    d_model=self.d_model, out_dim=self.out_dim, nhead=2,
                    dtype=self.dtype, name="interpolation")(
                        points1, xyz1, points2, xyz2)


class PointTransformerBackbone(nn.Module):
    """Full backbone. forward(pts (B, N, 3), numpoints=[n1,n2,n3]) ->
    (xyz (B,N,3), feats (B,N,conv_out))."""

    input_channels: int = 0
    use_xyz: bool = True
    conv_out: int = 32
    mul: int = 1
    radius: Sequence[float] = (0.3, 0.5, 0.7)
    nsample: Sequence[int] = (32, 48, 48)
    knn_method: str = "argsort"
    fused_train: bool = False
    fused_train_vjp: bool = True
    # SA stages to rematerialize in backward (e.g. (0,) or (0, 1, 2)): the
    # stage's grouped (B, S, K, C) chain is recomputed during its backward
    # instead of being stored as autodiff residuals. Gradient- and
    # batch-stats-exact vs the default (tests/test_models.py::
    # test_backbone_stage_remat_matches); measured via
    # tools/profile_train_table.py --remat (VERDICT r4 item 6).
    remat_stages: Sequence[int] = ()
    pallas_inference: bool = False
    pallas_interpret: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pointcloud: jnp.ndarray, numpoints: Sequence[int],
                 train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        sa1, sa2, sa3 = 32 * self.mul, 64 * self.mul, 128 * self.mul
        xyz = pointcloud[..., :3]
        features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None

        # ---- SA encoder -------------------------------------------------------
        sa_specs = [
            dict(mlp=[self.input_channels + 3, sa1, sa1, sa1], nsample=self.nsample[0],
                 radius=self.radius[0]),
            dict(mlp=[sa2 + 3, sa2, sa2, sa2], nsample=self.nsample[1],
                 radius=self.radius[1]),
            dict(mlp=[sa3 + 3, sa3, sa3, sa3], nsample=self.nsample[2],
                 radius=self.radius[2]),
        ]
        l_xyz, l_feats = [xyz], [features]
        for i, spec in enumerate(sa_specs):
            # numpoints (3) and train (4) are static: Python ints/bools that
            # select code paths inside the stage (arg 0 is the module itself).
            cls = (nn.remat(SetAbstractionEdgeSA, static_argnums=(3, 4))
                   if i in tuple(self.remat_stages) else SetAbstractionEdgeSA)
            li_xyz, li_feats = cls(
                mlp=spec["mlp"], nsample=spec["nsample"], radius=spec["radius"],
                sampling="RANDOM", use_xyz=self.use_xyz, use_knn=True,
                knn_method=self.knn_method,
                fused_train=self.fused_train,
                fused_train_vjp=self.fused_train_vjp,
                pallas_inference=self.pallas_inference,
                pallas_interpret=self.pallas_interpret,
                dtype=self.dtype, name=f"sa_{i}",
            )(l_xyz[i], l_feats[i], numpoints[i], train)
            l_xyz.append(li_xyz)
            l_feats.append(li_feats)

        # ---- FP decoder (attention upsampling), coarse -> fine ----------------
        # reference widths (backbone_net.py:84-86 mlp_inte args):
        #   FP[2]: feat1=sa2,  feat2=sa3, d=sa2, out=sa3
        #   FP[1]: feat1=sa1,  feat2=sa3, d=sa2, out=sa2    (feat2 is FP[2] output)
        #   FP[0]: feat1=3,    feat2=sa2, d=sa2, out=sa1    (feat2 is FP[1] output)
        fp_specs = [
            dict(feat1_dim=3, feat2_dim=sa2, d_model=sa2, out_dim=sa1),
            dict(feat1_dim=sa1, feat2_dim=sa3, d_model=sa2, out_dim=sa2),
            dict(feat1_dim=sa2, feat2_dim=sa3, d_model=sa2, out_dim=sa3),
        ]
        fps = [FeaturePropagationSA(dtype=self.dtype, name=f"fp_{i}", **spec)
               for i, spec in enumerate(fp_specs)]

        l_feats[0] = xyz
        for i in (2, 1, 0):
            l_feats[i] = fps[i](l_xyz[i], l_xyz[i + 1], l_feats[i], l_feats[i + 1])

        out = nn.Dense(self.conv_out, dtype=self.dtype, name="cov_final")(l_feats[0])
        return l_xyz[0], out
