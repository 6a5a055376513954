"""End-to-end checkpoint parity: torch flagship replica -> converter -> ReIDNet.

Builds a small-width torch model with the reference's exact module/attribute
structure (state-dict names match released checkpoints by construction,
SURVEY.md §3.4), runs its forward in eval mode, converts its state dict, and
checks our jitted ReIDNet produces the same match logits. This covers the glue
the per-block tests can't: RANDOM (first-n) sampling, argsort-kNN grouping,
edge-feature layout, max-over-k, FP chaining, xcorr_eff symmetry, point-cat
combine, and both-pooling.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from point_cloud_reid_tpu.convert import convert_reidnet_state_dict  # noqa: E402
from point_cloud_reid_tpu.models import build_model  # noqa: E402
from tests.test_convert import (TorchCrossAttention, TorchLinearRes,  # noqa: E402
                                TorchSelfAttention)

# ---- torch-side geometry (mirrors reference pointnet2_utils semantics) -------


def _t_index_points(points, idx):
    B = points.shape[0]
    out = torch.stack([points[b][idx[b]] for b in range(B)])
    return out


def _t_knn(nsample, xyz, new_xyz):
    d = torch.cdist(new_xyz, xyz) ** 2
    return torch.argsort(d, dim=-1, stable=True)[..., :nsample]


def _t_sample_group_edge(nsample, xyz, points, numpoints):
    B, N, C = xyz.shape
    fps_idx = torch.arange(numpoints).expand(B, numpoints)   # RANDOM = first-n
    new_xyz = _t_index_points(xyz, fps_idx)
    idx = _t_knn(nsample, xyz, new_xyz)
    grouped_xyz = _t_index_points(xyz, idx)
    grouped_norm = grouped_xyz - new_xyz.view(B, numpoints, 1, C)
    if points is not None:
        center = _t_index_points(points, fps_idx)
        grouped = _t_index_points(points, idx)
        return new_xyz, torch.cat(
            [grouped_norm, center.unsqueeze(2).repeat(1, 1, nsample, 1),
             grouped - center.unsqueeze(2)], dim=-1)
    return new_xyz, grouped_norm


class TorchSA(tnn.Module):
    """PointNetSetAbstractionEdgeSA replica (channel-last in/out)."""

    def __init__(self, mlp, nsample):
        super().__init__()
        self.nsample = nsample
        self.mlp_convs = tnn.ModuleList()
        self.mlp_bns = tnn.ModuleList()
        last = mlp[0] + 3
        for out in mlp[1:]:
            self.mlp_convs.append(tnn.Conv2d(last, out, 1))
            self.mlp_bns.append(tnn.BatchNorm2d(out))
            last = out
        self.self_attention = TorchSelfAttention(last, 2)

    def forward(self, xyz, points, numpoints):
        new_xyz, new_points = _t_sample_group_edge(self.nsample, xyz, points,
                                                   numpoints)
        h = new_points.permute(0, 3, 1, 2)                   # (B, D, S, K)
        for conv, bn in zip(self.mlp_convs, self.mlp_bns):
            h = tnn.functional.relu(bn(conv(h)))
        h = torch.max(h, 3)[0]                               # (B, D, S)
        h = self.self_attention(h.permute(0, 2, 1), new_xyz)  # channel-last
        return new_xyz, h


class TorchFPSA(tnn.Module):
    """FP_SA replica (channel-last): q from fine (no pos), k from coarse
    (no pos), v from coarse+pos; no residual."""

    def __init__(self, feat1, feat2, d, out, nhead=2):
        super().__init__()
        self.nhead, self.dim = nhead, d // nhead
        self.pos_mlp2 = tnn.Sequential(tnn.Linear(3, d), tnn.ReLU(),
                                       tnn.Linear(d, feat2))
        self.q_proj = tnn.Linear(feat1, d, bias=False)
        self.k_proj = tnn.Linear(feat2, d, bias=False)
        self.v_proj = tnn.Linear(feat2, d, bias=False)
        from tests.test_convert import TorchLinearAttention
        self.attention = TorchLinearAttention()
        self.merge = tnn.Linear(d, d, bias=False)
        self.mlp = tnn.Sequential(tnn.Linear(feat1 + d, 2 * d, bias=False),
                                  tnn.ReLU(), tnn.Linear(2 * d, out, bias=False))
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(out)

    def forward(self, feat1, xyz1, feat2, xyz2):
        bs = feat1.size(0)
        feat2_pos = feat2 + self.pos_mlp2(xyz2)
        q = self.q_proj(feat1).view(bs, -1, self.nhead, self.dim)
        k = self.k_proj(feat2).view(bs, -1, self.nhead, self.dim)
        v = self.v_proj(feat2_pos).view(bs, -1, self.nhead, self.dim)
        msg = self.attention(q, k, v)
        msg = self.merge(msg.reshape(bs, -1, self.nhead * self.dim))
        msg = self.norm1(msg)
        msg = self.mlp(torch.cat([feat1, msg], dim=2))
        return self.norm2(msg)


class TorchFP(tnn.Module):
    def __init__(self, feat1, feat2, d, out):
        super().__init__()
        self.interpolation = TorchFPSA(feat1, feat2, d, out)

    def forward(self, xyz1, xyz2, p1, p2):
        return self.interpolation(p1, xyz1, p2, xyz2)


class TorchBackbone(tnn.Module):
    def __init__(self, mul=1, conv_out=16, nsample=(8, 8, 8)):
        super().__init__()
        sa1, sa2, sa3 = 32 * mul, 64 * mul, 128 * mul
        self.SA_modules = tnn.ModuleList([
            TorchSA([0, sa1, sa1, sa1], nsample[0]),
            TorchSA([sa2, sa2, sa2, sa2], nsample[1]),
            TorchSA([sa3, sa3, sa3, sa3], nsample[2]),
        ])
        self.FP_modules = tnn.ModuleList([
            TorchFP(3, sa2, sa2, sa1),
            TorchFP(sa1, sa3, sa2, sa2),
            TorchFP(sa2, sa3, sa2, sa3),
        ])
        self.cov_final = tnn.Conv1d(sa1, conv_out, 1)

    def forward(self, pts, numpoints):
        xyz = pts[..., :3]
        l_xyz, l_feats = [xyz], [None]
        for i, sa in enumerate(self.SA_modules):
            li_xyz, li_feats = sa(l_xyz[i], l_feats[i], numpoints[i])
            l_xyz.append(li_xyz)
            l_feats.append(li_feats)
        l_feats[0] = xyz
        for i in (2, 1, 0):
            l_feats[i] = self.FP_modules[i](l_xyz[i], l_xyz[i + 1],
                                            l_feats[i], l_feats[i + 1])
        h = self.cov_final(l_feats[0].permute(0, 2, 1)).permute(0, 2, 1)
        return l_xyz[0], h


class TorchReIDNet(tnn.Module):
    def __init__(self, conv_out=16, nsample=(8, 8, 8)):
        super().__init__()
        self.backbone = TorchBackbone(mul=1, conv_out=conv_out, nsample=nsample)
        self.cross_stage1 = TorchCrossAttention(conv_out)
        self.cross_stage2 = TorchCrossAttention(conv_out)
        self.match_head = tnn.Sequential(TorchLinearRes(2 * conv_out, ng=8),
                                         tnn.Linear(2 * conv_out, 1))

    def forward(self, s1, s2, numpoints):
        b = s1.size(0)
        xyz, h = self.backbone(torch.cat([s1, s2], 0), numpoints)
        xyz1, xyz2, h1, h2 = xyz[:b], xyz[b:], h[:b], h[b:]
        o1a = self.cross_stage1(h1, xyz1, h2, xyz2)
        o2a = self.cross_stage1(h2, xyz2, h1, xyz1)
        o1b = self.cross_stage2(o1a, xyz1, o2a, xyz2)
        o2b = self.cross_stage2(o2a, xyz2, o1a, xyz1)
        cat = torch.cat([o1b, o2b], dim=1)                  # point-cat
        cf = cat.permute(0, 2, 1)                           # (B, C, 2N)
        pooled = torch.cat([tnn.functional.adaptive_max_pool1d(cf, 1)[:, :, 0],
                            tnn.functional.adaptive_avg_pool1d(cf, 1)[:, :, 0]],
                           dim=1)
        return self.match_head(pooled)[:, 0]


def test_full_model_golden_parity():
    torch.manual_seed(7)
    conv_out, B, N = 16, 2, 32
    backbone_list = [16, 8, 4]
    tmod = TorchReIDNet(conv_out=conv_out).eval()

    rs = np.random.RandomState(11)
    s1 = rs.randn(B, N, 3).astype(np.float32)
    s2 = rs.randn(B, N, 3).astype(np.float32)

    mcfg = dict(
        type="ReIDNet",
        backbone=dict(type="Pointnet_Backbone", input_channels=0, use_xyz=True,
                      conv_out=conv_out, mul=1, nsample=[8, 8, 8]),
        match_head=[dict(type="LinearRes", n_in=2 * conv_out,
                         n_out=2 * conv_out, norm="GN", ng=8),
                    dict(type="Linear", out_features=1)],
        cross_stage1=dict(type="corss_attention", d_model=conv_out, nhead=2,
                          attention="linear"),
        cross_stage2=dict(type="corss_attention", d_model=conv_out, nhead=2,
                          attention="linear"),
        match_type="xcorr_eff", pool_type="both", combine="point-cat",
        backbone_list=backbone_list, output_sequence_size=conv_out,
        hidden_size=2 * conv_out,
    )
    model = build_model(mcfg)
    batch = dict(sparse_1=jnp.asarray(s1), sparse_2=jnp.asarray(s2),
                 id_1=jnp.zeros((B,), jnp.int32), id_2=jnp.zeros((B,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    variables, report = convert_reidnet_state_dict(sd, variables, strict=True)

    with torch.no_grad():
        ref = tmod(torch.from_numpy(s1), torch.from_numpy(s2),
                   backbone_list).numpy()
    out = model.apply(variables, batch, train=False)
    got = np.asarray(out["match_logits"])
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)
