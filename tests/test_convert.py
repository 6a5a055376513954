"""Torch-checkpoint converter: name-map coverage + numerical parity.

The torch modules here are small replicas assembled from torch.nn primitives
following the architecture documented in SURVEY.md §3.4 (Self_Attention,
corss_attention, LinearRes, Conv-BN blocks). Their state-dict key names match
the reference convention by construction (same attribute names), so they
exercise the converter exactly as a released checkpoint would.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import flax.linen as fnn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from point_cloud_reid_tpu.convert import convert_reidnet_state_dict  # noqa: E402
from point_cloud_reid_tpu.models.attention_blocks import (  # noqa: E402
    CrossAttentionBlock, SelfAttentionBlock)
from point_cloud_reid_tpu.models.layers import ConvBNReLU, LinearRes  # noqa: E402


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


class TorchLinearAttention(tnn.Module):
    def forward(self, q, k, v):
        Q = tnn.functional.elu(q) + 1.0
        K = tnn.functional.elu(k) + 1.0
        v_length = v.size(1)
        v = v / v_length
        KV = torch.einsum("nshd,nshv->nhdv", K, v)
        Z = 1.0 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(dim=1)) + 1e-6)
        return torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_length


class TorchSelfAttention(tnn.Module):
    """Replica of the reference Self_Attention block (pointnet2_utils.py:55-114)."""

    def __init__(self, d, nhead=2):
        super().__init__()
        self.nhead, self.dim = nhead, d // nhead
        self.pos_mlp = tnn.Sequential(tnn.Linear(3, d), tnn.ReLU(),
                                      tnn.Linear(d, d))
        self.q_proj = tnn.Linear(d, d, bias=False)
        self.k_proj = tnn.Linear(d, d, bias=False)
        self.v_proj = tnn.Linear(d, d, bias=False)
        self.attention = TorchLinearAttention()
        self.merge = tnn.Linear(d, d, bias=False)
        self.mlp = tnn.Sequential(tnn.Linear(2 * d, 2 * d, bias=False),
                                  tnn.ReLU(), tnn.Linear(2 * d, d, bias=False))
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(d)

    def forward(self, feat, xyz):  # feat (B,N,C) channel-last here
        bs = feat.size(0)
        feat_pos = feat + self.pos_mlp(xyz)
        q = self.q_proj(feat_pos).view(bs, -1, self.nhead, self.dim)
        k = self.k_proj(feat_pos).view(bs, -1, self.nhead, self.dim)
        v = self.v_proj(feat_pos).view(bs, -1, self.nhead, self.dim)
        msg = self.attention(q, k, v)
        msg = self.merge(msg.reshape(bs, -1, self.nhead * self.dim))
        msg = self.norm1(msg)
        msg = self.mlp(torch.cat([feat, msg], dim=2))
        msg = self.norm2(msg)
        return feat + msg


class TorchCrossAttention(tnn.Module):
    """Replica of corss_attention [sic] (attention.py:157-219): pos enters via
    template VALUES only."""

    def __init__(self, d, nhead=2):
        super().__init__()
        self.nhead, self.dim = nhead, d // nhead
        self.pos_mlp = tnn.Sequential(tnn.Linear(3, d), tnn.ReLU(),
                                      tnn.Linear(d, d))
        self.q_proj = tnn.Linear(d, d, bias=False)
        self.k_proj = tnn.Linear(d, d, bias=False)
        self.v_proj = tnn.Linear(d, d, bias=False)
        self.attention = TorchLinearAttention()
        self.merge = tnn.Linear(d, d, bias=False)
        self.mlp = tnn.Sequential(tnn.Linear(2 * d, 2 * d, bias=False),
                                  tnn.ReLU(), tnn.Linear(2 * d, d, bias=False))
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(d)

    def forward(self, search, sxyz, template, txyz):
        bs = search.size(0)
        tpos = template + self.pos_mlp(txyz)
        q = self.q_proj(search).view(bs, -1, self.nhead, self.dim)
        k = self.k_proj(template).view(bs, -1, self.nhead, self.dim)
        v = self.v_proj(tpos).view(bs, -1, self.nhead, self.dim)
        msg = self.attention(q, k, v)
        msg = self.merge(msg.reshape(bs, -1, self.nhead * self.dim))
        msg = self.norm1(msg)
        msg = self.mlp(torch.cat([search, msg], dim=2))
        msg = self.norm2(msg)
        return search + msg


class TorchLinearRes(tnn.Module):
    """Replica of LinearRes (lanegcn_nets.py:193-241), GN branch, n_in==n_out."""

    def __init__(self, n, ng=8):
        super().__init__()
        from math import gcd
        self.linear1 = tnn.Linear(n, n, bias=False)
        self.linear2 = tnn.Linear(n, n, bias=False)
        self.relu = tnn.ReLU()
        self.norm1 = tnn.GroupNorm(gcd(ng, n), n)
        self.norm2 = tnn.GroupNorm(gcd(ng, n), n)

    def forward(self, x):
        out = self.relu(self.norm1(self.linear1(x)))
        out = self.norm2(self.linear2(out))
        return self.relu(out + x)


def _convert(tmod, flax_variables):
    new_vars, report = convert_reidnet_state_dict(_sd(tmod), flax_variables,
                                                  strict=True)
    assert not report["unmatched_torch"] and not report["unfilled_flax"]
    return new_vars


def test_self_attention_parity():
    torch.manual_seed(0)
    d, B, N = 16, 2, 24
    tmod = TorchSelfAttention(d).eval()
    feat = np.random.RandomState(0).randn(B, N, d).astype(np.float32)
    xyz = np.random.RandomState(1).randn(B, N, 3).astype(np.float32)

    fmod = SelfAttentionBlock(d_model=d, nhead=2)
    variables = fmod.init(jax.random.PRNGKey(0), jnp.asarray(feat),
                          jnp.asarray(xyz))
    variables = _convert(tmod, variables)

    with torch.no_grad():
        ref = tmod(torch.from_numpy(feat), torch.from_numpy(xyz)).numpy()
    got = np.asarray(fmod.apply(variables, jnp.asarray(feat), jnp.asarray(xyz)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_cross_attention_parity():
    torch.manual_seed(1)
    d, B, N, M = 16, 2, 12, 20
    tmod = TorchCrossAttention(d).eval()
    rs = np.random.RandomState(2)
    s, sx = rs.randn(B, N, d).astype(np.float32), rs.randn(B, N, 3).astype(np.float32)
    t, tx = rs.randn(B, M, d).astype(np.float32), rs.randn(B, M, 3).astype(np.float32)

    fmod = CrossAttentionBlock(d_model=d, nhead=2)
    variables = fmod.init(jax.random.PRNGKey(0), jnp.asarray(s), jnp.asarray(sx),
                          jnp.asarray(t), jnp.asarray(tx))
    variables = _convert(tmod, variables)

    with torch.no_grad():
        ref = tmod(*map(torch.from_numpy, (s, sx, t, tx))).numpy()
    got = np.asarray(fmod.apply(variables, *map(jnp.asarray, (s, sx, t, tx))))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_linear_res_parity():
    torch.manual_seed(2)
    n, B = 32, 6
    tmod = TorchLinearRes(n).eval()
    x = np.random.RandomState(3).randn(B, n).astype(np.float32)

    fmod = LinearRes(n_in=n, n_out=n, norm="GN", ng=8)
    variables = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = _convert(tmod, variables)

    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()
    got = np.asarray(fmod.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_conv_bn_parity():
    """torch Conv2d(1x1)+BatchNorm2d eval over (B,C,S,K) == our channel-last
    Dense+BN with converted running stats."""
    torch.manual_seed(3)
    cin, cout, B, S, K = 7, 13, 2, 10, 4

    class TorchConvBN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.mlp_convs = tnn.ModuleList([tnn.Conv2d(cin, cout, 1)])
            self.mlp_bns = tnn.ModuleList([tnn.BatchNorm2d(cout)])

        def forward(self, x):
            return tnn.functional.relu(self.mlp_bns[0](self.mlp_convs[0](x)))

    tmod = TorchConvBN()
    # give running stats non-trivial values
    tmod.mlp_bns[0].running_mean.normal_(0.0, 0.5)
    tmod.mlp_bns[0].running_var.uniform_(0.5, 2.0)
    tmod.eval()

    x = np.random.RandomState(4).randn(B, S, K, cin).astype(np.float32)

    class Wrap(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            return ConvBNReLU(cout, name="mlp_0")(x, train=train)

    fmod = Wrap()
    variables = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = _convert(tmod, variables)

    with torch.no_grad():
        ref = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(fmod.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


class TorchLocalSelfAttention(tnn.Module):
    """local_self_attention replica (attention.py:221-296): per-point
    feature-space kNN neighborhood attention, channel-last here."""

    def __init__(self, d, nhead=2, knum=4, pos_size=None):
        super().__init__()
        pos_size = pos_size or d
        self.nhead, self.dim, self.knum = nhead, d // nhead, knum
        self.d_model = d
        self.pos_mlp_knn = tnn.Sequential(tnn.Linear(3, pos_size), tnn.ReLU(),
                                          tnn.Linear(pos_size, pos_size))
        self.q_proj_knn = tnn.Linear(d, d, bias=False)
        self.k_proj_knn = tnn.Linear(d, d, bias=False)
        self.v_proj_knn = tnn.Linear(d, d, bias=False)
        self.attention_knn = TorchLinearAttention()
        self.merge_knn = tnn.Linear(d, d, bias=False)
        self.mlp_knn = tnn.Sequential(tnn.Linear(2 * d, 2 * d, bias=False),
                                      tnn.ReLU(),
                                      tnn.Linear(2 * d, d, bias=False))
        self.norm1_knn = tnn.LayerNorm(d)
        self.norm2_knn = tnn.LayerNorm(d)

    def forward(self, feat, xyz):               # feat (B,N,C), xyz (B,N,3)
        B, N, C = feat.shape
        k = self.knum
        d = torch.cdist(feat, feat) ** 2
        idx = (-d).topk(k=k, dim=-1)[1]          # feature-space knn
        base = torch.arange(B).view(-1, 1, 1) * N
        flat = (idx + base).view(-1)
        fea_knn = feat.reshape(B * N, C)[flat].view(B * N, k, C)
        xyz_knn = xyz.reshape(B * N, 3)[flat].view(B * N, k, 3)

        feat_flat = feat.reshape(B * N, 1, C)
        center_pos = feat_flat + self.pos_mlp_knn(xyz.reshape(B * N, 1, 3))
        neigh_pos = fea_knn + self.pos_mlp_knn(xyz_knn)

        q = self.q_proj_knn(center_pos).view(B * N, 1, self.nhead, self.dim)
        kk = self.k_proj_knn(neigh_pos).view(B * N, k, self.nhead, self.dim)
        vv = self.v_proj_knn(neigh_pos).view(B * N, k, self.nhead, self.dim)
        msg = self.attention_knn(q, kk, vv)
        msg = self.merge_knn(msg.reshape(B * N, 1, self.d_model))
        msg = self.norm1_knn(msg)
        msg = self.mlp_knn(torch.cat([feat_flat, msg], dim=2))
        msg = self.norm2_knn(msg)
        return (feat_flat + msg).view(B, N, self.d_model)


def test_local_self_attention_parity():
    from point_cloud_reid_tpu.models.attention_blocks import LocalSelfAttention

    torch.manual_seed(4)
    d, B, N, k = 16, 2, 12, 4
    tmod = TorchLocalSelfAttention(d, knum=k).eval()
    rs = np.random.RandomState(5)
    feat = rs.randn(B, N, d).astype(np.float32)
    xyz = rs.randn(B, N, 3).astype(np.float32)

    fmod = LocalSelfAttention(d_model=d, nhead=2, knum=k, pos_size=d)
    variables = fmod.init(jax.random.PRNGKey(0), jnp.asarray(feat),
                          jnp.asarray(xyz))
    variables = _convert(tmod, variables)

    with torch.no_grad():
        ref = tmod(torch.from_numpy(feat), torch.from_numpy(xyz)).numpy()
    got = np.asarray(fmod.apply(variables, jnp.asarray(feat),
                                jnp.asarray(xyz)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
