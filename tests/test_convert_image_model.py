"""End-to-end ImageReIDNet checkpoint conversion: HF DeiT backbone + match
stages/heads with reference state-dict names -> convert_image_reidnet_state_dict
-> identical match logits."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from point_cloud_reid_tpu.convert.torch_checkpoint import (  # noqa: E402
    convert_image_reidnet_state_dict)
from point_cloud_reid_tpu.models import build_model  # noqa: E402
from tests.test_convert import TorchLinearAttention, TorchLinearRes  # noqa: E402
from tests.test_convert_vit import _tiny_deit_config  # noqa: E402


class TorchCrossLinAttn(tnn.Module):
    """cross_lin_attn replica (attention.py:312-370): no-xyz cross attention;
    the constructed pos_mlp is dead in forward (converter must skip it)."""

    def __init__(self, d, nhead=2):
        super().__init__()
        self.nhead, self.dim = nhead, d // nhead
        self.pos_mlp = tnn.Sequential(tnn.Linear(3, d), tnn.ReLU(),
                                      tnn.Linear(d, d))   # dead params
        self.q_proj = tnn.Linear(d, d, bias=False)
        self.k_proj = tnn.Linear(d, d, bias=False)
        self.v_proj = tnn.Linear(d, d, bias=False)
        self.attention = TorchLinearAttention()
        self.merge = tnn.Linear(d, d, bias=False)
        self.mlp = tnn.Sequential(tnn.Linear(2 * d, 2 * d, bias=False),
                                  tnn.ReLU(), tnn.Linear(2 * d, d, bias=False))
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(d)

    def forward(self, search, template):
        bs = search.size(0)
        q = self.q_proj(search).view(bs, -1, self.nhead, self.dim)
        k = self.k_proj(template).view(bs, -1, self.nhead, self.dim)
        v = self.v_proj(template).view(bs, -1, self.nhead, self.dim)
        msg = self.attention(q, k, v)
        msg = self.merge(msg.reshape(bs, -1, self.nhead * self.dim))
        msg = self.norm1(msg)
        msg = self.mlp(torch.cat([search, msg], dim=2))
        msg = self.norm2(msg)
        return search + msg


class TorchImageReIDNet(tnn.Module):
    """ImageReIDNet replica (ReIDNet.py:838-1308): DeiT tap at
    hidden_states[-1], per-token downsample, symmetric cross_lin_attn stages,
    point-cat + both pooling, LinearRes match head."""

    def __init__(self, hf_backbone, dim=32, ds=16):
        super().__init__()
        self.backbone = hf_backbone
        self.cross_stage1 = TorchCrossLinAttn(ds)
        self.cross_stage2 = TorchCrossLinAttn(ds)
        self.downsample = tnn.Sequential(
            TorchLinearRes(dim, ng=8), tnn.Linear(dim, ds))
        self.match_head = tnn.Sequential(TorchLinearRes(2 * ds, ng=8),
                                         tnn.Linear(2 * ds, 1))

    def forward(self, im1, im2):
        b = im1.size(0)
        toks = self.backbone(torch.cat([im1, im2], 0),
                             output_hidden_states=True).hidden_states[-1]
        b2, s, c = toks.shape
        hd = self.downsample(toks.reshape(-1, c)).reshape(b2, s, -1)
        h1, h2 = hd[:b], hd[b:]
        o1a = self.cross_stage1(h1, h2)
        o2a = self.cross_stage1(h2, h1)
        o1b = self.cross_stage2(o1a, o2a)
        o2b = self.cross_stage2(o2a, o1a)
        cat = torch.cat([o1b, o2b], dim=1).permute(0, 2, 1)
        pooled = torch.cat(
            [tnn.functional.adaptive_max_pool1d(cat, 1)[:, :, 0],
             tnn.functional.adaptive_avg_pool1d(cat, 1)[:, :, 0]], dim=1)
        return self.match_head(pooled)[:, 0]


def test_image_model_golden_parity():
    from transformers import DeiTModel
    torch.manual_seed(0)
    hf = DeiTModel(_tiny_deit_config(image_size=32))
    tmod = TorchImageReIDNet(hf, dim=32, ds=16).eval()

    mcfg = dict(
        type="ImageReIDNet", backbone="deit-tiny",
        dim=32, downsample_dim=16, image_size=32,
        combine="point-cat", match_type="xcorr_eff", pool_type="both",
        downsample=[dict(type="LinearRes", n_in=32, n_out=32, norm="GN",
                         ng=8),
                    dict(type="Linear", out_features=16)],
        cross_lin_attn=dict(type="cross_lin_attn", d_model=16, nhead=2),
        match_head=[dict(type="LinearRes", n_in=32, n_out=32, norm="GN",
                         ng=8),
                    dict(type="Linear", out_features=1)],
        output_sequence_size=6,
    )
    # shrink the flax ViT to the tiny HF config dims
    import point_cloud_reid_tpu.models.vit as V
    V.VIT_PRESETS["deit-tiny-test"] = dict(dim=32, depth=2, heads=2,
                                           dist_token=True, final_norm=False,
                                           mlp_ratio=2.0)
    mcfg["backbone"] = "deit-tiny-test"
    model = build_model(mcfg)

    B = 2
    rs = np.random.RandomState(0)
    im1 = rs.randn(B, 3, 32, 32).astype(np.float32)
    im2 = rs.randn(B, 3, 32, 32).astype(np.float32)
    batch = dict(sparse_1=jnp.asarray(im1), sparse_2=jnp.asarray(im2),
                 id_1=jnp.zeros((B,), jnp.int32),
                 id_2=jnp.zeros((B,), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    variables, report = convert_image_reidnet_state_dict(sd, variables,
                                                         strict=True)

    with torch.no_grad():
        ref = tmod(torch.from_numpy(im1), torch.from_numpy(im2)).numpy()
    out = model.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(out["match_logits"]), ref,
                               rtol=2e-3, atol=2e-3)
