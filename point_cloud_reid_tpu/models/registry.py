"""Mini module registry: config dicts -> flax modules.

TPU-native equivalent of the reference's `module_obj` string registry +
`build_module`/`build_sequential` (mmdet3d/models/ReIDNet.py:40-96). Head configs are
lists of dicts like [{'type': 'LinearRes', ...}, {'type': 'Linear', ...}] exactly as
in configs_reid reidentifier files.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from .attention_blocks import (
    CrossAttentionBlock,
    CrossLinAttn,
    LocalSelfAttention,
    SelfAttentionBlock,
)
from .dgcnn import DGCNNBackbone
from .layers import LinearRes, PostRes, Res1d
from .loftr import LoFTRStage
from .point_transformer import PointTransformerBackbone
from .pointnet import PointNetBackbone
from .vector_neurons import VNDGCNNBackbone

Spec = Dict[str, Any]


class SequentialHead(nn.Module):
    """Sequential stack built from config specs; threads `train` to BN layers.

    Supported types mirror the registry entries the reference's head configs use:
    LinearRes, Linear, Conv1d (real 1D conv, VALID padding), BatchNorm1d, GroupNorm,
    LayerNorm, ReLU, Sigmoid.
    """

    specs: Tuple[Spec, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        for i, spec in enumerate(self.specs):
            t = spec["type"]
            name = f"{i}_{t}"
            if t == "LinearRes":
                x = LinearRes(n_in=spec["n_in"], n_out=spec["n_out"],
                              norm=spec.get("norm", "GN"), ng=spec.get("ng", 32),
                              dtype=self.dtype, name=name)(x, train=train)
            elif t == "PostRes":
                x = PostRes(n_out=spec["n_out"], stride=spec.get("stride", 1),
                            norm=spec.get("norm", "GN"),
                            ng=spec.get("ng", 32), dtype=self.dtype,
                            name=name)(x, train=train)
            elif t == "Res1d":
                x = Res1d(n_out=spec["n_out"],
                          kernel_size=spec.get("kernel_size", 3),
                          stride=spec.get("stride", 1),
                          norm=spec.get("norm", "GN"),
                          ng=spec.get("ng", 32), dtype=self.dtype,
                          name=name)(x, train=train)
            elif t == "Linear":
                x = nn.Dense(spec["out_features"], dtype=self.dtype, name=name)(x)
            elif t == "Conv1d":
                # input (B, L, C); torch Conv1d default stride 1, padding 0
                x = nn.Conv(spec["out_channels"], (spec.get("kernel_size", 1),),
                            padding="VALID", dtype=self.dtype, name=name)(x)
            elif t == "BatchNorm1d":
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype, name=name)(x)
            elif t == "GroupNorm":
                x = nn.GroupNorm(num_groups=spec["num_groups"], epsilon=1e-5, dtype=self.dtype,
                                 name=name)(x)
            elif t == "LayerNorm":
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)(x)
            elif t == "ReLU":
                x = nn.relu(x)
            elif t == "Sigmoid":
                x = nn.sigmoid(x)
            else:
                raise NotImplementedError(f"SequentialHead type {t}")
        return x


def build_backbone(cfg: Spec, dtype=jnp.float32, knn_method: str = "argsort"):
    """Backbone factory (ReIDNet.py module_obj backbone entries)."""
    t = cfg["type"]
    if t in ("Pointnet_Backbone", "point_transformer"):
        return PointTransformerBackbone(
            input_channels=cfg.get("input_channels", 0),
            use_xyz=cfg.get("use_xyz", True),
            conv_out=cfg.get("conv_out", 32),
            mul=cfg.get("mul", 1),
            radius=tuple(cfg.get("radius", (0.3, 0.5, 0.7))),
            nsample=tuple(cfg.get("nsample", (32, 48, 48))),
            knn_method=knn_method,
            fused_train=cfg.get("fused_train", False),
            fused_train_vjp=cfg.get("fused_train_vjp", True),
            remat_stages=tuple(cfg.get("remat_stages", ())),
            pallas_inference=cfg.get("pallas_inference", False),
            pallas_interpret=cfg.get("pallas_interpret", False),
            dtype=dtype, name="backbone")
    if t in ("PointNet", "pointnet"):
        return PointNetBackbone(channel=6 if cfg.get("normal_channel", True) else 3,
                                dtype=dtype, name="backbone")
    if t in ("dgcnn", "DGCNN"):
        return DGCNNBackbone(emb_dims=cfg.get("emb_dims", 1024), k=cfg.get("k", 20),
                             dtype=dtype, name="backbone")
    if t in ("vn_dgcnn", "VNDGCNN"):
        # dead code in the reference (vn_dgcnn_cls.py, imports commented out);
        # live and reachable here
        return VNDGCNNBackbone(n_knn=cfg.get("n_knn", 20),
                               pooling=cfg.get("pooling", "max"),
                               dtype=dtype, name="backbone")
    raise NotImplementedError(f"backbone type {t}")


def build_stage(cfg: Optional[Spec], dtype=jnp.float32, name: str = "stage"):
    """Attention-stage factory (cross_stageN / local_stageN entries)."""
    if not cfg:
        return None
    t = cfg["type"]
    kw = dict(d_model=cfg["d_model"], nhead=cfg["nhead"],
              attention=cfg.get("attention", "linear"), dtype=dtype, name=name)
    if t == "corss_attention":
        return CrossAttentionBlock(**kw)
    if t == "cross_lin_attn":
        return CrossLinAttn(**kw)
    if t == "local_self_attention":
        return LocalSelfAttention(knum=cfg.get("knum", 32),
                                  pos_size=cfg.get("pos_size"), **kw)
    if t == "Self_Attention":
        return SelfAttentionBlock(**kw)
    if t == "loftr":
        # alternative LoFTR matching encoder (dead in the reference, live here)
        return LoFTRStage(d_model=cfg["d_model"], nhead=cfg["nhead"],
                          attention=cfg.get("attention", "linear"),
                          n_layers=cfg.get("n_layers", 2), dtype=dtype, name=name)
    raise NotImplementedError(f"stage type {t}")


def build_head(cfg: Union[None, Spec, List[Spec]], dtype=jnp.float32,
               name: str = "head"):
    """Head factory: None | single spec | list of specs -> module or None."""
    if not cfg:
        return None
    specs = cfg if isinstance(cfg, (list, tuple)) else [cfg]
    return SequentialHead(specs=tuple(dict(s) for s in specs), dtype=dtype, name=name)
