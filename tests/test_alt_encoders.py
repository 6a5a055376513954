"""Golden parity for the alternative encoders against the ACTUAL reference
modules under mmdet3d/models/trackers/deprecated/: vn_layers.py +
vn_dgcnn_cls.py (vector-neuron DGCNN), loftr.py (local feature transformer),
node_pooling.py (gated graph readouts).

All three are dead code in the reference (every import commented out,
trackers/__init__.py:1-26); here they are live, registered modules — these
tests prove the rebuild matches the originals' numerics exactly.

Import shims, mirroring the reference's own bugs:
- dgcnn_utils.py hardcodes torch.device('cuda') -> CPU-pinning torch proxy.
- loftr.py does `from .attention import ...` but trackers/deprecated contains
  NO attention.py (unresolvable even in the reference) -> alias the main
  mmdet3d/models/attention.py into the synthetic package.
- node_pooling.py needs torch_scatter (not installed) -> minimal index_add shim.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from point_cloud_reid_tpu.models.loftr import LocalFeatureTransformer  # noqa: E402
from point_cloud_reid_tpu.models.node_pooling import (  # noqa: E402
    EdgeGatedPooling, GatedPooling)
from point_cloud_reid_tpu.models.vector_neurons import (  # noqa: E402
    VNDGCNNBackbone)

_DEP = "/root/reference/mmdet3d/models/trackers/deprecated"
_MODELS = "/root/reference/mmdet3d/models"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_DEP), reason="reference checkout not available")


class _CPUTorch:
    def __getattr__(self, name):
        return getattr(torch, name)

    @staticmethod
    def device(*args, **kwargs):
        return torch.device("cpu")


def _torch_scatter_shim():
    mod = types.ModuleType("torch_scatter")

    def scatter(src, index, dim=0, dim_size=None, reduce="sum"):
        assert dim == 0 and reduce in ("sum", "add")
        n = int(dim_size) if dim_size is not None else int(index.max()) + 1
        out = src.new_zeros((n,) + src.shape[1:])
        return out.index_add(0, index, src)

    mod.scatter = scatter
    return mod


_cache = {}


def _dep(name):
    """Import a trackers/deprecated module by path under a synthetic package."""
    if name in _cache:
        return _cache[name]
    pkg = "_refdep"
    if pkg not in sys.modules:
        p = types.ModuleType(pkg)
        p.__path__ = [_DEP]
        sys.modules[pkg] = p
    if "torch_scatter" not in sys.modules:
        sys.modules["torch_scatter"] = _torch_scatter_shim()
    # loftr's `.attention` has no file in deprecated/ — alias the main one
    if name == "loftr" and f"{pkg}.attention" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            f"{pkg}.attention", os.path.join(_MODELS, "attention.py"))
        att = importlib.util.module_from_spec(spec)
        sys.modules[f"{pkg}.attention"] = att
        spec.loader.exec_module(att)
        att.torch = _CPUTorch()
    deps = {"vn_dgcnn_cls": ["vn_layers", "dgcnn_utils"]}
    for d in deps.get(name, []):
        _dep(d)
    spec = importlib.util.spec_from_file_location(
        f"{pkg}.{name}", os.path.join(_DEP, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"{pkg}.{name}"] = mod
    spec.loader.exec_module(mod)
    if name == "dgcnn_utils":
        mod.torch = _CPUTorch()
    _cache[name] = mod
    return mod


def _randomize(mod, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.uniform_(-0.3, 0.3, generator=g)
        for bname, b in mod.named_buffers():
            if bname.endswith("running_mean"):
                b.uniform_(-0.2, 0.2, generator=g)
            elif bname.endswith("running_var"):
                b.uniform_(0.5, 1.5, generator=g)
    mod.eval()
    return mod


def _w(sd, key):
    return np.asarray(sd[key].detach().numpy())


# ------------------------------------------------------------------ VN ----

def _vn_block_params(sd, prefix):
    out = {"map_to_feat": {"kernel": _w(sd, f"{prefix}.map_to_feat.weight").T},
           "map_to_dir": {"kernel": _w(sd, f"{prefix}.map_to_dir.weight").T},
           "batchnorm": {"bn": {"scale": _w(sd, f"{prefix}.batchnorm.bn.weight"),
                                "bias": _w(sd, f"{prefix}.batchnorm.bn.bias")}}}
    stats = {"batchnorm": {"bn": {"mean": _w(sd, f"{prefix}.batchnorm.bn.running_mean"),
                                  "var": _w(sd, f"{prefix}.batchnorm.bn.running_var")}}}
    return out, stats


def _vn_dgcnn_variables(sd):
    params, stats = {}, {}
    for conv in ("conv1", "conv2", "conv3", "conv4", "conv5"):
        p, s = _vn_block_params(sd, conv)
        params[conv] = p
        stats[conv] = s
    for pool in ("pool1", "pool2", "pool3", "pool4"):
        if f"{pool}.map_to_dir.weight" in sd:
            params[pool] = {"map_to_dir": {
                "kernel": _w(sd, f"{pool}.map_to_dir.weight").T}}
    std = {}
    std_stats = {}
    for vn in ("vn1", "vn2"):
        p, s = _vn_block_params(sd, f"std_feature.{vn}")
        std[vn] = p
        std_stats[vn] = s
    std["vn_lin"] = {"kernel": _w(sd, "std_feature.vn_lin.weight").T}
    params["std_feature"] = std
    stats["std_feature"] = std_stats
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("pooling", ["max", "mean"])
def test_ref_vn_dgcnn_golden(pooling):
    """vn_dgcnn_cls.VNDGCNN forward (x (B,3,N)) vs VNDGCNNBackbone (B,N,3)."""
    m = _dep("vn_dgcnn_cls")
    B, N, k = 2, 24, 6
    tmod = _randomize(m.VNDGCNN({"n_knn": k, "pooling": pooling}), 21)
    rs = np.random.RandomState(3)
    pts = rs.randn(B, N, 3).astype(np.float32)
    with torch.no_grad():
        _, tfeat = tmod(torch.from_numpy(np.transpose(pts, (0, 2, 1))), None)
    fmod = VNDGCNNBackbone(n_knn=k, pooling=pooling)
    variables = _vn_dgcnn_variables(tmod.state_dict())
    _, jfeat = fmod.apply(variables, jnp.asarray(pts), train=False)
    np.testing.assert_allclose(np.asarray(jfeat),
                               np.transpose(tfeat.numpy(), (0, 2, 1)),
                               rtol=2e-4, atol=2e-4)


def test_ref_vn_layers_shapes_and_equivariance():
    """VN features rotate with the input: f(xR) == f(x)R per vector channel
    (the property the layer family exists for; BN-on-norm and the directional
    LeakyReLU are rotation-invariant gates)."""
    fmod = VNDGCNNBackbone(n_knn=6, pooling="mean")
    rs = np.random.RandomState(0)
    pts = rs.randn(1, 20, 3).astype(np.float32)
    import jax
    variables = fmod.init(jax.random.PRNGKey(0), jnp.asarray(pts), train=False)
    # rotation about z by 40 degrees
    a = np.deg2rad(40.0)
    R = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
                  [0, 0, 1]], dtype=np.float32)
    _, f1 = fmod.apply(variables, jnp.asarray(pts), train=False)
    _, f2 = fmod.apply(variables, jnp.asarray(pts @ R.T), train=False)
    # std_feature output is rotation-INVARIANT
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=5e-3, atol=5e-3)


# --------------------------------------------------------------- LoFTR ----

def _loftr_variables(sd, n_layers):
    params = {}
    for i in range(n_layers):
        lp = {}
        for lin in ("q_proj", "k_proj", "v_proj", "merge"):
            lp[lin] = {"kernel": _w(sd, f"layers.{i}.{lin}.weight").T}
        lp["mlp_0"] = {"kernel": _w(sd, f"layers.{i}.mlp.0.weight").T}
        lp["mlp_2"] = {"kernel": _w(sd, f"layers.{i}.mlp.2.weight").T}
        for norm in ("norm1", "norm2"):
            lp[norm] = {"scale": _w(sd, f"layers.{i}.{norm}.weight"),
                        "bias": _w(sd, f"layers.{i}.{norm}.bias")}
        params[f"layers_{i}"] = lp
    return {"params": params}


@pytest.mark.parametrize("attention", ["full", "linear"])
def test_ref_loftr_golden(attention):
    """loftr.LocalFeatureTransformer vs flax rebuild, masked, both attentions."""
    m = _dep("loftr")
    d, B, L, S = 32, 2, 12, 10
    names = ["self", "cross"]
    tmod = _randomize(
        m.LocalFeatureTransformer(d, nhead=4, layer_names=names,
                                  attention=attention), 7)
    rs = np.random.RandomState(5)
    f0 = rs.randn(B, L, d).astype(np.float32)
    f1 = rs.randn(B, S, d).astype(np.float32)
    m0 = np.ones((B, L), dtype=bool)
    m1 = np.ones((B, S), dtype=bool)
    m0[:, -3:] = False
    m1[:, -2:] = False
    with torch.no_grad():
        t0, t1 = tmod(torch.from_numpy(f0), torch.from_numpy(f1),
                      torch.from_numpy(m0), torch.from_numpy(m1))
    fmod = LocalFeatureTransformer(d_model=d, nhead=4, layer_names=tuple(names),
                                   attention=attention)
    variables = _loftr_variables(tmod.state_dict(), len(names))
    j0, j1 = fmod.apply(variables, jnp.asarray(f0), jnp.asarray(f1),
                        jnp.asarray(m0), jnp.asarray(m1))
    np.testing.assert_allclose(np.asarray(j0), t0.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j1), t1.numpy(), rtol=1e-4, atol=1e-5)


def test_loftr_stage_builds_from_registry():
    from point_cloud_reid_tpu.models import build_stage
    import jax
    stage = build_stage({"type": "loftr", "d_model": 16, "nhead": 2,
                         "attention": "linear", "n_layers": 1})
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 8, 16).astype(np.float32))
    src = jnp.asarray(rs.randn(2, 6, 16).astype(np.float32))
    xyz = jnp.zeros((2, 8, 3))
    v = stage.init(jax.random.PRNGKey(0), x, xyz, src, None)
    out = stage.apply(v, x, xyz, src, None)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


# ------------------------------------------------------- node pooling ----

def test_ref_gated_pooling_golden():
    m = _dep("node_pooling")
    nd, pd, Nn, G = 12, 8, 20, 4
    tmod = _randomize(m.GatedPooling(nd, pd), 11)
    rs = np.random.RandomState(9)
    feats = rs.randn(Nn, nd).astype(np.float32)
    batch = np.sort(rs.randint(0, G, size=Nn)).astype(np.int64)
    with torch.no_grad():
        tout = tmod(torch.from_numpy(feats), torch.from_numpy(batch))
    sd = tmod.state_dict()
    variables = {"params": {
        "hgate_node_0": {"kernel": _w(sd, "hgate_node.0.weight").T,
                         "bias": _w(sd, "hgate_node.0.bias")},
        "poolingLayer_0": {"kernel": _w(sd, "poolingLayer.0.weight").T,
                           "bias": _w(sd, "poolingLayer.0.bias")}}}
    fmod = GatedPooling(node_dim=nd, pooling_dim=pd)
    jout = fmod.apply(variables, jnp.asarray(feats),
                      jnp.asarray(batch.astype(np.int32)), G)
    np.testing.assert_allclose(np.asarray(jout)[:tout.shape[0]], tout.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_ref_edge_gated_pooling_golden():
    m = _dep("node_pooling")
    nd, ed, pd, Nn, Ne, G = 10, 6, 8, 18, 30, 5
    tmod = _randomize(m.EdgeGatedPooling(nd, ed, pd), 13)
    rs = np.random.RandomState(4)
    nf = rs.randn(Nn, nd).astype(np.float32)
    ef = rs.randn(Ne, ed).astype(np.float32)
    # every graph id present among nodes (torch scatter sizes node_pool by max id)
    nb = np.sort(np.concatenate([np.arange(G), rs.randint(0, G, Nn - G)]))
    eb = np.sort(rs.randint(0, G, size=Ne))
    with torch.no_grad():
        tout = tmod(torch.from_numpy(nf), torch.from_numpy(ef),
                    torch.from_numpy(nb.astype(np.int64)),
                    torch.from_numpy(eb.astype(np.int64)))
    sd = tmod.state_dict()
    variables = {"params": {
        "hgate_node_0": {"kernel": _w(sd, "hgate_node.0.weight").T,
                         "bias": _w(sd, "hgate_node.0.bias")},
        "hgate_edge_0": {"kernel": _w(sd, "hgate_edge.0.weight").T,
                         "bias": _w(sd, "hgate_edge.0.bias")},
        "poolingLayer_0": {"kernel": _w(sd, "poolingLayer.0.weight").T,
                           "bias": _w(sd, "poolingLayer.0.bias")}}}
    fmod = EdgeGatedPooling(node_dim=nd, edge_dim=ed, pooling_dim=pd)
    jout = fmod.apply(variables, jnp.asarray(nf), jnp.asarray(ef),
                      jnp.asarray(nb.astype(np.int32)),
                      jnp.asarray(eb.astype(np.int32)), G)
    np.testing.assert_allclose(np.asarray(jout), tout.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_vn_dgcnn_builds_from_registry():
    from point_cloud_reid_tpu.models import build_backbone
    import jax
    bb = build_backbone({"type": "vn_dgcnn", "n_knn": 6})
    pts = jnp.asarray(np.random.RandomState(2).randn(2, 16, 3).astype(np.float32))
    v = bb.init(jax.random.PRNGKey(0), pts, train=False)
    xyz, feats = bb.apply(v, pts, train=False)
    assert feats.shape == (2, 16, (1024 // 3) * 2 * 3)
