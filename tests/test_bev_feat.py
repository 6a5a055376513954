"""Golden parity for BEV feature sampling + Res1d against the ACTUAL reference
sources: trackers/deprecated/tracking_helpers.py (grid_sample-based BEV
interpolation used by BEVSupervisor) and lanegcn_nets.py (clamped bilinear
pixel features, rotated ROI features, Res1d residual block).

Import shims: lanegcn_nets.py does `from fractions import gcd` (removed in
py3.9) -> patched to math.gcd for the import; tracking_helpers imports
matplotlib only at module level (available).
"""
import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from point_cloud_reid_tpu.models.layers import Res1d  # noqa: E402
from point_cloud_reid_tpu.ops.bev_feat import (  # noqa: E402
    get_pixel_feat, get_roi_feat, grid_sample_bilinear, interpolate_bev,
    interpolate_bev_grid)

_DEP = "/root/reference/mmdet3d/models/trackers/deprecated"
_MODELS = "/root/reference/mmdet3d/models"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_MODELS), reason="reference checkout not available")

_cache = {}


def _load(path, name):
    if name in _cache:
        return _cache[name]
    import fractions
    had = hasattr(fractions, "gcd")
    if not had:
        fractions.gcd = math.gcd          # lanegcn_nets: `from fractions import gcd`
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    finally:
        if not had:
            del fractions.gcd
    _cache[name] = mod
    return mod


def _helpers():
    return _load(os.path.join(_DEP, "tracking_helpers.py"), "_ref_thelpers")


def _lanegcn():
    return _load(os.path.join(_MODELS, "lanegcn_nets.py"), "_ref_lanegcn")


PC_RANGE = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]


def test_grid_sample_bilinear_matches_torch():
    rs = np.random.RandomState(0)
    H, W, C = 9, 7, 4
    img = rs.randn(H, W, C).astype(np.float32)
    grid = rs.uniform(-1.4, 1.4, size=(5, 11, 2)).astype(np.float32)
    ours = grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid))
    timg = torch.from_numpy(np.transpose(img, (2, 0, 1)))[None]   # (1,C,H,W)
    tout = torch.nn.functional.grid_sample(
        timg, torch.from_numpy(grid)[None], mode="bilinear",
        padding_mode="zeros", align_corners=False)                # (1,C,5,11)
    np.testing.assert_allclose(np.asarray(ours),
                               np.transpose(tout[0].numpy(), (1, 2, 0)),
                               rtol=1e-5, atol=1e-6)


def test_interpolate_bev_golden():
    """vs tracking_helpers.interpolate_bev_2d:99-131 (the corrected variant;
    interpolateBEV's [0,W] normalization bug documented, not carried)."""
    m = _helpers()
    rs = np.random.RandomState(1)
    H, W, C = 16, 16, 6
    bev = rs.randn(C, H, W).astype(np.float32)
    xy = rs.uniform(-60, 60, size=(3, 10, 2)).astype(np.float32)
    with torch.no_grad():
        tout = m.interpolate_bev_2d(torch.from_numpy(bev),
                                    torch.from_numpy(xy), PC_RANGE, "cpu")
    ours = interpolate_bev(jnp.asarray(np.transpose(bev, (1, 2, 0))),
                           jnp.asarray(xy), PC_RANGE)
    np.testing.assert_allclose(np.asarray(ours), tout.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_interpolate_bev_grid_golden():
    """vs interpolate_bev_grid_2d:406-447. Two reference quirks handled here:
    its internal reshape only works for a SINGLE center (any (1, n>1, 2) input
    crashes on `.reshape(b, num_points**2, 2)`) and its final
    reshape(b, C, n, n) of a (b, n*n, C) tensor scrambles channels across
    positions — we take batched centers and return (N, n, n, C); the test
    undoes the reference reshape to compare the single-center case."""
    m = _helpers()
    rs = np.random.RandomState(2)
    H, W, C = 20, 20, 5
    n = 3
    bev = rs.randn(C, H, W).astype(np.float32)
    xy = rs.uniform(-40, 40, size=(1, 1, 2)).astype(np.float32)
    with torch.no_grad():
        tout = m.interpolate_bev_grid_2d(torch.from_numpy(bev),
                                         torch.from_numpy(xy), PC_RANGE, "cpu",
                                         spacing=2, num_points=n)
    flat_ref = tout.reshape(1, n * n, C).numpy()      # undo the scrambled view
    ours = interpolate_bev_grid(jnp.asarray(np.transpose(bev, (1, 2, 0))),
                                jnp.asarray(xy[0]), PC_RANGE,
                                spacing=2, num_points=n)
    np.testing.assert_allclose(np.asarray(ours).reshape(1, n * n, C), flat_ref,
                               rtol=1e-5, atol=1e-6)
    # ours is batched — the reference crashes for more than one center
    many = interpolate_bev_grid(jnp.asarray(np.transpose(bev, (1, 2, 0))),
                                jnp.asarray(rs.uniform(-40, 40, (6, 2))),
                                PC_RANGE, spacing=2, num_points=n)
    assert many.shape == (6, n, n, C)


def test_get_pixel_feat_golden():
    m = _lanegcn()
    rs = np.random.RandomState(3)
    H, W, C = 12, 18, 4
    fm = rs.randn(C, H, W).astype(np.float32)
    boxes = rs.uniform(-45, 45, size=(9, 2)).astype(np.float32)
    rng = (-51.2, 51.2, -51.2, 51.2)
    with torch.no_grad():
        tout = m.get_pixel_feat(torch.from_numpy(fm), torch.from_numpy(boxes),
                                rng)
    ours = get_pixel_feat(jnp.asarray(np.transpose(fm, (1, 2, 0))),
                          jnp.asarray(boxes), rng)
    np.testing.assert_allclose(np.asarray(ours), tout.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_get_roi_feat_golden():
    m = _lanegcn()
    rs = np.random.RandomState(4)
    H, W, C = 24, 24, 3
    fm = rs.randn(C, H, W).astype(np.float32)
    # cx, cy, wid, hgt, theta — some boxes partially out of range
    boxes = np.stack([rs.uniform(-48, 48, 7), rs.uniform(-48, 48, 7),
                      rs.uniform(4, 20, 7), rs.uniform(4, 20, 7),
                      rs.uniform(-np.pi, np.pi, 7)], axis=1).astype(np.float32)
    rng = (-51.2, 51.2, -51.2, 51.2)
    roi = 4
    with torch.no_grad():
        tout = m.get_roi_feat(torch.from_numpy(fm), torch.from_numpy(boxes),
                              roi, rng)                      # (N, C, rh, rw)
    ours = get_roi_feat(jnp.asarray(np.transpose(fm, (1, 2, 0))),
                        jnp.asarray(boxes), roi, rng)        # (N, rh, rw, C)
    np.testing.assert_allclose(np.asarray(jnp.transpose(ours, (0, 3, 1, 2))),
                               tout.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("norm,n_in,n_out,stride", [
    ("GN", 8, 8, 1), ("GN", 8, 16, 2), ("BN", 6, 12, 1)])
def test_res1d_golden(norm, n_in, n_out, stride):
    m = _lanegcn()
    tmod = m.Res1d(n_in, n_out, kernel_size=3, stride=stride, norm=norm, ng=4)
    g = torch.Generator().manual_seed(31)
    with torch.no_grad():
        for p in tmod.parameters():
            p.uniform_(-0.3, 0.3, generator=g)
        for bname, b in tmod.named_buffers():
            if bname.endswith("running_mean"):
                b.uniform_(-0.2, 0.2, generator=g)
            elif bname.endswith("running_var"):
                b.uniform_(0.5, 1.5, generator=g)
    tmod.eval()
    rs = np.random.RandomState(5)
    x = rs.randn(2, n_in, 10).astype(np.float32)             # (B, C, L)
    with torch.no_grad():
        tout = tmod(torch.from_numpy(x))                     # (B, n_out, L')

    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    conv = lambda k: np.transpose(sd[k], (2, 1, 0))          # (out,in,k)->(k,in,out)

    def norm_params(prefix):
        if norm == "GN":
            return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params = {"conv1": {"kernel": conv("conv1.weight")},
              "conv2": {"kernel": conv("conv2.weight")},
              "bn1": norm_params("bn1"), "bn2": norm_params("bn2")}
    stats = {}
    if norm == "BN":
        stats = {"bn1": {"mean": sd["bn1.running_mean"],
                         "var": sd["bn1.running_var"]},
                 "bn2": {"mean": sd["bn2.running_mean"],
                         "var": sd["bn2.running_var"]}}
    if stride != 1 or n_in != n_out:
        params["downsample_conv"] = {"kernel": conv("downsample.0.weight")}
        params["downsample_norm"] = norm_params("downsample.1")
        if norm == "BN":
            stats["downsample_norm"] = {"mean": sd["downsample.1.running_mean"],
                                        "var": sd["downsample.1.running_var"]}
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    fmod = Res1d(n_out=n_out, kernel_size=3, stride=stride, norm=norm, ng=4)
    jout = fmod.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 1))),
                      train=False)
    np.testing.assert_allclose(np.asarray(jout),
                               np.transpose(tout.numpy(), (0, 2, 1)),
                               rtol=1e-4, atol=1e-5)


def test_res1d_in_sequential_head():
    from point_cloud_reid_tpu.models import build_head
    head = build_head([{"type": "Res1d", "n_out": 8, "ng": 4},
                       {"type": "Linear", "out_features": 1}])
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 8).astype(np.float32))
    v = head.init(jax.random.PRNGKey(0), x, train=False)
    out = head.apply(v, x, train=False)
    assert out.shape == (2, 6, 1)
