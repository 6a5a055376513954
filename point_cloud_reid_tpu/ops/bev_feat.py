"""BEV feature sampling: bilinear point/grid interpolation and rotated ROI pooling.

TPU-native rebuild of two reference feature extractors (both only reachable
from the deprecated tracker, live here):

- trackers/deprecated/tracking_helpers.py:63-131, 389-447 — torch
  `grid_sample`-based BEV feature interpolation at object centers
  (`interpolateBEV` / `interpolate_bev_2d` / `interpolate_bev_grid_2d` +
  `getCenteredGrid`), used by BEVSupervisor's metric learning.
- models/lanegcn_nets.py:252-353 — LaneGCN's clamped bilinear pixel features
  (`linear_interp` / `get_pixel_feat`) and rotated BEV ROI features
  (`get_roi_feat`).

Layout is channel-LAST: feature maps are (H, W, C); sampling is a fixed-shape
gather + 4-tap weighted sum that fuses into surrounding jitted programs (the
reference pays a grid_sample kernel launch per call).

Reference quirks documented, not carried:
- `interpolateBEV` (tracking_helpers.py:67-96) normalizes x to [0, W] but
  grid_sample expects [-1, 1] — it samples garbage outside the upper-left
  quadrant. The corrected `interpolate_bev_2d` (:99-131) is what we match.
- `interpolate_bev_grid_2d`'s final `reshape(b, C, n, n)` of a (b, n*n, C)
  tensor scrambles channels across grid positions (:446-447), and its
  internal `.reshape(b, num_points**2, 2)` CRASHES for more than one center
  per call; we return the unscrambled (N, n, n, C) for any N. Golden tests
  undo the reference reshape to compare the single-center case.
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp


def grid_sample_bilinear(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.functional.grid_sample equivalent: bilinear, align_corners=False,
    padding_mode='zeros'.

    Args:
        img: (H, W, C) feature map.
        grid: (..., 2) normalized coords in [-1, 1]; grid[..., 0] samples the
            W axis, grid[..., 1] the H axis (torch convention).
    Returns:
        (..., C) sampled features; zero outside the map.
    """
    H, W = img.shape[0], img.shape[1]
    x = ((grid[..., 0] + 1.0) * W - 1.0) * 0.5
    y = ((grid[..., 1] + 1.0) * H - 1.0) * 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            w = (1.0 - jnp.abs(x - xi)) * (1.0 - jnp.abs(y - yi))
            inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
            val = img[yc, xc]                                   # (..., C)
            out = out + jnp.where(inside[..., None], w[..., None] * val, 0.0)
    return out


def _norm_to_grid(v: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    """tracking_helpers.torchInterp(v, [lo,hi], [-1,1])."""
    return (v - lo) / (hi - lo) * 2.0 - 1.0


def interpolate_bev(bev: jnp.ndarray, xy: jnp.ndarray,
                    point_cloud_range: Sequence[float]) -> jnp.ndarray:
    """Bilinear BEV features at lidar-frame xy positions
    (tracking_helpers.interpolate_bev_2d:99-131 semantics).

    Args:
        bev: (H, W, C) BEV feature map; lidar x spans the W axis, y the H axis
            (the reference's grid x-slot samples its last array axis).
        xy: (..., 2) lidar-frame coordinates.
        point_cloud_range: [xmin, ymin, zmin, xmax, ymax, zmax].
    Returns:
        (..., C); zero outside the range.
    """
    r = point_cloud_range
    gx = _norm_to_grid(xy[..., 0], r[0], r[3])
    gy = _norm_to_grid(xy[..., 1], r[1], r[4])
    return grid_sample_bilinear(bev, jnp.stack([gx, gy], axis=-1))


def centered_grid(centers: jnp.ndarray, spacing: float,
                  num_points: int) -> jnp.ndarray:
    """(N, 2) centers -> (N, num_points**2, 2) local square grids
    (tracking_helpers.getCenteredGrid:389-403, ij-indexed meshgrid order)."""
    lin = jnp.linspace(-spacing, spacing, num_points)
    gx, gy = jnp.meshgrid(lin, lin, indexing="ij")
    offsets = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)       # (n*n, 2)
    return centers[:, None, :] + offsets[None]


def interpolate_bev_grid(bev: jnp.ndarray, xy: jnp.ndarray,
                         point_cloud_range: Sequence[float],
                         spacing: float = 2.0,
                         num_points: int = 5) -> jnp.ndarray:
    """BEV features on a square grid around each center
    (tracking_helpers.interpolate_bev_grid_2d:406-447, minus the scrambled
    final reshape — see module docstring).

    Args:
        xy: (N, 2) lidar-frame centers.
    Returns:
        (N, num_points, num_points, C).
    """
    grids = centered_grid(xy, spacing, num_points)              # (N, n*n, 2)
    feats = interpolate_bev(bev, grids, point_cloud_range)      # (N, n*n, C)
    N, _, C = feats.shape
    return feats.reshape(N, num_points, num_points, C)


# --------------------------------------------------------------- lanegcn ----

def linear_interp(x: jnp.ndarray, n_max: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Clamped pixel-center linear interpolation weights/indices
    (lanegcn_nets.py:252-276). x is normalized to [0, 1]."""
    x = x * n_max - 0.5
    x = jnp.clip(x, 0.0, n_max - 1.0)
    n = jnp.floor(x)
    rw = x - n
    lw = 1.0 - rw
    li = n.astype(jnp.int32)
    ri = jnp.minimum(li + 1, n_max - 1)
    return lw, li, rw, ri


def _pixel_bilinear(fm: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                    ) -> jnp.ndarray:
    """4-tap clamped bilinear gather; fm (H, W, C), x/y normalized [0,1]."""
    H, W = fm.shape[0], fm.shape[1]
    xlw, xli, xhw, xhi = linear_interp(x, W)
    ylw, yli, yhw, yhi = linear_interp(y, H)
    return (xlw * ylw)[..., None] * fm[yli, xli] + \
           (xlw * yhw)[..., None] * fm[yhi, xli] + \
           (xhw * ylw)[..., None] * fm[yli, xhi] + \
           (xhw * yhw)[..., None] * fm[yhi, xhi]


def get_pixel_feat(fm: jnp.ndarray, bboxes: jnp.ndarray,
                   pts_range: Sequence[float]) -> jnp.ndarray:
    """BEV pixel features at box centers (lanegcn_nets.py:279-293).

    Args:
        fm: (H, W, C) feature map. bboxes: (N, >=2) cx, cy leading.
        pts_range: (x_min, x_max, y_min, y_max, ...) — NOTE lanegcn's range
            order differs from the tracker's point_cloud_range.
    Returns:
        (N, C).
    """
    x_min, x_max, y_min, y_max = pts_range[:4]
    x = (bboxes[:, 0] - x_min) / (x_max - x_min)
    y = (y_max - bboxes[:, 1]) / (y_max - y_min)                # y axis flipped
    return _pixel_bilinear(fm, x, y)


def get_roi_feat(fm: jnp.ndarray, bboxes: jnp.ndarray,
                 roi_size: Union[int, Sequence[int]],
                 pts_range: Sequence[float]) -> jnp.ndarray:
    """Rotated BEV ROI features (lanegcn_nets.py:296-353).

    Samples an (rh, rw) grid of bin centers inside each rotated box and
    bilinearly interpolates the map; bins falling outside (0,1)x(0,1) are
    zeroed (strict inequalities, matching the reference mask).

    Args:
        fm: (H, W, C). bboxes: (N, 5) = cx, cy, wid, hgt, theta.
        roi_size: int or (rh, rw).
    Returns:
        (N, rh, rw, C)  [reference layout is (N, C, rh, rw)].
    """
    if isinstance(roi_size, int):
        roi_size = (roi_size, roi_size)
    rh, rw = roi_size
    cx, cy, wid, hgt, theta = (bboxes[:, i] for i in range(5))
    st, ct = jnp.sin(theta), jnp.cos(theta)
    # bin centers in the box frame (x left->right, y top->bottom reversed)
    x_bin = (jnp.arange(rw) + 0.5) / rw - 0.5                   # (rw,)
    y_bin = (jnp.arange(rh - 1, -1, -1) + 0.5) / rh - 0.5       # (rh,)
    ox = x_bin[None, None, :] * wid[:, None, None]              # (N, 1, rw)
    oy = y_bin[None, :, None] * hgt[:, None, None]              # (N, rh, 1)
    ox, oy = jnp.broadcast_arrays(ox, oy)                       # (N, rh, rw)
    rx = ct[:, None, None] * ox - st[:, None, None] * oy
    ry = st[:, None, None] * ox + ct[:, None, None] * oy
    x = cx[:, None, None] + rx
    y = cy[:, None, None] + ry
    x_min, x_max, y_min, y_max = pts_range[:4]
    x = (x - x_min) / (x_max - x_min)
    y = (y_max - y) / (y_max - y_min)
    mask = (x > 0) & (x < 1) & (y > 0) & (y < 1)
    feat = _pixel_bilinear(fm, x, y)                            # (N, rh, rw, C)
    return jnp.where(mask[..., None], feat, 0.0)
