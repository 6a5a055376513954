"""3D box geometry as pure jnp: rotation, corners, points-in-rotated-box, BEV IoU, NMS.

TPU-native replacements for the reference's inherited mmdet3d core + CUDA extensions:
  - points_in_rboxes      <- ops/roiaware_pool3d/points_in_boxes_{gpu,cpu,batch}
                             and core/bbox/box_np_ops.py:430 (points_in_rbbox)
  - boxes_iou_bev / nms   <- ops/iou3d (iou3d_utils.py, iou3d_kernel.cu)
  - corners / rotation    <- core/bbox/structures/lidar_box3d.py, box_np_ops.py

Boxes follow the LiDAR convention (x, y, z, dx, dy, dz, yaw) with z the box-bottom
center (gravity center = z + dz/2), matching LiDARInstance3DBoxes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rotation_2d(yaw: jnp.ndarray) -> jnp.ndarray:
    """(...,) yaw -> (..., 2, 2) rotation matrices (counter-clockwise)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=-2
    )


def box_corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) boxes -> (..., 4, 2) BEV corner coordinates."""
    center = boxes[..., :2]
    dims = boxes[..., 3:5]
    yaw = boxes[..., 6]
    # corner template in box frame, counter-clockwise order
    tmpl = jnp.array(
        [[0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5], [0.5, -0.5]], dtype=boxes.dtype
    )
    local = tmpl * dims[..., None, :]
    rot = rotation_2d(yaw)
    world = jnp.einsum("...ij,...kj->...ki", rot, local)
    return world + center[..., None, :]


def box_corners_3d(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) boxes -> (..., 8, 3) corners (bottom 4 then top 4)."""
    bev = box_corners_bev(boxes)                                  # (...,4,2)
    z0 = boxes[..., 2:3]
    z1 = boxes[..., 2:3] + boxes[..., 5:6]
    bot = jnp.concatenate([bev, jnp.broadcast_to(z0[..., None, :], bev[..., :1].shape)], -1)
    top = jnp.concatenate([bev, jnp.broadcast_to(z1[..., None, :], bev[..., :1].shape)], -1)
    return jnp.concatenate([bot, top], axis=-2)


def points_in_rboxes(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Membership test of points against rotated 3D boxes.

    Args:
        points: (N, 3)
        boxes: (M, 7) as (x, y, z_bottom, dx, dy, dz, yaw)
    Returns:
        (N, M) bool mask.

    Vectorized equivalent of points_in_boxes_batch (roiaware_pool3d) / points_in_rbbox
    (box_np_ops.py:430): transform points into each box frame and compare to half-dims.
    """
    rel = points[:, None, :2] - boxes[None, :, :2]                # (N,M,2)
    c, s = jnp.cos(-boxes[:, 6]), jnp.sin(-boxes[:, 6])
    local_x = rel[..., 0] * c[None] - rel[..., 1] * s[None]
    local_y = rel[..., 0] * s[None] + rel[..., 1] * c[None]
    in_x = jnp.abs(local_x) <= boxes[None, :, 3] * 0.5
    in_y = jnp.abs(local_y) <= boxes[None, :, 4] * 0.5
    z = points[:, None, 2]
    in_z = (z >= boxes[None, :, 2]) & (z <= boxes[None, :, 2] + boxes[None, :, 5])
    return in_x & in_y & in_z


def points_to_box_frame(points: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Center points into one box's canonical frame (the per-object centering the
    tracker crop extractor applies, pc_utils.py:62-75).

    points: (N, 3); box: (7,). Returns (N, 3).
    """
    rel = points[:, :2] - box[None, :2]
    c, s = jnp.cos(-box[6]), jnp.sin(-box[6])
    x = rel[:, 0] * c - rel[:, 1] * s
    y = rel[:, 0] * s + rel[:, 1] * c
    z = points[:, 2] - (box[2] + box[5] * 0.5)
    return jnp.stack([x, y, z], axis=-1)


def _polygon_clip(subject: jnp.ndarray, clip: jnp.ndarray):
    """Sutherland–Hodgman clipping of convex quad `subject` by convex quad `clip`.

    Fixed-size formulation: the intersection of two quads has at most 8 vertices; we
    carry a padded (16, 2) vertex buffer + count so everything stays static-shape.
    Returns (verts (16,2), count ()).
    """
    MAXV = 16

    def clip_edge(carry, i):
        verts, n = carry
        a = clip[i]
        b = clip[(i + 1) % 4]
        edge = b - a

        def inside(p):
            # small negative tolerance absorbs f32 flicker for on-edge vertices
            return edge[0] * (p[1] - a[1]) - edge[1] * (p[0] - a[0]) >= -1e-5

        def intersect(p, q):
            dc = a - b
            dp = p - q
            n1 = a[0] * b[1] - a[1] * b[0]
            n2 = p[0] * q[1] - p[1] * q[0]
            denom = dc[0] * dp[1] - dc[1] * dp[0]
            denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            return (n1 * dp - n2 * dc) / denom

        def body(j, acc):
            out, m = acc
            cur = verts[j % MAXV]
            prv = verts[jnp.where(j == 0, jnp.maximum(n - 1, 0), j - 1) % MAXV]
            cur_in = inside(cur)
            prv_in = inside(prv)
            valid = j < n

            def push(out, m, p, do):
                out = jnp.where(do, out.at[m % MAXV].set(p), out)
                return out, jnp.where(do, m + 1, m)

            out, m = push(out, m, intersect(prv, cur),
                          valid & (cur_in != prv_in))
            out, m = push(out, m, cur, valid & cur_in)
            return out, m

        out0 = jnp.zeros((MAXV, 2), verts.dtype)
        out, m = jax.lax.fori_loop(0, MAXV, body, (out0, jnp.int32(0)))
        return (out, m), None

    (verts, n), _ = jax.lax.scan(clip_edge, (jnp.pad(subject, ((0, MAXV - 4), (0, 0))),
                                             jnp.int32(4)), jnp.arange(4))
    return verts, n


def _polygon_area(verts: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    MAXV = verts.shape[0]
    idx = jnp.arange(MAXV)
    nxt = (idx + 1) % jnp.maximum(n, 1)
    x, y = verts[:, 0], verts[:, 1]
    cross = x * y[nxt] - x[nxt] * y
    cross = jnp.where(idx < n, cross, 0.0)
    return 0.5 * jnp.abs(jnp.sum(cross))


def boxes_overlap_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Exact rotated BEV overlap areas, (N, 7) x (M, 7) -> (N, M).

    Equivalent of boxes_overlap_bev (ops/iou3d). Polygon clipping is scalar-heavy;
    suited to the small N*M of the tracker workload, vmapped over pairs.
    """
    ca = box_corners_bev(boxes_a)                                 # (N,4,2)
    cb = box_corners_bev(boxes_b)                                 # (M,4,2)

    def one(pa, pb):
        verts, n = _polygon_clip(pa, pb)
        return _polygon_area(verts, n)

    return jax.vmap(lambda pa: jax.vmap(lambda pb: one(pa, pb))(cb))(ca)


def boxes_iou_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Rotated BEV IoU (ops/iou3d iou3d_utils.boxes_iou_bev equivalent)."""
    inter = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    inter = jnp.minimum(inter, jnp.minimum(area_a[:, None], area_b[None, :]))
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.clip(inter / jnp.maximum(union, 1e-8), 0.0, 1.0)


def boxes_iou_3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Rotated 3D IoU via BEV overlap x z-overlap (ops/iou3d nms semantics)."""
    inter_bev = boxes_overlap_bev(boxes_a, boxes_b)
    inter_bev = jnp.minimum(
        inter_bev,
        jnp.minimum((boxes_a[:, 3] * boxes_a[:, 4])[:, None],
                    (boxes_b[:, 3] * boxes_b[:, 4])[None, :]),
    )
    za0, za1 = boxes_a[:, 2], boxes_a[:, 2] + boxes_a[:, 5]
    zb0, zb1 = boxes_b[:, 2], boxes_b[:, 2] + boxes_b[:, 5]
    zo = jnp.maximum(
        jnp.minimum(za1[:, None], zb1[None, :]) - jnp.maximum(za0[:, None], zb0[None, :]),
        0.0,
    )
    inter = inter_bev * zo
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    return inter / jnp.maximum(vol_a[:, None] + vol_b[None, :] - inter, 1e-8)


def nms_bev(boxes: jnp.ndarray, scores: jnp.ndarray, thresh: float,
            max_out: int) -> jnp.ndarray:
    """Greedy rotated NMS; returns fixed-size keep indices padded with -1.

    Equivalent of nms_gpu (ops/iou3d). Static shapes: precompute the full IoU matrix
    once (one MXU-friendly batch of polygon clips), then a fori_loop suppression scan.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    iou = boxes_iou_bev(boxes, boxes)

    def body(i, carry):
        keep, kcount, alive = carry
        cand = order[i]
        ok = alive[cand] & (kcount < max_out)
        keep = jnp.where(ok, keep.at[kcount].set(cand), keep)
        kcount = jnp.where(ok, kcount + 1, kcount)
        sup = iou[cand] > thresh
        alive = jnp.where(ok, alive & ~sup, alive)
        return keep, kcount, alive

    keep0 = jnp.full((max_out,), -1, dtype=jnp.int32)
    alive0 = jnp.ones((n,), dtype=bool)
    keep, _, _ = jax.lax.fori_loop(0, n, body, (keep0, jnp.int32(0), alive0))
    return keep
