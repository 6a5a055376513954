"""3D box structures with coordinate-mode conversion, pure jnp.

Equivalent of the reference's inherited mmdet3d core box layer (SURVEY.md
§2.8: BaseInstance3DBoxes core/bbox/structures/base_box3d.py:9,
LiDARInstance3DBoxes lidar_box3d.py:10, DepthInstance3DBoxes
depth_box3d.py:256-280, CameraInstance3DBoxes, Box3DMode box_3d_mode.py:164,
box_np_ops.py corners/rotation/points_in_rbbox) — reduced to the geometry the
data frontend and tracker consume, as one immutable array-backed class
instead of a class hierarchy.

Box tensor layout: (N, 7) = [cx, cy, z, dx, dy, dz, yaw]; `origin_z` states
where z sits (0.0 = bottom face, the lidar convention; 0.5 = gravity center,
the depth convention).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from .boxes import (box_corners_3d, box_corners_bev, boxes_iou_3d,
                    boxes_iou_bev, nms_bev, points_in_rboxes, rotation_2d)


@dataclasses.dataclass(frozen=True)
class Boxes3D:
    """Immutable batch of 3D boxes. jit-friendly (registered as a pytree)."""

    tensor: jnp.ndarray              # (N, 7)
    origin_z: float = 0.0            # 0.0 bottom (lidar) | 0.5 center (depth)

    # ---- constructors --------------------------------------------------------

    @classmethod
    def lidar(cls, tensor) -> "Boxes3D":
        return cls(jnp.asarray(tensor, jnp.float32), origin_z=0.0)

    @classmethod
    def depth(cls, tensor) -> "Boxes3D":
        """Gravity-centered z (DepthInstance3DBoxes origin=(0.5,0.5,0.5))."""
        return cls(jnp.asarray(tensor, jnp.float32), origin_z=0.5)

    # ---- views ---------------------------------------------------------------

    def __len__(self) -> int:
        return int(self.tensor.shape[0])

    @property
    def center(self) -> jnp.ndarray:
        """(N, 3) gravity centers regardless of stored origin."""
        t = self.tensor
        z = t[:, 2] + (0.5 - self.origin_z) * t[:, 5]
        return jnp.stack([t[:, 0], t[:, 1], z], axis=-1)

    @property
    def dims(self) -> jnp.ndarray:
        return self.tensor[:, 3:6]

    @property
    def yaw(self) -> jnp.ndarray:
        return self.tensor[:, 6]

    @property
    def volume(self) -> jnp.ndarray:
        return jnp.prod(self.dims, axis=-1)

    def to_origin(self, origin_z: float) -> "Boxes3D":
        """Box3DMode-style convention conversion (box_3d_mode.py:164)."""
        t = self.tensor
        z = t[:, 2] + (origin_z - self.origin_z) * t[:, 5]
        return Boxes3D(t.at[:, 2].set(z), origin_z=origin_z)

    def bottom(self) -> "Boxes3D":
        return self.to_origin(0.0)

    def gravity(self) -> "Boxes3D":
        return self.to_origin(0.5)

    # ---- geometry -------------------------------------------------------------

    def corners(self) -> jnp.ndarray:
        """(N, 8, 3) box corners (box_np_ops.corners_nd + rotation)."""
        return box_corners_3d(self.bottom().tensor)

    def corners_bev(self) -> jnp.ndarray:
        """(N, 4, 2) rotated BEV rectangles."""
        return box_corners_bev(self.tensor)

    def points_in_boxes(self, points: jnp.ndarray) -> jnp.ndarray:
        """(P, N) membership mask (points_in_boxes_batch /
        points_in_rbbox, box_np_ops.py:430)."""
        return points_in_rboxes(points[:, :3], self.bottom().tensor)

    def rotate(self, angle: jnp.ndarray) -> "Boxes3D":
        """Rotate around the z axis (BaseInstance3DBoxes.rotate)."""
        t = self.tensor
        rot = rotation_2d(jnp.asarray(angle))
        xy = t[:, :2] @ rot.T
        return Boxes3D(
            jnp.concatenate([xy, t[:, 2:6], (t[:, 6:7] + angle)], axis=1),
            origin_z=self.origin_z)

    def translate(self, offset) -> "Boxes3D":
        t = self.tensor
        return Boxes3D(t.at[:, :3].add(jnp.asarray(offset)),
                       origin_z=self.origin_z)

    def scale(self, factor: float) -> "Boxes3D":
        t = self.tensor
        return Boxes3D(
            jnp.concatenate([t[:, :6] * factor, t[:, 6:]], axis=1),
            origin_z=self.origin_z)

    # ---- pairwise -------------------------------------------------------------

    def iou_bev(self, other: "Boxes3D") -> jnp.ndarray:
        return boxes_iou_bev(self.tensor, other.tensor)

    def iou_3d(self, other: "Boxes3D") -> jnp.ndarray:
        return boxes_iou_3d(self.bottom().tensor, other.bottom().tensor)

    def nms(self, scores: jnp.ndarray, thresh: float,
            max_out: Optional[int] = None) -> jnp.ndarray:
        return nms_bev(self.tensor, scores, thresh, max_out=max_out) \
            if max_out is not None else nms_bev(self.tensor, scores, thresh)


def _flatten(b: Boxes3D):
    return (b.tensor,), b.origin_z


def _unflatten(origin_z, children):
    return Boxes3D(children[0], origin_z=origin_z)


import jax  # noqa: E402
jax.tree_util.register_pytree_node(Boxes3D, _flatten, _unflatten)
