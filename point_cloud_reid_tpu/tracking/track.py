"""Track objects and the host-side track store.

Equivalent of the reference Track (trackers/deprecated/track.py:7-214) and
the per-class active-track bookkeeping inside VirtualTracker
(virtual_tracker.py:133-296). Host-side by design: lifecycle logic is tiny,
branchy state machinery; everything O(T·D·C) numeric lives on device.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


@dataclass
class Track:
    """One tracked object.

    Attributes mirror the reference track state: id, class, box history,
    detection confidence, and lifecycle counters (track.py:10-96).
    """

    track_id: int
    cls: int
    box: np.ndarray                      # (7,) cx cy cz dx dy dz yaw
    score: float
    hits: int = 1
    age: int = 0                         # frames since last update
    timestep: int = 0
    velocity: np.ndarray = field(
        default_factory=lambda: np.zeros(2, np.float32))
    history: List[np.ndarray] = field(default_factory=list)

    def update(self, box: np.ndarray, score: float, timestep: int):
        """Matched-detection update (track.addTimestep semantics)."""
        dt = max(timestep - self.timestep, 1)
        self.velocity = (np.asarray(box[:2]) - self.box[:2]) / dt
        self.history.append(self.box.copy())
        self.box = np.asarray(box, np.float32)
        self.score = float(score)
        self.hits += 1
        self.age = 0
        self.timestep = timestep

    def predict(self, timestep: int) -> np.ndarray:
        """Constant-velocity propagation of the box center
        (track.transform_over_time 'velocity' method, track.py:116-183)."""
        dt = timestep - self.timestep
        box = self.box.copy()
        box[:2] = box[:2] + self.velocity * dt
        return box

    def missed(self):
        """Unmatched step (track.unmatched_step)."""
        self.age += 1


class TrackStore:
    """Active/dead track collections with id allocation."""

    def __init__(self, max_age: int = 3, min_hits: int = 1):
        self.max_age = max_age
        self.min_hits = min_hits
        self.tracks: Dict[int, Track] = {}
        self._next_id = 0

    def new_track(self, cls: int, box: np.ndarray, score: float,
                  timestep: int) -> Track:
        t = Track(self._next_id, int(cls), np.asarray(box, np.float32),
                  float(score), timestep=timestep)
        self.tracks[t.track_id] = t
        self._next_id += 1
        return t

    def active(self, cls: Optional[int] = None) -> List[Track]:
        return [t for t in self.tracks.values()
                if t.age <= self.max_age and (cls is None or t.cls == cls)]

    def prune(self) -> List[int]:
        """Drop tracks older than max_age; returns dropped ids."""
        dead = [tid for tid, t in self.tracks.items() if t.age > self.max_age]
        for tid in dead:
            del self.tracks[tid]
        return dead

    def outputs(self) -> List[Track]:
        """Tracks confirmed enough to report (min_hits gating)."""
        return [t for t in self.tracks.values()
                if t.age == 0 and t.hits >= self.min_hits]

    def __len__(self):
        return len(self.tracks)
