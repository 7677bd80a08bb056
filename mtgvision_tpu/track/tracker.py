"""Multi-object point-set tracker — the norfair replacement (host-side).

The reference uses norfair with mean_euclidean distance, threshold 300,
hit_counter_max 5, initialization_delay 2, past_detections_length 10
(mtgvision/server.py:100-106; od_cam.py:60-69). Same semantics here:

- each track runs a constant-velocity Kalman filter per tracked point
  (the 4 oriented card corners),
- detections are matched greedily by mean euclidean distance under the
  threshold (norfair's default matching),
- tracks need ``initialization_delay`` consecutive hits before being
  emitted, survive ``hit_counter_max`` missed frames, and keep the last
  ``past_detections_length`` raw detections.

Pure numpy — the math is tiny compared to the device work per frame.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Any, Optional

import numpy as np


@dataclasses.dataclass(eq=False)  # identity equality (arrays aren't comparable)
class Detection:
    """A detected point set (norfair.Detection parity)."""

    points: np.ndarray  # (N, 2)
    data: Any = None


class _KalmanPoints:
    """Constant-velocity Kalman filter over an (N,2) point set.

    State per coordinate: [pos, vel]; shared process/measurement noise.
    Vectorized over all N·2 coordinates at once.
    """

    def __init__(self, points: np.ndarray, q: float = 1.0, r: float = 4.0):
        self.x = points.astype(np.float64).copy()  # positions (N,2)
        self.v = np.zeros_like(self.x)  # velocities
        self.p_pos = np.full_like(self.x, 10.0)  # pos variance
        self.p_vel = np.full_like(self.x, 10.0)
        self.q = q
        self.r = r

    def predict(self):
        self.x = self.x + self.v
        self.p_pos = self.p_pos + self.p_vel + self.q
        self.p_vel = self.p_vel + self.q

    def update(self, z: np.ndarray):
        innov = z - self.x
        s = self.p_pos + self.r
        k_pos = self.p_pos / s
        k_vel = 0.5 * self.p_vel / s
        self.x = self.x + k_pos * innov
        self.v = self.v + k_vel * innov
        self.p_pos = (1.0 - k_pos) * self.p_pos
        self.p_vel = (1.0 - k_vel) * self.p_vel


class TrackedObject:
    """norfair.TrackedObject parity surface."""

    def __init__(self, obj_id: int, det: Detection, past_len: int, hit_counter: int = 5):
        self.id = obj_id
        self._kf = _KalmanPoints(det.points)
        self.hit_counter = hit_counter  # norfair: new tracks get full budget
        self.age = 0
        self.initializing_hits = 1
        self.last_detection: Optional[Detection] = det
        self.past_detections: deque = deque([det], maxlen=past_len)

    @property
    def estimate(self) -> np.ndarray:
        return self._kf.x.copy()


def mean_euclidean(det_points: np.ndarray, trk_points: np.ndarray) -> float:
    return float(np.linalg.norm(det_points - trk_points, axis=-1).mean())


class Tracker:
    def __init__(
        self,
        distance_threshold: float = 300.0,
        hit_counter_max: int = 5,
        initialization_delay: int = 2,
        past_detections_length: int = 10,
        distance_function=mean_euclidean,
    ):
        self.distance_threshold = distance_threshold
        self.hit_counter_max = hit_counter_max
        self.initialization_delay = initialization_delay
        self.past_detections_length = past_detections_length
        self.distance_function = distance_function
        self._tracks: list[TrackedObject] = []
        self._next_id = 1

    def update(self, detections: list[Detection]) -> list[TrackedObject]:
        """Match detections to tracks; returns ACTIVE (initialized) tracks."""
        for t in self._tracks:
            t._kf.predict()
            t.age += 1

        # distance matrix + greedy assignment under threshold
        unmatched_dets = list(range(len(detections)))
        if self._tracks and detections:
            d = np.full((len(detections), len(self._tracks)), np.inf)
            for i, det in enumerate(detections):
                for j, trk in enumerate(self._tracks):
                    if det.points.shape == trk._kf.x.shape:
                        d[i, j] = self.distance_function(det.points, trk._kf.x)
            used_t: set[int] = set()
            order = np.dstack(np.unravel_index(np.argsort(d, axis=None), d.shape))[0]
            matched_d: set[int] = set()
            for i, j in order:
                if d[i, j] > self.distance_threshold or not np.isfinite(d[i, j]):
                    break
                if i in matched_d or j in used_t:
                    continue
                trk = self._tracks[j]
                trk._kf.update(detections[i].points.astype(np.float64))
                trk.hit_counter = min(trk.hit_counter + 2, self.hit_counter_max + 1)
                trk.initializing_hits += 1
                trk.last_detection = detections[i]
                trk.past_detections.append(detections[i])
                matched_d.add(i)
                used_t.add(j)
            unmatched_dets = [i for i in range(len(detections)) if i not in matched_d]

        # decay + reap
        for t in self._tracks:
            t.hit_counter -= 1
        self._tracks = [t for t in self._tracks if t.hit_counter > 0]

        # spawn new tracks
        for i in unmatched_dets:
            self._tracks.append(
                TrackedObject(
                    self._next_id, detections[i], self.past_detections_length,
                    hit_counter=self.hit_counter_max,
                )
            )
            self._next_id += 1

        # only emit initialized tracks that were matched this frame
        return [
            t
            for t in self._tracks
            if t.initializing_hits > self.initialization_delay
            and t.last_detection in detections
        ]
