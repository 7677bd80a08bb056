"""Tracker tests: association, initialization delay, death, Kalman smoothing."""

import numpy as np

from mtgvision_tpu.track.tracker import Detection, Tracker


def quad(cx, cy, s=20.0):
    return np.asarray(
        [[cx - s, cy - s], [cx + s, cy - s], [cx + s, cy + s], [cx - s, cy + s]]
    )


def test_initialization_delay():
    t = Tracker(initialization_delay=2)
    assert t.update([Detection(quad(100, 100))]) == []  # hit 1
    assert t.update([Detection(quad(102, 100))]) == []  # hit 2
    out = t.update([Detection(quad(104, 100))])  # hit 3 > delay
    assert len(out) == 1
    assert out[0].id == 1


def test_track_follows_motion():
    t = Tracker(initialization_delay=0)
    ids = []
    for i in range(10):
        out = t.update([Detection(quad(100 + 10 * i, 100))])
        if out:
            ids.append(out[0].id)
    assert set(ids) == {1}  # one persistent track across motion
    est = t._tracks[0].estimate
    assert abs(est.mean(0)[0] - 190) < 15  # roughly at the last position


def test_two_tracks_no_swap():
    t = Tracker(initialization_delay=0)
    for i in range(6):
        out = t.update(
            [Detection(quad(100, 100 + i * 5)), Detection(quad(500, 100 - i * 5))]
        )
    assert len(out) == 2
    by_x = sorted(out, key=lambda o: o.estimate.mean(0)[0])
    assert by_x[0].id != by_x[1].id
    # left track stayed left
    assert by_x[0].estimate.mean(0)[0] < 300 < by_x[1].estimate.mean(0)[0]


def test_track_dies_after_misses():
    t = Tracker(initialization_delay=0, hit_counter_max=3)
    t.update([Detection(quad(100, 100))])
    for _ in range(6):
        out = t.update([])
    assert t._tracks == []


def test_distance_threshold_spawns_new():
    t = Tracker(initialization_delay=0, distance_threshold=50)
    t.update([Detection(quad(100, 100))])
    t.update([Detection(quad(600, 600))])  # too far → new track
    assert len(t._tracks) == 2


def test_unmatched_predicted_tracks_not_emitted():
    t = Tracker(initialization_delay=0)
    t.update([Detection(quad(100, 100))])
    out = t.update([])  # no detections → predicted-only tracks suppressed
    assert out == []
