"""Track-level (multi-frame) system evaluation — temporal fusion accuracy.

The reference system's user-facing accuracy is per-TRACK, not per-frame: the
server tracks cards across frames (norfair, mtgvision/server.py:100-106) and
fuses embeddings with an EWMA (w=0.1) on a 0.5 s throttle before querying the
index (server.py:178-202). Every r2-r4 eval protocol scored single frames,
which understates serving quality exactly where single-frame matching is
weakest (occluded/tiny cards whose corner registration flickers frame to
frame). This harness measures what the reference design actually shows users:

- each scene is rendered as a T-frame sequence under a smooth random-walk
  camera jitter (global homography composed onto every card placement and
  the background — webcam wobble), with fresh photometric noise per frame,
- all T frames run through the pipeline in ONE batched dispatch (the
  pipeline is per-frame stateless; batching is free TPU throughput),
- detections feed the REAL tracker (track/tracker.py, norfair parity) frame
  by frame; per track the harness keeps the server-parity EWMA embedding
  (w=0.1) plus two cheap fusions the server could adopt: score-weighted
  match votes and a majority flip vote,
- tracks are associated to GT cards by per-frame centroid gates (same rules
  as eval/e2e_eval.evaluate_e2e) and scored at the END of the sequence.

Reference: mtgvision/server.py:133-205 (TrackerCtx), norfair config
server.py:100-106.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from mtgvision_tpu.data.scene_gen import SceneGenerator, apply_m, card_bbox
from mtgvision_tpu.eval.e2e_eval import _poly_centroid
from mtgvision_tpu.ops.polygon import clip_poly, poly_area


def camera_walk(rng: np.random.Generator, n_frames: int, frame_hw,
                rot_sigma_deg: float = 0.6, trans_sigma: float = 3.0,
                scale_sigma: float = 0.005) -> list[np.ndarray]:
    """T smooth camera homographies (random walk about the frame center).

    Frame 0 is identity; each step composes a small rotation/translation/
    scale increment — the magnitude class of handheld-webcam wobble at
    15 fps (the reference client's send rate, www util-store.ts:24)."""
    h, w = frame_hw
    c = np.asarray([w / 2.0, h / 2.0])
    th, tx, ty, s = 0.0, 0.0, 0.0, 1.0
    mats = []
    for t in range(n_frames):
        if t:
            th += rng.normal(0.0, np.deg2rad(rot_sigma_deg))
            tx += rng.normal(0.0, trans_sigma)
            ty += rng.normal(0.0, trans_sigma)
            s *= 1.0 + rng.normal(0.0, scale_sigma)
        co, si = np.cos(th) * s, np.sin(th) * s
        m = np.asarray([
            [co, si, c[0] - co * c[0] - si * c[1] + tx],
            [-si, co, c[1] + si * c[0] - co * c[1] + ty],
            [0.0, 0.0, 1.0],
        ])
        mats.append(m)
    return mats


def scene_sequence(gen: SceneGenerator, n_frames: int,
                   rot_sigma_deg: float = 0.6, trans_sigma: float = 3.0,
                   scale_sigma: float = 0.005):
    """One scene rendered as T jittered frames.

    Returns (frames (T,H,W,3) float32, gt [(card, [m_t per frame]), ...]).
    Card placements are sampled ONCE (gen.random's host placement); each
    frame re-composites with the camera homography G_t pre-composed onto
    every placement and the background cover transform, plus a fresh
    photometric key — the same fused device compositor training scenes use
    (data/scene_gen.compose_scene)."""
    import jax.numpy as jnp

    from mtgvision_tpu.data.scene_gen import (
        MAX_CARDS,
        compose_scene,
        cover_rotate_matrix,
    )

    card_hw = gen.catalog.card_hw
    bg_hw = gen.bg_size_hw
    # host placement via the generator's own stream (exact training rules)
    s = gen.random(return_cards=True)
    placed = s["cards"]  # [(card, m)]
    k = len(placed)

    cards_arr = np.zeros((MAX_CARDS, *card_hw, 3), np.float32)
    valid = np.zeros(MAX_CARDS, np.float32)
    base_ms = np.tile(np.eye(3, dtype=np.float32), (MAX_CARDS, 1, 1))
    for i, (card, m) in enumerate(placed[:MAX_CARDS]):
        cards_arr[i] = gen.catalog.get_image(card)
        base_ms[i] = m
        valid[i] = 1.0

    bg = gen.backgrounds.ran_image(gen.rng)
    bg_m = cover_rotate_matrix(gen.rng, bg.shape[:2], bg_hw).astype(np.float32)

    walks = camera_walk(gen.rng, n_frames, bg_hw, rot_sigma_deg,
                        trans_sigma, scale_sigma)
    frames = []
    gt_ms = [[] for _ in range(k)]
    for g in walks:
        ms_t = np.einsum("ij,kjl->kil", g, base_ms).astype(np.float32)
        for i in range(k):
            gt_ms[i].append(g @ base_ms[i])
        img = compose_scene(
            gen._next_key(),
            jnp.asarray(bg),
            jnp.asarray((g @ bg_m).astype(np.float32)),
            jnp.asarray(cards_arr),
            jnp.asarray(ms_t),
            jnp.asarray(valid),
            out_hw=bg_hw,
        )
        frames.append(np.asarray(img))
    gt = [(card, gt_ms[i]) for i, (card, _) in enumerate(placed[:MAX_CARDS])]
    return np.stack(frames), gt


@dataclasses.dataclass
class _TrackState:
    """Per-track temporal fusion (server-parity EWMA + vote fusions)."""

    avg_z: np.ndarray | None = None
    flip_votes: int = 0
    n_obs: int = 0
    match_votes: dict = dataclasses.field(default_factory=dict)
    gt_votes: dict = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class TrackStats:
    n_gt: int = 0
    n_tracked: int = 0          # GT cards with an associated surviving track
    n_top1_ewma: int = 0        # EWMA-z index query (server parity)
    n_top5_ewma: int = 0
    n_top1_vote: int = 0        # score-weighted per-frame match votes
    n_flip: int = 0             # majority per-frame flip vs GT
    n_frame_obs: int = 0        # per-frame observations across matched tracks
    n_frame_top1: int = 0       # single-frame top-1 on those observations

    @property
    def track_recall(self):
        return self.n_tracked / max(self.n_gt, 1)

    @property
    def top1_ewma(self):
        return self.n_top1_ewma / max(self.n_tracked, 1)

    @property
    def top5_ewma(self):
        return self.n_top5_ewma / max(self.n_tracked, 1)

    @property
    def top1_vote(self):
        return self.n_top1_vote / max(self.n_tracked, 1)

    @property
    def flip_rate(self):
        return self.n_flip / max(self.n_tracked, 1)

    @property
    def frame_top1(self):
        return self.n_frame_top1 / max(self.n_frame_obs, 1)

    def __str__(self):
        return (
            f"track_recall={self.track_recall:.3f} "
            f"top1_ewma={self.top1_ewma:.3f} top5_ewma={self.top5_ewma:.3f} "
            f"top1_vote={self.top1_vote:.3f} flip_rate={self.flip_rate:.2f} "
            f"(frame-level top1={self.frame_top1:.3f} over "
            f"{self.n_frame_obs} obs; gt={self.n_gt}, tracked={self.n_tracked})"
        )


def evaluate_tracked(
    pipeline,
    gen: SceneGenerator,
    n_scenes: int = 20,
    n_frames: int = 8,
    ewma_weight: float = 0.1,
    match_dist: float = 64.0,
    min_track_frames: int = 3,
    details: list | None = None,
) -> TrackStats:
    """Score per-track identification over jittered frame sequences.

    ``min_track_frames``: a GT card counts as tracked when its majority
    track observed it in at least this many frames (the reference's
    initialization_delay=2 + 1 emitting frame)."""
    import jax.numpy as jnp

    from mtgvision_tpu.track.tracker import Detection, Tracker

    stats = TrackStats()
    for _ in range(n_scenes):
        frames, gt = scene_sequence(gen, n_frames)
        h_img, w_img = frames.shape[1:3]
        frame_rect = np.asarray(
            [[0, 0], [w_img, 0], [w_img, h_img], [0, h_img]], np.float64
        )
        out = pipeline(jnp.asarray(frames))  # ONE batched dispatch, T frames
        valid = np.asarray(out["valid"])
        corners = np.asarray(out["corners"])
        scores = np.asarray(out["det_scores"])
        zs = np.asarray(out["z"])
        match_idx = (
            np.asarray(out["match_idx"]) if out["match_idx"] is not None else None
        )
        match_scores = (
            np.asarray(out["match_scores"])
            if out["match_scores"] is not None else None
        )

        tracker = Tracker(
            distance_threshold=300, hit_counter_max=5,
            initialization_delay=2, past_detections_length=10,
        )
        tstate: dict[int, _TrackState] = {}
        card_hw = gen.catalog.card_hw

        for t in range(n_frames):
            slots = [i for i in range(valid.shape[1]) if valid[t, i]]
            dets = [Detection(points=corners[t, i], data=i) for i in slots]
            tracked = tracker.update(dets)

            # per-frame GT assignment (same centroid-gate rules as
            # evaluate_e2e, fixed 64 px gate for fully-visible cards)
            quads_t = [apply_m(card_bbox(card_hw), ms[t]) for _, ms in gt]
            gates, cents = [], []
            for q in quads_t:
                clipped = bool(
                    (q[:, 0] < 0).any() or (q[:, 1] < 0).any()
                    or (q[:, 0] > w_img).any() or (q[:, 1] > h_img).any()
                )
                vis = clip_poly(np.asarray(q, np.float64), frame_rect)
                if len(vis) >= 3:
                    cents.append(_poly_centroid(vis))
                    va = abs(poly_area(np.asarray(vis, np.float32)))
                else:
                    cents.append(q.mean(0))
                    va = 0.0
                gates.append(
                    max(match_dist, 0.5 * float(np.sqrt(va)))
                    if clipped else match_dist
                )
            pairs = []
            for gi, c in enumerate(cents):
                for i in slots:
                    d = float(np.linalg.norm(corners[t, i].mean(0) - c))
                    if d < gates[gi]:
                        pairs.append((d, gi, i))
            slot_of_gt: dict[int, int] = {}
            used = set()
            for d, gi, i in sorted(pairs):
                if gi in slot_of_gt or i in used:
                    continue
                slot_of_gt[gi] = i
                used.add(i)
            gt_of_slot = {i: gi for gi, i in slot_of_gt.items()}

            for obj in tracked:
                slot = obj.last_detection.data
                st = tstate.setdefault(obj.id, _TrackState())
                st.n_obs += 1
                z = zs[t, slot]
                st.avg_z = (
                    z if st.avg_z is None
                    else ewma_weight * z + (1 - ewma_weight) * st.avg_z
                )
                gi = gt_of_slot.get(slot)
                if gi is not None:
                    st.gt_votes[gi] = st.gt_votes.get(gi, 0) + 1
                    quad = quads_t[gi]
                    err = float(
                        np.linalg.norm(corners[t, slot] - quad, axis=1).mean()
                    )
                    errf = float(np.linalg.norm(
                        np.roll(corners[t, slot], 2, axis=0) - quad, axis=1
                    ).mean())
                    if errf < err:
                        st.flip_votes += 1
                    if match_idx is not None and pipeline.store is not None:
                        stats.n_frame_obs += 1
                        ridx = int(match_idx[t, slot, 0])
                        if ridx < len(pipeline.store):
                            pid = pipeline.store._ids[ridx]
                            if pid == gt[gi][0].id:
                                stats.n_frame_top1 += 1
                        for kk in range(match_idx.shape[-1]):
                            ridx = int(match_idx[t, slot, kk])
                            if ridx < len(pipeline.store):
                                pid = pipeline.store._ids[ridx]
                                sc = float(match_scores[t, slot, kk])
                                st.match_votes[pid] = (
                                    st.match_votes.get(pid, 0.0) + max(sc, 0.0)
                                )

        # END of sequence: majority track per GT card, then fused scoring
        track_of_gt: dict[int, tuple[int, int]] = {}
        for tid, st in tstate.items():
            for gi, n in st.gt_votes.items():
                if gi not in track_of_gt or n > track_of_gt[gi][1]:
                    track_of_gt[gi] = (tid, n)
        for gi, (card, _) in enumerate(gt):
            stats.n_gt += 1
            hit = track_of_gt.get(gi)
            rec = {"card_id": card.id, "tracked": False}
            if hit is None or hit[1] < min_track_frames:
                if details is not None:
                    details.append(rec)
                continue
            st = tstate[hit[0]]
            stats.n_tracked += 1
            rec["tracked"] = True
            rec["n_obs"] = st.n_obs
            flip = st.flip_votes * 2 > st.gt_votes[gi]
            if flip:
                stats.n_flip += 1
            rec["flipped"] = bool(flip)
            if pipeline.store is not None and len(pipeline.store):
                pts = pipeline.store.query_nearby(st.avg_z, k=5,
                                                  with_payload=False)
                ids = [p.id for p in pts]
                if ids[:1] == [card.id]:
                    stats.n_top1_ewma += 1
                if card.id in ids[:5]:
                    stats.n_top5_ewma += 1
                rec["rank_ewma"] = ids.index(card.id) if card.id in ids else -1
                if st.match_votes:
                    best = max(st.match_votes.items(), key=lambda kv: kv[1])[0]
                    if best == card.id:
                        stats.n_top1_vote += 1
                    rec["vote_hit"] = bool(best == card.id)
            if details is not None:
                details.append(rec)
    return stats
