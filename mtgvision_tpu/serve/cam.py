"""Local webcam demo loop — od_cam parity (mtgvision/od_cam.py:104-161).

Captures 640×480 frames, runs the staged pipeline (detect → orient → dewarp →
embed → top-3 match), draws oriented quads + best-match names, shows with cv2.
Payload lookups are cached back into the store like ``get_nearby``
(od_cam.py:82-89). Exits on 'q'.
"""

from __future__ import annotations

import numpy as np


def run_cam(pipeline, store=None, camera: int = 0, size=(640, 480)):
    import cv2

    ctx_cache: dict[str, dict] = {}

    cap = cv2.VideoCapture(camera)
    cap.set(cv2.CAP_PROP_FRAME_WIDTH, size[0])
    cap.set(cv2.CAP_PROP_FRAME_HEIGHT, size[1])
    if not cap.isOpened():
        raise RuntimeError(f"camera {camera} not available")

    import jax.numpy as jnp

    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        # pad to square model input
        h, w = rgb.shape[:2]
        s = max(h, w)
        frame = np.zeros((s, s, 3), np.float32)
        frame[:h, :w] = rgb
        out = pipeline(jnp.asarray(frame)[None])
        valid = np.asarray(out["valid"][0])
        corners = np.asarray(out["corners"][0])
        match_idx = out["match_idx"]
        vis = bgr.copy()
        for i in np.where(valid)[0]:
            pts = corners[i].astype(np.int32)
            cv2.polylines(vis, [pts.reshape(-1, 1, 2)], True, (0, 255, 0), 2)
            cv2.line(vis, tuple(pts[0]), tuple(pts[1]), (0, 0, 255), 3)  # top edge
            if match_idx is not None and store is not None and len(store):
                ridx = int(np.asarray(match_idx[0, i, 0]))
                if ridx < len(store):
                    pid = store._ids[ridx]
                    payload = ctx_cache.get(pid) or store._payloads.get(pid) or {}
                    ctx_cache[pid] = payload
                    name = payload.get("name", pid)
                    cv2.putText(
                        vis, str(name), tuple(pts[0]),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.6, (255, 255, 0), 2,
                    )
        cv2.imshow("mtgvision-tpu", vis)
        if cv2.waitKey(1) & 0xFF == ord("q"):
            break
    cap.release()
    cv2.destroyAllWindows()


def main(argv=None):
    """python -m mtgvision_tpu.serve.cam --det <ckpt> --enc <ckpt> [--index <dir>]"""
    import argparse

    from mtgvision_tpu.serve.server import build_pipeline

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--det", default=None)
    ap.add_argument("--enc", default=None)
    ap.add_argument("--det-size", default="s")
    ap.add_argument("--enc-model", default="cnvnxt2ae_nano")
    ap.add_argument("--index", default=None, help="VectorStore save_to_dir path")
    ap.add_argument("--camera", type=int, default=0)
    args = ap.parse_args(argv)

    store = None
    if args.index:
        from mtgvision_tpu.index.store import VectorStore

        store = VectorStore.load_from_dir(args.index)
    pipe = build_pipeline(args.det, args.enc, args.det_size, args.enc_model, store)
    run_cam(pipe, store=store, camera=args.camera)


if __name__ == "__main__":
    main()
