"""Live websocket serving — FastAPI-server parity on aiohttp.

Rebuild of mtgvision/server.py:
- ws ``/detect`` (:259-302): receive JPEG bytes → decode RGB → TrackerCtx
  update → JSON reply {detections, server_process_time,
  server_process_period, server_recv_im_bytes, server_send_im_bytes},
- ``TrackerCtx`` (:85-205): tracker over oriented card quads, per-track
  throttled heavy path every ``update_wait_sec=0.5`` (embed → EWMA z w=0.1 →
  top-3 index query), JPEG q50 base64 crop thumbnails (:222-225),
- sha256-seeded track colors (:213-219),
- ``TrackedData.to_dict`` wire format (:59-82) — byte-compatible with the
  reference web client (www/src/types.ts:262-306),
- static mount of a built web client dir (:306-310).

FastAPI isn't in this image; aiohttp provides the identical ws + static
surface. Per-frame compute runs through the staged FramePipeline — detect +
orient + dewarp happen on-device in one dispatch, instead of the reference's
CoreML → shapely → CoreML → HTTP chain.
"""

from __future__ import annotations

import base64
import hashlib
import json
import pathlib
import time
from typing import Optional

import numpy as np


def get_color(seed) -> str:
    """Stable per-track color from sha256 (server.py:213-219)."""
    h = int(hashlib.sha256(str(seed).encode()).hexdigest(), 16)
    return f"#{(h >> 16) & 0xFF:02x}{(h >> 8) & 0xFF:02x}{h & 0xFF:02x}"


def encode_rgb_im(rgb_im: np.ndarray, quality: int = 50) -> str:
    """float RGB [0,1] → base64 JPEG (server.py:222-225), native libjpeg path."""
    from mtgvision_tpu.utils.native import encode_jpeg

    u8 = (np.clip(rgb_im, 0, 1) * 255).astype(np.uint8)
    return base64.b64encode(encode_jpeg(u8, quality)).decode("utf-8")


def _host_thumb(frame: np.ndarray, quad: np.ndarray, pad: float = 0.04) -> np.ndarray:
    """Axis-aligned crop of the oriented quad from the host-side frame —
    the serving thumbnail (the reference sends the dewarped crop,
    server.py:222-225; the bbox crop avoids fetching device crop tensors)."""
    h, w = frame.shape[:2]
    lo = quad.min(0)
    hi = quad.max(0)
    c = (hi - lo) * pad
    x0, y0 = np.maximum(0, (lo - c)).astype(int)
    x1, y1 = np.minimum([w - 1, h - 1], (hi + c)).astype(int)
    if x1 <= x0 or y1 <= y0:
        return np.zeros((8, 8, 3), np.float32)
    t = frame[y0:y1, x0:x1]
    return t.astype(np.float32) / 255.0 if t.dtype == np.uint8 else t


class TrackedData:
    """Per-track state + wire dict (server.py:43-82)."""

    def __init__(self, track_id: int):
        self.id = track_id
        self.color = get_color(track_id)
        self.last_update_time = time.time()
        self.corners: Optional[np.ndarray] = None  # fresh oriented quad
        self.points_est: Optional[np.ndarray] = None  # smoothed tracker quad
        self.polygon: Optional[np.ndarray] = None  # raw mask outline (N,2)
        self.score: float = 0.0
        self.crop_encoded: Optional[str] = None
        self.avg_z: Optional[np.ndarray] = None
        self.matches: list[dict] = []

    def to_dict(self) -> dict:
        """Reference wire fields (server.py:59-82) with DISTINCT geometry:
        ``points`` = tracker-estimate corner quad, ``polygon`` = raw mask
        contour (masks.xy equivalent), ``polygon_closed`` = oriented closed
        card quad — the reference sends raw vs buffer-closed polygons."""
        quad = self.corners.tolist() if self.corners is not None else []
        est = self.points_est.tolist() if self.points_est is not None else quad
        return {
            "id": str(self.id),
            "points": est,
            "polygon": self.polygon.tolist() if self.polygon is not None else quad,
            "polygon_closed": quad,
            "color": self.color,
            "img": self.crop_encoded,
            "score": self.score,
            "matches": self.matches,
        }


class TrackerCtx:
    """Per-connection pipeline + tracker context (server.py:85-205)."""

    def __init__(
        self,
        pipeline,  # infer.pipeline.FramePipeline
        store=None,
        catalog=None,
        update_wait_sec: float = 0.5,
        ewma_weight: float = 0.1,
        top_k: int = 3,
    ):
        from mtgvision_tpu.track.tracker import Tracker

        self.pipeline = pipeline
        self.store = store if store is not None else pipeline.store
        self.catalog = catalog
        self.update_wait_sec = update_wait_sec
        self.ewma_weight = ewma_weight
        self.top_k = top_k
        self.tracker = Tracker(
            distance_threshold=300, hit_counter_max=5,
            initialization_delay=2, past_detections_length=10,
        )
        self.tracked_data: dict[int, TrackedData] = {}

    def update(self, rgb_frame: np.ndarray) -> list[TrackedData]:
        """Single-connection path: one batch-1 dispatch + ingest. Batched
        serving (serve.batcher.FrameBatcher) calls ``ingest`` directly with
        its slice of a shared multi-connection dispatch."""
        import jax.numpy as jnp

        out = self.pipeline(jnp.asarray(rgb_frame, jnp.float32)[None])
        out0 = {
            k: np.asarray(out[k])[0]
            for k in ("valid", "corners", "det_scores", "z",
                      "match_scores", "match_idx")
            if out.get(k) is not None
        }
        out0["masks_u8"] = np.asarray(
            (out["masks"][0] * 255.0).astype(jnp.uint8)
        )
        return self.ingest(out0, rgb_frame)

    def ingest(self, out0: dict, frame: np.ndarray) -> list[TrackedData]:
        """Tracker + EWMA + match bookkeeping from ONE frame's pipeline
        outputs (host numpy). Separated from the dispatch so the
        cross-connection FrameBatcher can share one device program among
        connections while each keeps its own tracker state."""
        from mtgvision_tpu.track.tracker import Detection

        valid = out0["valid"]
        corners = out0["corners"]
        scores = out0["det_scores"]
        # batched dispatches ship z as f16 (batcher wire thinning); EWMA
        # accumulates in f32
        zs = np.asarray(out0["z"], np.float32)
        masks = out0["masks_u8"]  # (D, H/4, W/4) sigmoid × 255 as uint8
        mask_scale = frame.shape[0] / masks.shape[1]

        detections = [
            Detection(points=corners[i], data=i) for i in range(len(valid)) if valid[i]
        ]
        tracked = self.tracker.update(detections)

        now = time.time()
        objs = []
        for obj in tracked:
            slot = obj.last_detection.data
            trk = self.tracked_data.get(obj.id)
            if trk is None:
                trk = TrackedData(obj.id)
                self.tracked_data[obj.id] = trk
            trk.corners = corners[slot]
            trk.points_est = obj.estimate  # smoothed tracker quad (norfair parity)
            trk.score = float(scores[slot])
            # throttled heavy path: EWMA embed + index query (server.py:178-202).
            # The q50 crop thumbnail rides the SAME throttle — the reference
            # re-encodes it every frame (server.py:222-225), which at batched
            # throughput makes host JPEG encode the serving bottleneck; the
            # client only needs it when the match display refreshes anyway.
            if now - trk.last_update_time > self.update_wait_sec or trk.avg_z is None:
                # raw mask outline at frame scale (reference: masks.xy
                # polygon). Rides the SAME throttle as the thumbnail/match:
                # the marching-squares contour is the dominant per-track host
                # cost (~ms each), and at batched-serving rates per-frame
                # contours saturate the host while the client already gets
                # the smoothed tracker quad every frame — the outline only
                # refreshes the decorative mask overlay.
                from mtgvision_tpu.ops.polygon import mask_contour

                trk.polygon = (
                    mask_contour(masks[slot].astype(np.float32) / 255.0)
                    * mask_scale
                )
                # thumbnail from the HOST-side frame (axis-aligned bbox of
                # the oriented quad): the device crop tensor is ~19 MB per
                # batched dispatch and dominated serving time when fetched
                # over tunneled TPUs; the frame is already on host
                trk.crop_encoded = encode_rgb_im(_host_thumb(frame, corners[slot]))
                z = zs[slot]
                if trk.avg_z is None:
                    trk.avg_z = z
                trk.avg_z = self.ewma_weight * z + (1 - self.ewma_weight) * trk.avg_z
                trk.matches = []
                if self.store is not None and len(self.store):
                    for p in self.store.query_nearby(trk.avg_z, k=self.top_k):
                        payload = p.payload or {}
                        trk.matches.append(
                            {
                                "id": str(p.id),
                                "score": p.score,
                                "name": payload.get("name"),
                                "set_name": payload.get("set_name", payload.get("set")),
                                "set_code": payload.get("set", payload.get("set_code")),
                                "img_uri": payload.get("img_uri"),
                                "all_data": payload,
                            }
                        )
                trk.last_update_time = now
            objs.append(trk)
        return objs


def make_app(ctx_factory, static_dir: str | pathlib.Path | None = None,
             batcher=None):
    """aiohttp app with ws /detect + optional static mount (server.py:254-310).

    ``batcher`` (serve.batcher.FrameBatcher): when given, every connection's
    frames are aggregated into shared pipeline dispatches (batch economics of
    bench.py instead of batch-1 per message); each connection keeps its own
    TrackerCtx for tracker/EWMA state. Frames are submitted as uint8 — the
    pipeline's bf16 ingest path halves the frame-upload bandwidth vs f32.
    """
    from aiohttp import WSMsgType, web

    async def detect_ws(request):
        from mtgvision_tpu.utils.native import decode_jpeg

        ws = web.WebSocketResponse(max_msg_size=16 * 1024 * 1024)
        await ws.prepare(request)
        ctx = ctx_factory()
        times = [time.time(), time.time()]
        async for msg in ws:
            if msg.type != WSMsgType.BINARY:
                if msg.type == WSMsgType.ERROR:
                    break
                continue
            t1 = time.time()
            try:
                rgb = decode_jpeg(msg.data)  # native libjpeg
            except ValueError:
                continue  # skip undecodable frames (server.py:275-276)
            if batcher is not None:
                out0 = await batcher.submit(rgb)
                objs = ctx.ingest(out0, rgb)
            else:
                frame = rgb.astype(np.float32) / 255.0
                objs = ctx.update(frame)
            response = {
                "detections": [o.to_dict() for o in objs],
                "server_process_time": time.time() - t1,
                "server_process_period": times[1] - times[0],
                "server_recv_im_bytes": len(msg.data),
                "server_send_im_bytes": sum(
                    len(o.crop_encoded) for o in objs if o.crop_encoded
                ),
            }
            await ws.send_json(response)
            times = [times[1], time.time()]
        return ws

    app = web.Application()
    app.router.add_get("/detect", detect_ws)
    if static_dir is not None and pathlib.Path(static_dir).exists():
        index = pathlib.Path(static_dir) / "index.html"
        if index.exists():
            async def root(_):
                return web.FileResponse(index)

            app.router.add_get("/", root)
        app.router.add_static("/", static_dir, show_index=True)
    return app


DEFAULT_STATIC = pathlib.Path(__file__).resolve().parents[2] / "www"


def build_pipeline(
    det_ckpt: str | None = None,
    enc_ckpt: str | None = None,
    det_size: str = "s",
    enc_model: str = "cnvnxt2ae_nano",
    store=None,
    orient_head_ckpt: str | None = None,
    refine_head_ckpt: str | None = None,
    refine_redewarp: bool = False,
    refine_iters: int = 1,
    refine_head_flip: bool = True,
    layout: str = "3prog",
    score_thresh: float = 0.25,
    sel_redewarp: int = 0,
    flip_vote_m: int = 1,
    dewarp_window: int = 192,
):
    """FramePipeline from checkpoints (trained serving) or random weights
    (smoke runs). Checkpoint dirs accept slim exports or train ckpt dirs
    (eval/system.py loaders)."""
    import jax
    import jax.numpy as jnp

    from mtgvision_tpu.infer.pipeline import FramePipeline
    from mtgvision_tpu.models.convnextv2ae import AE_SIZES, ConvNeXtV2Encoder
    from mtgvision_tpu.models.yolo import YoloSeg

    if det_ckpt:
        from mtgvision_tpu.eval.system import load_detector

        det, det_vars = load_detector(det_ckpt, size=det_size)
    else:
        det = YoloSeg(num_classes=1, size=det_size, dtype=jnp.bfloat16)
        det_vars = jax.jit(det.init, static_argnums=2)(
            jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)), False
        )
    if enc_ckpt:
        from mtgvision_tpu.eval.system import load_encoder

        enc, enc_vars = load_encoder(enc_ckpt, model_name=enc_model)
    else:
        enc = ConvNeXtV2Encoder(
            image_hw=(192, 128), z_size=768, head_type="conv+linear",
            dtype=jnp.bfloat16, **AE_SIZES["nano"],
        )
        enc_vars = {
            "params": jax.jit(enc.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 192, 128, 3))
            )["params"]
        }
    head = head_vars = None
    if orient_head_ckpt:
        # trained pixel-space orientation head → single encoder pass
        # (models/orient_head.py); without it the pipeline embeds both
        # orientations and lets the index match disambiguate
        from mtgvision_tpu.eval.system import _restore_tree
        from mtgvision_tpu.models.orient_head import OrientHead

        head = OrientHead()
        head_vars = {"params": _restore_tree(orient_head_ckpt)["params"]}
    rhead = rhead_vars = None
    if refine_head_ckpt:
        # learned corner offsets + flip (models/refine_head.py) — the
        # production path: supersedes the orient head AND the dual-
        # orientation fallback, and lifts corners off the proto grid
        from mtgvision_tpu.eval.system import _restore_tree
        from mtgvision_tpu.models.refine_head import RefineHead

        rhead = RefineHead()
        rhead_vars = {"params": _restore_tree(refine_head_ckpt)["params"]}
    return FramePipeline(
        det, det_vars, enc, enc_vars, store=store,
        orient_head=head, orient_head_vars=head_vars,
        refine_head=rhead, refine_head_vars=rhead_vars,
        refine_redewarp=refine_redewarp, refine_iters=refine_iters,
        refine_head_flip=refine_head_flip,
        sel_redewarp=sel_redewarp, flip_vote_m=flip_vote_m,
        dewarp_window=dewarp_window,
        layout=layout, score_thresh=score_thresh,
    )


def main(argv=None):
    """Serve the trained system:

    python -m mtgvision_tpu.serve.server --det artifacts_r1/det_v2 \
        --enc artifacts_r1/enc_v2 --index <store dir from populate>
    """
    import argparse

    from aiohttp import web

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--static-dir", default=str(DEFAULT_STATIC))
    ap.add_argument("--det", default=None, help="detector checkpoint dir")
    ap.add_argument("--enc", default=None, help="encoder checkpoint dir")
    ap.add_argument("--det-size", default="s")
    ap.add_argument("--enc-model", default="cnvnxt2ae_nano")
    ap.add_argument("--index", default=None, help="VectorStore save_to_dir path")
    ap.add_argument("--orient-head", default=None, help="OrientHead ckpt dir")
    ap.add_argument("--refine-head", default=None, help="RefineHead ckpt dir")
    ap.add_argument("--refine-redewarp", default="n", choices=("y", "n"),
                    help="re-dewarp off refined corners before embedding "
                    "(helps occluded cards; ~+7 ms / 64 crops)")
    ap.add_argument("--refine-iters", type=int, default=1,
                    help="refine head passes (>1 needs --refine-redewarp y)")
    ap.add_argument("--sel-redewarp", type=int, default=0,
                    help="re-dewarp + second refine pass on only the N "
                    "highest-offset slots per frame before embedding")
    ap.add_argument("--flip-vote-m", type=int, default=1,
                    help="flip-aware orientation from a score-weighted vote "
                    "over the top-M candidates' halves (1 = rank-0 only)")
    ap.add_argument("--dewarp-window", type=int, default=192,
                    help="two-pass dewarp window px (cost ~window^2)")
    ap.add_argument("--refine-head-flip", default="y", choices=("y", "n"),
                    help="y: the head's flip logit decides orientation "
                    "(single encoder pass); n: dual-orientation embedding + "
                    "index match decides (2x encoder)")
    ap.add_argument("--layout", default="3prog",
                    choices=("3prog", "2prog", "fused"),
                    help="frame program layout (see FramePipeline.layout); "
                    "bench.py reports which is fastest on the deployment")
    ap.add_argument("--score-thresh", type=float, default=0.15,
                    help="detector confidence floor (0.15 = the calibrated "
                    "r4 serving value; see eval_protocols_r4.sh)")
    ap.add_argument("--serve-batch", type=int, default=16,
                    help="max cross-connection dispatch batch (FrameBatcher "
                    "ladder 1/4/…/N compiles lazily; 0 = legacy batch-1 per "
                    "connection)")
    ap.add_argument("--batch-wait-ms", type=float, default=8.0,
                    help="micro-batch collection deadline after the first "
                    "pending frame")
    args = ap.parse_args(argv)
    if args.refine_iters > 1 and args.refine_redewarp != "y":
        ap.error("--refine-iters > 1 requires --refine-redewarp y")

    store = None
    if args.index:
        from mtgvision_tpu.index.store import VectorStore

        store = VectorStore.load_from_dir(args.index)
    pipe = build_pipeline(
        args.det, args.enc, args.det_size, args.enc_model, store,
        orient_head_ckpt=args.orient_head,
        refine_head_ckpt=args.refine_head,
        refine_redewarp=args.refine_redewarp == "y",
        refine_iters=args.refine_iters,
        refine_head_flip=args.refine_head_flip == "y",
        sel_redewarp=args.sel_redewarp, flip_vote_m=args.flip_vote_m,
        dewarp_window=args.dewarp_window,
        layout=args.layout, score_thresh=args.score_thresh,
    )
    batcher = None
    if args.serve_batch > 0:
        from mtgvision_tpu.serve.batcher import FrameBatcher

        batcher = FrameBatcher(
            pipe, max_batch=args.serve_batch, max_wait_ms=args.batch_wait_ms
        )
    app = make_app(
        lambda: TrackerCtx(pipe), pathlib.Path(args.static_dir), batcher=batcher
    )
    web.run_app(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
