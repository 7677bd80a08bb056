"""Model export + deploy-format inference wrappers.

Replaces the reference's CoreML path (mtgvision/encoder_export.py:38-134:
Lightning ckpt → torch.jit.trace → coremltools `.mlpackage`, plus
CoreMlEncoder/CoreMlDecoder predict wrappers; mtgvision/od_export.py:163-176
onnx/coreml detector export). The TPU deploy format is:

- ``params.ckpt``   — orbax-saved param pytree,
- ``model.stablehlo`` — serialized jax.export artifact of the jitted forward
  (portable, version-checked XLA program),
- ``meta.json``     — shapes/dtypes/config so a runtime can rebuild the call.

``Encoder`` / ``Decoder`` mirror CoreMlEncoder/CoreMlDecoder
(encoder_export.py:85-127): ``predict(img_hwc float32[0,1]) → (768,)`` and
``predict(z) → x_hat``, with ``input_hwc`` introspection (:104-110).
``CardSegmenter`` mirrors od_export.py:141-160 returning per-instance
records with oriented corners + dewarp helpers.
"""

from __future__ import annotations

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _save_artifacts(out_dir, params, fn, example_args, meta: dict):
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    ocp.PyTreeCheckpointer().save(
        (out / "params.ckpt").resolve(), jax.device_get(params)
    )
    try:
        from jax import export as jexport

        exported = jexport.export(jax.jit(fn))(*example_args)
        (out / "model.stablehlo").write_bytes(exported.serialize())
        meta["stablehlo"] = True
    except Exception as e:  # serialization is best-effort; params are canonical
        meta["stablehlo"] = False
        meta["stablehlo_error"] = str(e)[:200]
    (out / "meta.json").write_text(json.dumps(meta))
    return out


def export_encoder(params, model, out_dir, batch: int = 1):
    """Encoder → deploy dir (encoder_export.py:59-63 equivalent)."""
    h, w = model.image_hw

    def fwd(x):
        return model.apply({"params": params}, x)

    x = jnp.zeros((batch, h, w, 3), jnp.float32)
    return _save_artifacts(
        out_dir, params, fwd, (x,),
        {"kind": "encoder", "input_hwc": [h, w, 3], "z_size": model.z_size,
         "io": {"x": [batch, h, w, 3], "z": [batch, model.z_size]}},
    )


def export_decoder(params, model, out_dir, batch: int = 1):
    """Decoder → deploy dir (encoder_export.py:64-68)."""

    def fwd(z):
        return model.apply({"params": params}, z)

    z = jnp.zeros((batch, model.z_size), jnp.float32)
    h, w = model.image_hw
    return _save_artifacts(
        out_dir, params, fwd, (z,),
        {"kind": "decoder", "z_size": model.z_size, "io": {"z": [batch, model.z_size],
         "x_hat": [batch, h, w, 3]}},
    )


def export_detector(variables, model, out_dir, img_hw=(640, 640), batch: int = 1):
    """Detector → deploy dir (od_export.py:163-176 equivalent)."""

    def fwd(x):
        return model.apply(variables, x)

    x = jnp.zeros((batch, *img_hw, 3), jnp.float32)
    return _save_artifacts(
        out_dir, variables, fwd, (x,),
        {"kind": "detector", "img_hw": list(img_hw), "size": model.size,
         "num_classes": model.num_classes},
    )


class Encoder:
    """CoreMlEncoder-parity inference wrapper (encoder_export.py:85-110)."""

    def __init__(self, model, params=None, path: str | pathlib.Path | None = None):
        self.model = model
        if params is None:
            assert path is not None
            params = ocp.PyTreeCheckpointer().restore(
                (pathlib.Path(path) / "params.ckpt").resolve()
            )
        self.params = params
        self._fn = jax.jit(lambda x: model.apply({"params": self.params}, x))

    @property
    def input_hwc(self) -> tuple[int, int, int]:
        h, w = self.model.image_hw
        return (h, w, 3)

    def predict(self, rgb_im_hwc: np.ndarray) -> np.ndarray:
        """(H,W,3) float32 [0,1] → (z_size,) embedding (encoder_export.py:91-102)."""
        assert rgb_im_hwc.ndim == 3 and rgb_im_hwc.shape[-1] == 3
        z = self._fn(jnp.asarray(rgb_im_hwc)[None])
        return np.asarray(z[0])

    def predict_batch(self, rgb_nhwc: np.ndarray) -> np.ndarray:
        return np.asarray(self._fn(jnp.asarray(rgb_nhwc)))


class Decoder:
    """CoreMlDecoder-parity wrapper (encoder_export.py:113-127)."""

    def __init__(self, model, params=None, path=None):
        self.model = model
        if params is None:
            params = ocp.PyTreeCheckpointer().restore(
                (pathlib.Path(path) / "params.ckpt").resolve()
            )
        self.params = params
        self._fn = jax.jit(lambda z: model.apply({"params": self.params}, z))

    def predict(self, z: np.ndarray) -> np.ndarray:
        assert z.ndim == 1
        x = self._fn(jnp.asarray(z)[None])
        return np.asarray(x[0])


class InstanceSeg:
    """Per-detection record — od_export.py:18-138 parity surface: oriented
    corner quad, confidence, dewarp + debug-draw helpers. Corners are already
    computed on device (infer/orient.py) instead of lazily via shapely."""

    def __init__(self, corners_xy: np.ndarray, conf: float, box: np.ndarray, mask=None):
        self.corners = np.asarray(corners_xy, np.float32)  # (4,2) TL,TR,BR,BL
        self.conf = float(conf)
        self.box = np.asarray(box, np.float32)
        self.mask = mask

    @property
    def points(self) -> np.ndarray:
        return self.corners

    def extract_dewarped(self, frame: np.ndarray, out_hw=(192, 128)) -> np.ndarray:
        from mtgvision_tpu.infer.orient import extract_dewarped

        return np.asarray(
            extract_dewarped(jnp.asarray(frame), jnp.asarray(self.corners), out_hw)
        )

    def debug_draw_on(self, frame: np.ndarray, color=(0, 1, 0)) -> np.ndarray:
        """Draw the oriented quad + top edge marker (od_export.py:113-138)."""
        out = np.array(frame, copy=True)
        pts = self.corners.astype(int)
        for i in range(4):
            a, b = pts[i], pts[(i + 1) % 4]
            _draw_line(out, a, b, color if i != 0 else (1, 0, 0))  # top edge red
        return out


def _draw_line(img, a, b, color):
    n = int(max(abs(b[0] - a[0]), abs(b[1] - a[1]), 1))
    xs = np.linspace(a[0], b[0], n).astype(int)
    ys = np.linspace(a[1], b[1], n).astype(int)
    ok = (xs >= 0) & (xs < img.shape[1]) & (ys >= 0) & (ys < img.shape[0])
    img[ys[ok], xs[ok]] = color


class CardSegmenter:
    """CardSegmenter-parity facade (od_export.py:141-160): __call__(frame) →
    list[InstanceSeg], backed by the jitted detect+orient stages."""

    def __init__(self, model, variables, max_det: int = 8, score_thresh: float = 0.25):
        from mtgvision_tpu.infer.orient import orient_batch
        from mtgvision_tpu.models.yolo import detect as _detect

        self.model = model
        self.variables = variables
        self.max_det = max_det
        self.score_thresh = score_thresh
        self._detect = jax.jit(
            lambda v, im: _detect(v, model, im, max_det=max_det, score_thresh=score_thresh)
        )
        self._orient = jax.jit(orient_batch)

    def __call__(self, frame: np.ndarray) -> list[InstanceSeg]:
        h = frame.shape[0]
        boxes, scores, classes, masks, valid = self._detect(
            self.variables, jnp.asarray(frame)[None]
        )
        corners, ok = self._orient(masks[0] > 0.5)
        scale = h / masks.shape[2]
        out = []
        for i in range(self.max_det):
            if bool(valid[0, i]) and bool(ok[i]):
                out.append(
                    InstanceSeg(
                        np.asarray(corners[i]) * scale,
                        float(scores[0, i]),
                        np.asarray(boxes[0, i]),
                        mask=np.asarray(masks[0, i]),
                    )
                )
        return out
