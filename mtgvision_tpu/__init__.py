"""mtgvision_tpu — TPU-native rebuild of nmichlo/mtg-vision.

A real-time Magic: The Gathering card recognition framework, rebuilt from the
ground up for TPU hardware with JAX / XLA / Pallas / pjit:

- ``ops``      — pure-JAX batched image & geometry kernels (NHWC, float32/bf16)
- ``models``   — ConvNeXt-V2 encoder/decoder AE + YOLO-style seg detector (Flax)
- ``parallel`` — device-mesh / sharding helpers (pjit DP/TP over ICI)
- ``data``     — card catalog + batched synthetic data generators
- ``train``    — jitted train steps, metric losses, checkpointing, config CLI
- ``index``    — HBM-resident cosine top-k vector index (Qdrant replacement)
- ``infer``    — orientation recovery, dewarp, fused detect→embed→match graph
- ``track``    — Kalman multi-object tracker (host-side)
- ``serve``    — FastAPI websocket server compatible with the reference client
- ``eval``     — retrieval accuracy + throughput benchmarks

Reference parity: nmichlo/mtg-vision @ /root/reference (see SURVEY.md).
"""

__version__ = "0.1.0"
