from mtgvision_tpu.index.store import VectorStore, VectorPoint  # noqa: F401
