from mtgvision_tpu.eval.validate import Stat, validate_retrieval  # noqa: F401
