from mtgvision_tpu.infer.orient import (  # noqa: F401
    extract_dewarped,
    orient_batch,
    orient_corners,
)
from mtgvision_tpu.infer.pipeline import FramePipeline  # noqa: F401
