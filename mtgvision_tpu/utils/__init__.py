from mtgvision_tpu.utils.files import (  # noqa: F401
    get_image_paths,
    imread_float,
    imwrite,
    init_dir,
)
from mtgvision_tpu.utils.random import (  # noqa: F401
    Applicator,
    ApplyChoice,
    ApplyOrdered,
    ApplyShuffled,
    ApplySome,
    Maybe,
    seed_all,
)
