"""Pure-JAX batched image & geometry kernels (TPU-first, NHWC, jittable).

Rebuilds the capabilities of the reference's OpenCV/numpy L0 layer
(mtgvision/util/image.py, mtgvision/util/cv2.py, mtgvision/od_datasets.py:29-118)
as batched, statically-shaped XLA programs with explicit jax.random keys.
"""

from mtgvision_tpu.ops.image import (  # noqa: F401
    img_clip,
    img_float32,
    img_uint8,
    flip_horr,
    flip_vert,
    resize,
    remove_border_resized,
    crop_to_size,
    round_rect_mask,
    rgba_over_rgb,
    rgb_mask_over_rgb,
    noise_speckle,
    noise_gaussian,
    noise_salt_pepper,
    noise_poisson,
)
from mtgvision_tpu.ops.warp import (  # noqa: F401
    affine_matrix,
    rotation_matrix_2d,
    translation_matrix_2d,
    scale_matrix_2d,
    shear_matrix_2d,
    perspective_from_quads,
    apply_transform_points,
    warp_affine,
    warp_perspective,
    warp_perspective_onto,
    rotate_bounded,
)
from mtgvision_tpu.ops.gather import take_rows  # noqa: F401
from mtgvision_tpu.ops.augment import fused_photometric  # noqa: F401
