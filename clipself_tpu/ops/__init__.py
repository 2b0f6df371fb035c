from clipself_tpu.ops.interpolate import (  # noqa: F401
    resize_2d,
    resize_weight_matrix,
)
from clipself_tpu.ops.roi_align import roi_align_1x1  # noqa: F401
from clipself_tpu.ops.mask_pool import mask_pool  # noqa: F401
