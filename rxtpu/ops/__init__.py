from rxtpu.ops.warp import (  # noqa: F401
    augment_batch,
    center_crop_normalize_reference,
    reflect101,
    sample_affine_params,
)
from rxtpu.ops.pallas_norm import crop_normalize, eval_batch_normalize  # noqa: F401
