from rxtpu.ops.warp import (  # noqa: F401
    augment_batch,
    center_crop_normalize_reference,
    reflect101,
    sample_affine_params,
)
from rxtpu.ops.pallas_norm import crop_normalize, eval_batch_normalize  # noqa: F401
from rxtpu.ops.shear import (  # noqa: F401
    augment_batch_shear,
    dihedral,
    decompose_angle,
    rotate_crop_normalize,
    shear_pass,
)


def get_augment_fn(backend: str = "shear"):
    """Train-time augmentation backend.

    'shear'  — gather-free Paeth 3-shear Pallas path (TPU speed-of-light;
               ~10x faster than 'gather', interior-equivalent bilinear)
    'gather' — direct one-pass bilinear warp (exact albumentations-style
               reference semantics; slow on TPU, fine on CPU)
    """
    if backend == "shear":
        return augment_batch_shear
    if backend == "gather":
        return augment_batch
    raise ValueError(f"unknown augment backend {backend!r}")
