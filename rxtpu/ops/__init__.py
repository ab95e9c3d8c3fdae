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


def augment_passthrough(images, mean, std, key, crop_size=364, train=True,
                        **_kw):
    """'none' backend: images are already augmented+normalized NHWC views.

    Used by lockstep cross-framework parity runs (dev/parity_lockstep.py)
    that pre-generate identical view tensors for rxtpu and the torch
    mirror so the production train step can be driven on them directly.
    """
    return images


def get_augment_fn(backend: str = "shear"):
    """Train-time augmentation backend.

    'shear'  — gather-free Paeth 3-shear Pallas path (TPU speed-of-light;
               ~10x faster than 'gather', interior-equivalent bilinear)
    'gather' — direct one-pass bilinear warp (exact albumentations-style
               reference semantics; slow on TPU, fine on CPU)
    'none'   — passthrough: batch['images'] already holds normalized
               NHWC views (lockstep parity harness)
    """
    if backend == "shear":
        return augment_batch_shear
    if backend == "gather":
        return augment_batch
    if backend == "none":
        return augment_passthrough
    raise ValueError(f"unknown augment backend {backend!r}")
