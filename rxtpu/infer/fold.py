"""Fold eval-mode BatchNorm into conv/dense weights for inference.

Eval-mode BN is a per-channel affine ``y = x*mul + add`` with
``mul = scale/sqrt(var+eps)``, ``add = bias - mean*mul`` — constants once
training is done. For the reference inference workload
(``cell_classifier/test.py:23-32``: eval forward + softmax) the whole
normalization can therefore vanish into the adjacent weights:

- ResNet pattern (conv THEN bn, ``models.py:16`` via torchvision):
  ``bn(conv(x, W)) == conv(x, W*mul) + add`` — fold ``mul`` into the conv
  kernel's output channels and emit ``add`` as a conv bias.
- MLP-head pattern (bn THEN dense, ``models.py:31-39``):
  ``dense(bn(x)) == x @ (mul[:,None]*K) + (add@K + b)`` — fold ``mul``
  into the kernel's input rows and absorb ``add`` into the dense bias.

The result is an eval graph of pure conv+bias / dense+bias / relu /
pool ops: no BN reads, fewer kernels for XLA to schedule, and the form
the MXU consumes directly. Folding runs once (jit-able, tiny) and is
exact in f32 up to float associativity; ``tests/test_fold.py`` pins
folded == unfolded logits.

DenseNet is NOT foldable this way (its BN precedes convs whose zero
padding must stay zero AFTER normalization); use the standard eval path.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

EPS = 1e-5


def _affine(bn_p: Dict[str, Any], bn_s: Dict[str, Any]):
    mul = bn_p["scale"].astype(jnp.float32) / jnp.sqrt(
        bn_s["var"].astype(jnp.float32) + EPS
    )
    add = bn_p["bias"].astype(jnp.float32) - bn_s["mean"].astype(jnp.float32) * mul
    return mul, add


def _fold_conv_bn(conv_p, bn_p, bn_s):
    """conv (no bias) followed by BN -> conv with bias. Kernel is HWIO."""
    mul, add = _affine(bn_p, bn_s)
    k = conv_p["kernel"]
    return {"kernel": (k.astype(jnp.float32) * mul).astype(k.dtype),
            "bias": add}


_PAIRS = (("conv_init", "bn_init"), ("conv_proj", "norm_proj"))


def fold_resnet_params(
    params: Dict[str, Any], batch_stats: Dict[str, Any]
) -> Dict[str, Any]:
    """Fold a (possibly nested) ResNet backbone tree: every ``Conv_i`` /
    ``BatchNorm_i`` pair plus the stem and projection pairs."""
    out: Dict[str, Any] = {}
    for key, sub in params.items():
        if key.startswith("Conv_"):
            bn = key.replace("Conv_", "BatchNorm_")
            out[key] = _fold_conv_bn(sub, params[bn], batch_stats[bn])
        elif key.startswith("BatchNorm_"):
            continue
        else:
            matched = False
            for ck, bk in _PAIRS:
                if key == ck:
                    out[key] = _fold_conv_bn(sub, params[bk], batch_stats[bk])
                    matched = True
                elif key == bk:
                    matched = True
            if not matched:
                # a nested scope (stageN_blockM)
                out[key] = fold_resnet_params(sub, batch_stats.get(key, {}))
    return out


def fold_mlp_head_params(
    params: Dict[str, Any], batch_stats: Dict[str, Any]
) -> Dict[str, Any]:
    """bn1 -> fc1 and bn2 -> fc2 folded on the dense INPUT side."""
    out = {}
    for bn, fc in (("bn1", "fc1"), ("bn2", "fc2")):
        mul, add = _affine(params[bn], batch_stats[bn])
        k = params[fc]["kernel"]
        kf = k.astype(jnp.float32)
        out[fc] = {
            "kernel": (mul[:, None] * kf).astype(k.dtype),
            "bias": (add @ kf + params[fc]["bias"].astype(jnp.float32)),
        }
    return out


def foldable(model) -> bool:
    """True when BN folding supports this model configuration."""
    return (
        str(getattr(model, "backbone", "")).startswith("resnet")
        and getattr(model, "head", None) == "mlp"
    )


def fold_variables(params, batch_stats) -> Dict[str, Any]:
    """The weight tree a ``folded=True`` model consumes. jit-traceable —
    called inside the predict/eval steps, it costs one extra pass over the
    weights (~0.1 ms) and removes every BN op from the forward."""
    return {
        "params": {
            "backbone": fold_resnet_params(
                params["backbone"], batch_stats["backbone"]),
            "head": fold_mlp_head_params(params["head"], batch_stats["head"]),
        }
    }


def fold_for_inference(model, params, batch_stats) -> Tuple[Any, Dict[str, Any]]:
    """(TwoSitesNN, params, batch_stats) -> (folded_model, folded_variables).

    Returns a ``folded=True`` clone of the model plus the weight tree it
    consumes. Only resnet backbones + the mlp head fold; anything else
    raises (callers fall back to the standard eval path).
    """
    if not str(model.backbone).startswith("resnet"):
        raise ValueError(f"BN folding supports resnet backbones, got {model.backbone!r}")
    if model.head != "mlp":
        raise ValueError(f"BN folding supports the mlp head, got {model.head!r}")
    return model.clone(folded=True, fuse_blocks=False), fold_variables(
        params, batch_stats
    )
