"""BN-folded inference weights == standard eval forward.

rxtpu.infer.fold turns the eval graph into pure conv+bias / dense+bias
(reference inference workload, test.py:23-32). Folding is an exact
algebraic identity; these tests pin it numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rxtpu.infer.fold import fold_for_inference
from rxtpu.models.twosites import TwoSitesNN


def _model_and_vars(backbone="resnet50", dtype=jnp.float32, head="mlp", seed=0):
    model = TwoSitesNN(backbone=backbone, nb_classes=12, head=head, dtype=dtype)
    x0 = jnp.zeros((1, 3, 32, 32, 6), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x0, train=False)
    # randomize batch_stats so folding actually has something to fold
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.3 * np.abs(np.random.default_rng(1).normal(size=a.shape)).astype(a.dtype),
        variables["batch_stats"],
    )
    return model, variables["params"], stats


@pytest.mark.parametrize("backbone", ["resnet50", "resnet18"])
def test_folded_matches_eval_forward_f32(backbone):
    model, params, stats = _model_and_vars(backbone)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 3, 32, 32, 6)).astype(np.float32)
    )
    ref = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    fmodel, fvars = fold_for_inference(model, params, stats)
    out = fmodel.apply(fvars, x, train=False)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4 * max(1.0, scale)
    )


def test_folded_matches_eval_forward_bf16():
    model, params, stats = _model_and_vars(dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 3, 32, 32, 6)).astype(np.float32)
    )
    ref = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    fmodel, fvars = fold_for_inference(model, params, stats)
    out = fmodel.apply(fvars, x, train=False)
    # bf16 activations: folding changes rounding order; logits stay within
    # a few bf16 ulps of the unfolded eval forward
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=0.05 * max(1.0, scale)
    )


def test_folded_param_tree_has_no_bn():
    model, params, stats = _model_and_vars("resnet18")
    _, fvars = fold_for_inference(model, params, stats)
    flat = jax.tree_util.tree_flatten_with_path(fvars["params"])[0]
    keys = {"/".join(str(k) for k in path) for path, _ in flat}
    assert not any("BatchNorm" in k or "bn1" in k or "bn2" in k for k in keys)
    assert any("bias" in k for k in keys)  # convs carry the folded affine


def test_fold_rejects_unsupported():
    model, params, stats = _model_and_vars(head="arcface")
    with pytest.raises(ValueError):
        fold_for_inference(model, params, stats)
