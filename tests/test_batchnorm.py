"""FusedBatchNorm (the retired one-pass fused BN, rxtpu/ops/batchnorm.py).

Not wired into production models (measured dead end, OPTIMIZATION.md),
but kept available for fused-block experiments — so its math stays
pinned: custom-VJP forward/backward vs plain autodiff, and the SyncBN
(axis_name) path's cross-replica variance, which must include the
between-replica mean-spread term (E[x^2]-combine, not pmean of vars).
Reference semantics: torch BatchNorm2d defaults inside resnet50
(/root/reference/cell_classifier/models.py:16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rxtpu.ops.batchnorm import FusedBatchNorm, bn_train_apply


def _ref_bn(x, scale, bias, eps=1e-5):
    axes = tuple(range(x.ndim - 1))
    m = x.mean(axes)
    v = jnp.square(x - m).mean(axes)
    return (x - m) * jax.lax.rsqrt(v + eps) * scale + bias


def test_bn_train_apply_forward_and_grads_match_autodiff():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(1.0, 2.0, (8, 5, 16)), jnp.float32)
    scale = jnp.asarray(rng.normal(1.0, 0.2, 16), jnp.float32)
    bias = jnp.asarray(rng.normal(0.0, 0.2, 16), jnp.float32)

    y, mean, var = bn_train_apply(x, scale, bias, 1e-5)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_ref_bn(x, scale, bias)),
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x.mean((0, 1))),
                               rtol=1e-6, atol=1e-6)

    def loss_fused(x, s, b):
        return jnp.sum(jnp.sin(bn_train_apply(x, s, b, 1e-5)[0]))

    def loss_ref(x, s, b):
        return jnp.sum(jnp.sin(_ref_bn(x, s, b)))

    g_fused = jax.grad(loss_fused, (0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(loss_ref, (0, 1, 2))(x, scale, bias)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-5)


def test_syncbn_variance_includes_mean_spread():
    """Cross-replica var must be E[x^2]-combined, not pmean of local vars.

    Two replicas with very different local means: pmean-of-vars would
    normalize with the small within-replica variance and blow activations
    up; the correct global-batch moments keep them standardized.
    """
    n_dev = 2
    rng = np.random.default_rng(0)
    # replica 0 centered at 0, replica 1 centered at 10; local std 1
    local = rng.normal(0.0, 1.0, (n_dev, 16, 4)).astype(np.float32)
    local[1] += 10.0
    x = jnp.asarray(local)

    # momentum explicit: the test pins variance COMBINATION, not the
    # class's default momentum
    bn = FusedBatchNorm(use_running_average=False, axis_name="batch",
                        momentum=0.99)
    variables = bn.init(jax.random.PRNGKey(0), x[0])

    def apply(xs):
        y, mut = bn.apply(variables, xs, mutable=["batch_stats"])
        return y, mut["batch_stats"]

    y, stats = jax.pmap(apply, axis_name="batch",
                        devices=jax.devices()[:n_dev])(x)

    flat = np.asarray(y).reshape(-1, 4)
    glob = local.reshape(-1, 4)
    expect = (glob - glob.mean(0)) / np.sqrt(glob.var(0) + 1e-5)
    np.testing.assert_allclose(flat, expect, rtol=1e-4, atol=1e-4)

    # running_var update saw the global-batch variance (~26 here), not
    # the within-replica ~1
    v = np.asarray(stats["var"][0])
    gv = glob.var(0)
    m = 0.99
    np.testing.assert_allclose(v, m * 1.0 + (1 - m) * gv, rtol=1e-3)
