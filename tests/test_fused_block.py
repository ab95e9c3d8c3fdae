"""Parity tests: fused Pallas bottleneck vs the standard flax composition.

The fused block must be a drop-in for BottleneckBlock in train mode
(reference Bottleneck semantics via torchvision, models.py:16): identical
variable tree, matching forward/batch-stats, and gradients within bf16
rounding. Runs in Pallas interpret mode on CPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from rxtpu.models.fused import FusedBottleneckBlock
from rxtpu.models.resnet import BottleneckBlock, ResNet
from rxtpu.ops.fused_block import bottleneck_fused, pad_pixels, plan_block


def _std_block(filters):
    conv = functools.partial(
        nn.Conv, use_bias=False, dtype=jnp.bfloat16, param_dtype=jnp.float32,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
    )
    from rxtpu.models.norm import BatchNorm

    # folded_apply: mirror the fused kernels' exact bf16 BN-application
    # rounding (x*mul+add). With the production default (subtract-first),
    # ulp-level forward differences flip relu boundary sets on this tiny
    # tensor and per-element gradient comparisons lose meaning.
    norm = functools.partial(
        BatchNorm, use_running_average=False, momentum=0.9,
        epsilon=1e-5, dtype=jnp.bfloat16, param_dtype=jnp.float32,
        folded_apply=True,
    )
    return BottleneckBlock(filters, conv=conv, norm=norm)


def _randomized(variables, seed=2):
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [
        jax.random.normal(k, l.shape, l.dtype) * 0.4
        + (1.0 if l.ndim == 1 else 0.0)
        for k, l in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _flat_params(p, C, F, proj):
    out = {
        "w1": p["Conv_0"]["kernel"].reshape(C, F),
        "w2": p["Conv_1"]["kernel"].reshape(9, F, F),
        "w3": p["Conv_2"]["kernel"].reshape(F, 4 * F),
        "g1": p["BatchNorm_0"]["scale"], "b1": p["BatchNorm_0"]["bias"],
        "g2": p["BatchNorm_1"]["scale"], "b2": p["BatchNorm_1"]["bias"],
        "g3": p["BatchNorm_2"]["scale"], "b3": p["BatchNorm_2"]["bias"],
    }
    if proj:
        out.update(
            wp=p["conv_proj"]["kernel"].reshape(C, 4 * F),
            gp=p["norm_proj"]["scale"], bp=p["norm_proj"]["bias"])
    return out


@pytest.mark.parametrize("proj", [False, True])
def test_variable_tree_matches_standard_block(proj):
    F, C = 8, (16 if proj else 32)
    x = jnp.zeros((2, 8, 8, C), jnp.bfloat16)
    vs = _std_block(F).init(jax.random.PRNGKey(0), x)
    vf = FusedBottleneckBlock(F, interpret=True).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vs) == jax.tree_util.tree_structure(vf)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(vs),
        jax.tree_util.tree_leaves_with_path(vf),
    ):
        assert a.shape == b.shape and a.dtype == b.dtype, path


@pytest.mark.parametrize("proj", [False, True])
def test_module_forward_and_stats_parity(proj):
    F, C = 8, (16 if proj else 32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, C), jnp.bfloat16)
    sb, fb = _std_block(F), FusedBottleneckBlock(F, interpret=True)
    vs = _randomized(sb.init(jax.random.PRNGKey(1), x))
    y_s, mut_s = sb.apply(vs, x, mutable=["batch_stats"])
    y_f, mut_f = fb.apply(vs, x, mutable=["batch_stats"])
    # bf16 activations: the fused kernels and the XLA composition round
    # differently op-by-op; allow a few bf16 ulps at the activation scale
    np.testing.assert_allclose(
        np.asarray(y_s, np.float32), np.asarray(y_f, np.float32),
        atol=0.1, rtol=0)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(mut_s["batch_stats"]),
        jax.tree_util.tree_leaves_with_path(mut_f["batch_stats"]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=0,
            err_msg=str(path))


@pytest.mark.parametrize("proj", [False, True])
def test_module_gradient_parity(proj):
    F, C = 8, (16 if proj else 32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, C), jnp.bfloat16)
    sb, fb = _std_block(F), FusedBottleneckBlock(F, interpret=True)
    vs = _randomized(sb.init(jax.random.PRNGKey(1), x))
    wout = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 4 * F))

    def make_loss(mod):
        def loss(params, xx):
            y, _ = mod.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                xx, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) * wout)
        return loss

    gs, gxs = jax.grad(make_loss(sb), argnums=(0, 1))(vs["params"], x)
    gf, gxf = jax.grad(make_loss(fb), argnums=(0, 1))(vs["params"], x)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gs),
        jax.tree_util.tree_leaves_with_path(gf),
    ):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        # per-element grads in bf16 carry relu-boundary-flip noise on a
        # tensor this small; compare max-element at 15% and energy (L2) at 5%
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert rel < 0.15, (path, rel)
        rl2 = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-6)
        assert rl2 < 1e-1, (path, rl2)
    rel = (np.abs(np.asarray(gxs - gxf, np.float32)).max()
           / (np.abs(np.asarray(gxs, np.float32)).max() + 1e-6))
    assert rel < 0.15


def test_multislab_padded_plane_parity():
    """15x15 plane forced into 4 slabs of 64 (padded to 256 pixels)."""
    F, C, proj = 8, 16, True
    H = W = 15
    x = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, C), jnp.bfloat16)
    sb = _std_block(F)
    vs = _randomized(sb.init(jax.random.PRNGKey(1), x))
    cfg = plan_block(H, W, F, C, proj=proj, interpret=True, slab_target=64)
    assert cfg.nslab == 4 and cfg.padded > cfg.pixels
    fparams = _flat_params(vs["params"], C, F, proj)
    xf = pad_pixels(x.reshape(2, H * W, C), cfg)

    y_s, _ = sb.apply(vs, x, mutable=["batch_stats"])
    y_f, stats = bottleneck_fused(cfg, xf, fparams)
    # padding rows must stay identically zero (the chain invariant)
    assert np.abs(np.asarray(y_f[:, H * W:, :], np.float32)).max() == 0.0
    got = np.asarray(y_f[:, :H * W, :], np.float32).reshape(2, H, W, 4 * F)
    np.testing.assert_allclose(np.asarray(y_s, np.float32), got,
                               atol=0.1, rtol=0)

    wout = jax.random.normal(jax.random.PRNGKey(3), (2, H, W, 4 * F))
    woutf = pad_pixels(wout.reshape(2, H * W, 4 * F), cfg)

    def loss_s(params, xx):
        y, _ = sb.apply({"params": params, "batch_stats": vs["batch_stats"]},
                        xx, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) * wout)

    def loss_f(params, xx):
        y, _ = bottleneck_fused(cfg, xx, params)
        return jnp.sum(y.astype(jnp.float32) * woutf)

    gs, gxs = jax.grad(loss_s, argnums=(0, 1))(vs["params"], x)
    gf, gxf = jax.grad(loss_f, argnums=(0, 1))(fparams, xf)
    ref = _flat_params(gs, C, F, proj)
    for k in ref:
        a = np.asarray(ref[k], np.float32)
        b = np.asarray(gf[k], np.float32)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert rel < 0.15, (k, rel)
        rl2 = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-6)
        assert rl2 < 1e-1, (k, rl2)
    gxf_c = np.asarray(gxf[:, :H * W, :], np.float32).reshape(2, H, W, C)
    rel = (np.abs(np.asarray(gxs, np.float32) - gxf_c).max()
           / (np.abs(np.asarray(gxs, np.float32)).max() + 1e-6))
    assert rel < 0.15


def test_resnet_fuse_flag_matches_standard():
    """A tiny bottleneck ResNet gives the same train-mode output fused."""
    model_std = ResNet(stage_sizes=[2], block_cls=BottleneckBlock,
                       num_filters=8, fuse_blocks=False)
    model_fus = ResNet(stage_sizes=[2], block_cls=BottleneckBlock,
                       num_filters=8, fuse_blocks=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 6), jnp.float32)
    vs = model_std.init(jax.random.PRNGKey(1), x, train=False)
    vf = model_fus.init(jax.random.PRNGKey(1), x, train=True)
    assert (jax.tree_util.tree_structure(vs)
            == jax.tree_util.tree_structure(vf))
    vs = _randomized(vs)
    y_s, mut_s = model_std.apply(vs, x, train=True, mutable=["batch_stats"])
    y_f, mut_f = model_fus.apply(vs, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(y_s, np.float32), np.asarray(y_f, np.float32),
        atol=5e-2, rtol=0)
    # eval path is shared (standard blocks) regardless of the flag
    y_es = model_std.apply(vs, x, train=False)
    y_ef = model_fus.apply(vs, x, train=False)
    np.testing.assert_array_equal(np.asarray(y_es), np.asarray(y_ef))


def test_plan_block_rejects_planes_smaller_than_halo():
    with pytest.raises(ValueError, match="halo"):
        plan_block(1, 32, 8, 16)  # P=32 < width+1=33: no valid slab
