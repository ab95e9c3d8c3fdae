"""TPU probe: fused stage1 bottleneck vs standard composition.

1) numerics: fwd/bwd parity on real stage1 shapes (small V)
2) timing: 3-block stage1 chain fwd+bwd, V=96 (the bs32 operating point)
"""
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rxtpu.models.resnet import BottleneckBlock
from rxtpu.models.fused import FusedBottleneckBlock

print("backend:", jax.default_backend())


def std_block(filters, name=None):
    conv = functools.partial(
        nn.Conv, use_bias=False, dtype=jnp.bfloat16, param_dtype=jnp.float32,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
    )
    norm = functools.partial(
        nn.BatchNorm, use_running_average=False, momentum=0.9,
        epsilon=1e-5, dtype=jnp.bfloat16, param_dtype=jnp.float32,
    )
    return BottleneckBlock(filters, conv=conv, norm=norm, name=name)


class StdStage(nn.Module):
    n: int = 3

    @nn.compact
    def __call__(self, x):
        for j in range(self.n):
            x = std_block(64, name=f"b{j}")(x)
        return x


SLAB = int(os.environ.get("PROBE_SLAB", "1024"))


class FusedStage(nn.Module):
    n: int = 3

    @nn.compact
    def __call__(self, x):
        for j in range(self.n):
            x = FusedBottleneckBlock(64, slab_target=SLAB, name=f"b{j}")(x)
        return x


SKIP_NUMERICS = os.environ.get("PROBE_SKIP_NUMERICS", "0") == "1"
ONLY_FUSED = os.environ.get("PROBE_ONLY_FUSED", "0") == "1"

# ---- numerics on real shapes, small V ----
V, H, W, C = 4, 91, 91, 256
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (V, H, W, C), jnp.bfloat16)
sm = StdStage()
fm = FusedStage()
vs = sm.init(jax.random.PRNGKey(1), x)
# randomize so zero-init gamma3 doesn't mask errors
leaves, treedef = jax.tree_util.tree_flatten(vs)
keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
leaves = [jax.random.normal(k, l.shape, l.dtype) * 0.3
          + (1.0 if l.ndim == 1 else 0.0) for k, l in zip(keys, leaves)]
vs = jax.tree_util.tree_unflatten(treedef, leaves)

def make_lossgrad(mod):
    # sum(y^2) => dy = 2y: nontrivial upstream cotangent, no big closed-over
    # constant (the relay's remote_compile 413s on large HLO constants)
    def loss(params, xx):
        y, mut = mod.apply({"params": params, "batch_stats": vs["batch_stats"]},
                           xx, mutable=["batch_stats"])
        yf = y.astype(jnp.float32)
        return jnp.sum(yf * yf), (y, mut["batch_stats"])
    return jax.jit(jax.grad(loss, argnums=(0, 1), has_aux=True))


if not SKIP_NUMERICS:
    gs, (y_s, bs_s) = make_lossgrad(sm)(vs["params"], x)
    gf, (y_f, bs_f) = make_lossgrad(fm)(vs["params"], x)
    y_s = np.asarray(y_s, np.float32)
    y_f = np.asarray(y_f, np.float32)
    print("fwd max abs err", np.abs(y_s - y_f).max(),
          "scale", np.abs(y_s).max())
    worst = 0.0
    for (pth, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(gs[0]),
                                jax.tree_util.tree_leaves_with_path(gf[0])):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        e = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        worst = max(worst, e)
        if e > 3e-2:
            print("GRAD MISMATCH", jax.tree_util.keystr(pth), e)
    print("worst param-grad relerr", worst)
    for (pth, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(bs_s),
                                jax.tree_util.tree_leaves_with_path(bs_f)):
        e = np.abs(np.asarray(a) - np.asarray(b)).max()
        if e > 5e-3:
            print("STATS MISMATCH", jax.tree_util.keystr(pth), e)
    print("numerics done")

# ---- timing, V=96 ----
VT = 96
xt = jax.random.normal(jax.random.PRNGKey(4), (VT, H, W, C), jnp.bfloat16)


def timed(mod, iters=10):
    # NB: loss must not close over any big array — the relay's remote_compile
    # rejects HLO with large constants (HTTP 413).
    def loss(params, xx):
        y, _ = mod.apply({"params": params, "batch_stats": vs["batch_stats"]},
                         xx, mutable=["batch_stats"])
        y = y.astype(jnp.float32)
        return jnp.sum(y * y)

    g = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def chain(params, xx):
        def body(i, carry):
            p, acc = carry
            gp, gx = g(p, xx + acc * 1e-12)
            acc = acc + gx[:1, :1, :1, :1].astype(jnp.bfloat16).sum()
            return p, acc
        _, acc = jax.lax.fori_loop(0, iters, body, (params, jnp.bfloat16(0)))
        return acc

    r = chain(vs["params"], xt)
    float(r)  # host readback barrier
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = chain(vs["params"], xt)
        float(r)
        best.append((time.perf_counter() - t0))
    per = min(best[1:]) / iters * 1e3
    return per


if not ONLY_FUSED:
    t_std = timed(sm)
    print(f"std  stage1 fwd+bwd: {t_std:.2f} ms")
t_fus = timed(fm)
print(f"fused (slab_target={SLAB}) stage1 fwd+bwd: {t_fus:.2f} ms")
if not ONLY_FUSED:
    print(f"speedup x{t_std / t_fus:.2f}")
