"""Per-kernel timing of the fused bottleneck's 8 Pallas kernels on TPU.

Times each K1..K4 / B1..B4 in a chained fori_loop (relay discipline:
CLAUDE.md) at stage1 shapes, V=96, to locate the fused-path slowdown.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from rxtpu.ops import fused_block as fb

SLAB = int(os.environ.get("PROBE_SLAB", "1024"))
V, H, W, C, F = 96, 91, 91, 256, 64
cfg = fb.plan_block(H, W, F, C, proj=False, slab_target=SLAB)
print(f"cfg: slab={cfg.slab} nslab={cfg.nslab} padded={cfg.padded}")

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 12)
PP = cfg.padded
C4 = cfg.out_features
x = fb.pad_pixels(
    jax.random.normal(ks[0], (V, cfg.pixels, C), jnp.bfloat16), cfg)
c1 = fb.pad_pixels(
    jax.random.normal(ks[1], (V, cfg.pixels, F), jnp.bfloat16), cfg)
c2 = fb.pad_pixels(
    jax.random.normal(ks[2], (V, cfg.pixels, F), jnp.bfloat16), cfg)
dy = fb.pad_pixels(
    jax.random.normal(ks[3], (V, cfg.pixels, C4), jnp.bfloat16), cfg)
y = fb.pad_pixels(
    jax.random.normal(ks[4], (V, cfg.pixels, C4), jnp.bfloat16), cfg)
g1v = fb.pad_pixels(
    jax.random.normal(ks[5], (V, cfg.pixels, F), jnp.bfloat16), cfg)
g2v = fb.pad_pixels(
    jax.random.normal(ks[6], (V, cfg.pixels, F), jnp.bfloat16), cfg)
w1 = jax.random.normal(ks[7], (C, F), jnp.bfloat16) * 0.05
w2 = jax.random.normal(ks[8], (9, F, F), jnp.bfloat16) * 0.05
w3 = jax.random.normal(ks[9], (F, C4), jnp.bfloat16) * 0.05
vec_f = jnp.ones((1, F), jnp.float32)
vec_c4 = jnp.ones((1, C4), jnp.float32)
fold = fb._Folded(vec_f * 0.1, vec_f, vec_f, vec_f, vec_f * 0.1)
fold4 = fb._Folded(vec_c4 * 0.1, vec_c4, vec_c4, vec_c4, vec_c4 * 0.1)


ITERS = int(os.environ.get("PROBE_ITERS", "50"))


def timed(name, make_out, main, *rest, iters=ITERS):
    """make_out(main_perturbed, *rest) -> array; times the chained op.

    All big operands are jit arguments (closed-over constants 413 the
    relay's remote_compile); the first one gets the loop-carried perturb
    so the compiler can't hoist the call out of the loop.
    """

    @jax.jit
    def chain(main, *rest):
        def body(i, acc):
            # perturb the LAST operand (always a small weight here): a
            # perturbed big operand would add a full HBM copy per iter
            pr = rest[:-1] + (rest[-1] + acc.astype(rest[-1].dtype) * 1e-20,)
            out = make_out(main, *pr)
            return acc + out.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    r = chain(main, *rest)
    float(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(main, *rest))
        ts.append(time.perf_counter() - t0)
    per = min(ts[1:]) / iters * 1e3
    print(f"{name}: {per:.2f} ms")
    return per


timed("XLA bandwidth baseline (x * w[0,0], 409+409 MB)",
      lambda xx, ww: xx * ww[0, 0], x, w1)

tot = 0.0
tot += timed("K1 (1x1 C->F + stats)", lambda xx, ww: fb._k1(
    cfg, xx, ww, None)[0], x, w1)
tot += timed("K2 (bnrelu+3x3 F->F + stats)", lambda cc, ww: fb._k2(
    cfg, cc, fold.scale, fold.shift, ww)[0], c1, w2)
tot += timed("K3 (bnrelu+1x1 F->C4 stats only)", lambda cc, ww: fb._k3(
    cfg, cc, fold.scale, fold.shift, ww)[0], c2, w3)
tot += timed("K4 (recompute c3 + bn3 + add + relu)", lambda cc, xx, ww: fb._k4(
    cfg, cc, xx, fold.scale, fold.shift, ww,
    fold4.scale, fold4.shift, None, None, None), c2, x, w3)
tot += timed("B1 (g3 sums)", lambda dd, yy, cc, ww: fb._b1(
    cfg, dd, yy, cc, fold, ww, fold4, None, None, None)[0], dy, y, c2, w3)
tot += timed("B2 (dc3, dw3, g2, sums)", lambda dd, yy, cc, ww: fb._b2(
    cfg, dd, yy, cc, fold, ww, ww.T, fold4,
    vec_c4 * 0.01, vec_c4 * 0.01)[0], dy, y, c2, w3)
tot += timed("B3 (dc2 adjoint conv, dw2, g1)", lambda gg, cc1, cc2, ww: fb._b3(
    cfg, gg, cc1, cc2, fold, fold, vec_f * 0.01, vec_f * 0.01,
    jnp.transpose(ww, (0, 2, 1)))[0], g2v, c1, c2, w2)
tot += timed("B4 (dc1, dw1, dx)", lambda gg, cc1, xx, dd, yy, ww: fb._b4(
    cfg, gg, cc1, xx, dd, yy, fold, vec_f * 0.01, vec_f * 0.01, ww.T,
    None, None, None, None, None)[0], g1v, c1, x, dy, y, w1)
print(f"sum of kernels (identity block): {tot:.2f} ms "
      f"-> x3 blocks ~ {3 * tot:.1f} ms (+1 proj overhead)")
