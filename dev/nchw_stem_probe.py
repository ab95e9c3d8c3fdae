"""Does feeding the stem conv NCHW directly beat transpose+NHWC on TPU?

The augment kernels naturally produce [P=BG*C, h, w] planes, i.e. a
[BG, C, h, w] (NCHW) tensor; the models consume NHWC, so augment_batch
ends with a ~2 ms/step transpose (OPTIMIZATION.md roadmap item 2
"Remaining"). XLA's conv accepts arbitrary dimension_numbers — if an
NCHW-input stem conv costs the same as the NHWC one, the transpose can
be folded into the conv and the 2 ms disappears.

Measures, chained in one jit (relay discipline, CLAUDE.md):
  a) transpose NCHW->NHWC + conv(NHWC in, NHWC out)   [current path]
  b) conv(NCHW in, NHWC out) via dimension_numbers    [candidate]
  c) conv(NHWC in, NHWC out) alone                    [lower bound]
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, x, w, steps=30, trials=3):
    # perturb an operand per iteration so the conv is loop-carried —
    # otherwise XLA's while-loop LICM hoists fn(x, w) out and the loop
    # times one conv + scalar adds (same discipline as tpu_fused_probe.py)
    f = jax.jit(lambda x, w: jax.lax.fori_loop(
        0, steps,
        lambda i, acc: acc + fn(x, w + acc.astype(w.dtype) * 1e-30).mean(),
        jnp.float32(0.0)))
    for t in range(trials):
        t0 = time.perf_counter()
        float(f(x, w))  # host readback barrier
        dt = (time.perf_counter() - t0) / steps
        if t == trials - 1:
            return 1000 * dt


def main():
    B, C, H, W = 96, 6, 364, 364
    rng = np.random.default_rng(0)
    x_nchw = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.bfloat16)
    x_nhwc = jnp.asarray(np.moveaxis(np.asarray(x_nchw, np.float32), 1, -1),
                         jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((7, 7, C, 64)) * 0.05, jnp.bfloat16)

    dn_nhwc = jax.lax.conv_dimension_numbers(
        x_nhwc.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    dn_nchw = jax.lax.conv_dimension_numbers(
        x_nchw.shape, w.shape, ("NCHW", "HWIO", "NHWC"))

    def conv_nhwc(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn_nhwc)

    def transpose_then_conv(x, w):
        return conv_nhwc(jnp.transpose(x, (0, 2, 3, 1)), w)

    def conv_nchw_in(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn_nchw)

    a = bench(transpose_then_conv, x_nchw, w)
    b = bench(conv_nchw_in, x_nchw, w)
    c = bench(conv_nhwc, x_nhwc, w)
    print(f"transpose+conv(NHWC): {a:7.3f} ms")
    print(f"conv(NCHW input):     {b:7.3f} ms")
    print(f"conv(NHWC) alone:     {c:7.3f} ms")
    print(f"-> transpose overhead {a - c:.3f} ms; NCHW-in overhead {b - c:.3f} ms")


if __name__ == "__main__":
    main()
