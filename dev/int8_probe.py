"""Is int8 compute a real lever on this v5e (via the relay)?

The eval leg runs AT its bf16 composition ceiling (4034 views/s,
OPTIMIZATION.md) — 5000 needs a 1.25x that bf16 cannot give. v5e lists
394 int8 TOPS vs 197 bf16 TFLOPS, and int8 halves HBM bytes, so a
W8A8-quantized forward could move BOTH walls. This probe answers, before
any framework work:

  1. dot_general int8xint8->int32: measured TOPS vs the bf16 matmul peak.
  2. conv_general_dilated on int8: supported on TPU at all? measured rate
     on a ResNet-stage-shaped conv vs the same conv in bf16.

Timing discipline (CLAUDE.md): the FULL op output feeds the next
iteration's input (x' = requant(op(x))) so XLA can neither hoist the op
out of the fori_loop nor narrow it to the consumed slice (a `c[0,0]`
consumer lets XLA slice the dot — the first version of this probe
"measured" 375 bf16 TFLOPS on a 197-peak chip that way). Host readback
barrier, >=2 trials, report the last.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(f, x, steps, trials=3):
    g = jax.jit(f)
    for _ in range(trials):
        t0 = time.perf_counter()
        out = g(x)
        float(jnp.max(out.astype(jnp.float32)))  # host readback barrier
        dt = time.perf_counter() - t0
    return dt / steps


def chained_matmul(dtype, acc_dtype, n=8192, steps=20):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.integers(-127, 128, (n, n), np.int8))
        x0 = jnp.asarray(rng.integers(-127, 128, (n, n), np.int8))

        def requant(c):
            return (c & 127).astype(jnp.int8)
    else:
        a = jnp.asarray(rng.standard_normal((n, n)) * 0.01, dtype)
        x0 = jnp.asarray(rng.standard_normal((n, n)), dtype)

        def requant(c):
            return (c * 1e-2).astype(dtype)

    def f(x):
        def body(i, x):
            c = jax.lax.dot_general(a, x, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc_dtype)
            return requant(c)
        return jax.lax.fori_loop(0, steps, body, x)

    dt = timed(f, x0, steps)
    return 2 * n**3 / dt / 1e12


def chained_conv(in_dtype, acc_dtype, B=64, H=91, W=91, C=256, R=3,
                 steps=10):
    rng = np.random.default_rng(1)
    if in_dtype == jnp.int8:
        x0 = jnp.asarray(rng.integers(-127, 128, (B, H, W, C), np.int8))
        w = jnp.asarray(rng.integers(-127, 128, (R, R, C, C), np.int8))

        def requant(y):
            return (y & 127).astype(jnp.int8)
    else:
        x0 = jnp.asarray(rng.standard_normal((B, H, W, C)), in_dtype)
        w = jnp.asarray(rng.standard_normal((R, R, C, C)) * 0.01, in_dtype)

        def requant(y):
            return (y * 1e-2).astype(in_dtype)

    def f(x):
        def body(i, x):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc_dtype)
            return requant(y)
        return jax.lax.fori_loop(0, steps, body, x)

    dt = timed(f, x0, steps)
    return 2 * B * H * W * C * C * R * R / dt / 1e12


def main():
    print(f"devices: {jax.devices()}")
    tf_bf16 = chained_matmul(jnp.bfloat16, jnp.float32)
    print(f"matmul 8192^3 bf16->f32:   {tf_bf16:7.1f} TFLOPS")
    try:
        tf_int8 = chained_matmul(jnp.int8, jnp.int32)
        print(f"matmul 8192^3 int8->int32: {tf_int8:7.1f} TOPS "
              f"({tf_int8 / tf_bf16:.2f}x bf16)")
    except Exception as e:  # noqa: BLE001
        print(f"int8 matmul FAILED: {type(e).__name__}: {e}")
    cv_bf16 = chained_conv(jnp.bfloat16, jnp.float32)
    print(f"conv3x3 256ch bf16->f32:   {cv_bf16:7.1f} TFLOPS")
    try:
        cv_int8 = chained_conv(jnp.int8, jnp.int32)
        print(f"conv3x3 256ch int8->int32: {cv_int8:7.1f} TOPS "
              f"({cv_int8 / cv_bf16:.2f}x bf16)")
    except Exception as e:  # noqa: BLE001
        print(f"int8 conv FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
