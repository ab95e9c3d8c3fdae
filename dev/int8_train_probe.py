"""Measure int8 W8A8 FORWARD inside a train step (fwd+bwd) vs bf16.

Judge item (round 4): the one untried train-side ceiling-mover is running
the forward convs at the chip's 1.68x int8 MXU rate while keeping a bf16
backward. The per-op ceiling model (dev/eval_ceiling.py --train) already
projects the win at ~1 ms of 119.7 (0.9%): 36/53 fwd convs are HBM-bound,
and train-mode BN forces the wide conv output to HBM for the stats pass
no matter what the MXU emitted — the int8-resident epilogue dataflow that
won eval its 1.70x is structurally unavailable when BN statistics must be
reduced before the apply/requantize. On top of that, dynamic activation
quantization (needed because there is no calibration during training)
ADDS a read+write pass per conv input.

This probe measures the real sign on representative ResNet-50 stage
geometry: a scan of conv3x3 -> BN(train-mode stats) -> relu blocks,
fwd+bwd wrt the stacked weights,

- bf16 leg: plain lax.conv in bf16, and
- int8 leg: custom_vjp conv whose fwd dynamically quantizes x and w
  per-tensor (max/127), runs the int8 conv with s32 accumulation
  (preferred_element_type=int32, the QuantConv contract —
  rxtpu/models/quant.py), dequantizes, and whose bwd is straight-through
  bf16 (dgrad/wgrad on the dequantized tensors, the standard QAT rule).

Also reports gradient quality: per-layer relative error of the int8-fwd
wgrad vs the bf16 wgrad at the same point (teacher-forced comparison, the
dev/parity_gradcheck.py discipline).

Timing discipline per CLAUDE.md: both legs run their full step chained
inside one jit via lax.scan over layers, >=3 trials, host readback
barrier, first trial discarded.

Usage: python dev/int8_train_probe.py [--views 96] [--h 46] [--c 256]
                                      [--layers 8] [--trials 4]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=96)
    ap.add_argument("--h", type=int, default=46)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--trials", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    V, H, C, L = args.views, args.h, args.c, args.layers
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x0 = jax.random.normal(kx, (V, H, H, C), jnp.bfloat16)
    # He-ish init so activations stay O(1) through the BN'd chain
    ws = (jax.random.normal(kw, (L, 3, 3, C, C), jnp.float32)
          * np.sqrt(2.0 / (9 * C)))

    def conv_bf16(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    @jax.custom_vjp
    def conv_int8(x, w):
        return _int8_fwd_impl(x, w)

    def _quant(t):
        s = jnp.maximum(jnp.max(jnp.abs(t.astype(jnp.float32))), 1e-8) / 127.0
        q = jnp.clip(jnp.round(t.astype(jnp.float32) / s), -127, 127)
        return q.astype(jnp.int8), s

    def _int8_fwd_impl(x, w):
        xq, xs = _quant(x)
        wq, wsc = _quant(w)
        y = jax.lax.conv_general_dilated(
            xq, wq, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * (xs * wsc)).astype(jnp.bfloat16)

    def _int8_fwd(x, w):
        return _int8_fwd_impl(x, w), (x, w)

    def _int8_bwd(res, dy):
        # straight-through: bwd on the bf16 tensors (standard QAT rule;
        # dequantized-value bwd differs only by the quantization noise)
        x, w = res
        _, vjp = jax.vjp(conv_bf16, x, w)
        return vjp(dy)

    conv_int8.defvjp(_int8_fwd, _int8_bwd)

    def make_step(conv):
        def block(x, w):
            y = conv(x, w)
            # train-mode BN: batch statistics over (V, H, W), then apply
            yf = y.astype(jnp.float32)
            mu = yf.mean(axis=(0, 1, 2))
            var = yf.var(axis=(0, 1, 2))
            out = (yf - mu) * jax.lax.rsqrt(var + 1e-5)
            return jnp.maximum(out, 0.0).astype(jnp.bfloat16)

        def loss(ws, x):
            def body(carry, w):
                return block(carry, w), None
            y, _ = jax.lax.scan(body, x, ws)
            return jnp.sum(y.astype(jnp.float32) ** 2) / y.size

        return jax.jit(jax.grad(loss))

    step_bf16 = make_step(conv_bf16)
    step_int8 = make_step(conv_int8)

    def bench(step, tag):
        ts = []
        for t in range(args.trials):
            t0 = time.perf_counter()
            g = step(ws, x0)
            _ = float(jnp.sum(g.astype(jnp.float32)))  # host readback barrier
            ts.append(1e3 * (time.perf_counter() - t0))
        best = min(ts[1:])
        print(f"{tag}: {best:.2f} ms  (trials {['%.1f' % v for v in ts]})")
        return best

    print(f"geometry: {L} x [conv3x3 {C}->{C} @ {H}^2, BN-train, relu], "
          f"{V} views, fwd+bwd wgrad")
    t_b = bench(step_bf16, "bf16 fwd+bwd")
    t_q = bench(step_int8, "int8-fwd fwd+bwd")
    print(f"int8-fwd / bf16 = {t_q / t_b:.3f}x "
          f"({'WIN' if t_q < t_b else 'LOSS'} {abs(t_q - t_b):.2f} ms)")

    # gradient quality at the same point
    g_b = np.asarray(step_bf16(ws, x0), np.float32)
    g_q = np.asarray(step_int8(ws, x0), np.float32)
    rel = [float(np.linalg.norm(g_q[i] - g_b[i]) /
                 max(np.linalg.norm(g_b[i]), 1e-12)) for i in range(L)]
    print("per-layer wgrad rel error (int8-fwd vs bf16): "
          + " ".join(f"{r:.3f}" for r in rel))


if __name__ == "__main__":
    main()
