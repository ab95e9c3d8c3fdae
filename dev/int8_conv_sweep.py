"""Per-shape int8-vs-bf16 conv timing over the resnet50@364 eval graph.

dev/int8_probe.py showed int8 convs beat bf16 at 256 channels (1.26x),
but the end-to-end quantized eval step measured ~0.93x
(dev/int8_eval_ab.py) — somewhere the int8 lowering loses. This sweep
times every distinct conv shape of the eval forward in both dtypes
(chained full-output feedback, host readback) to find which stages win,
informing a mixed-precision policy (quantize only where int8 pays).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

B = 96  # bench eval views/step (bs32 * G=3)

# (label, H, W, Cin, Cout, k, stride) — distinct conv shapes, resnet50@364
SHAPES = [
    ("stem 7x7/2 6->64 @364", 364, 364, 6, 64, 7, 2),
    ("s1 1x1 64->64 @91", 91, 91, 64, 64, 1, 1),
    ("s1 3x3 64->64 @91", 91, 91, 64, 64, 3, 1),
    ("s1 1x1 64->256 @91", 91, 91, 64, 256, 1, 1),
    ("s1 1x1 256->64 @91", 91, 91, 256, 64, 1, 1),
    ("s2 3x3/2 128->128", 91, 91, 128, 128, 3, 2),
    ("s2 1x1 128->512 @46", 46, 46, 128, 512, 1, 1),
    ("s2 1x1 512->128 @46", 46, 46, 512, 128, 1, 1),
    ("s2 3x3 128->128 @46", 46, 46, 128, 128, 3, 1),
    ("s3 3x3/2 256->256", 46, 46, 256, 256, 3, 2),
    ("s3 1x1 256->1024 @23", 23, 23, 256, 1024, 1, 1),
    ("s3 1x1 1024->256 @23", 23, 23, 1024, 256, 1, 1),
    ("s3 3x3 256->256 @23", 23, 23, 256, 256, 3, 1),
    ("s4 3x3/2 512->512", 23, 23, 512, 512, 3, 2),
    ("s4 1x1 512->2048 @12", 12, 12, 512, 2048, 1, 1),
    ("s4 1x1 2048->512 @12", 12, 12, 2048, 512, 1, 1),
    ("s4 3x3 512->512 @12", 12, 12, 512, 512, 3, 1),
]


def time_conv(h, w, cin, cout, k, stride, dtype, steps=20, trials=3):
    rng = np.random.default_rng(0)
    pad = [(k // 2, k // 2)] * 2
    if dtype == jnp.int8:
        x0 = jnp.asarray(rng.integers(-127, 128, (B, h, w, cin), np.int8))
        wgt = jnp.asarray(rng.integers(-127, 128, (k, k, cin, cout), np.int8))
        acc = jnp.int32
    else:
        x0 = jnp.asarray(rng.standard_normal((B, h, w, cin)) * 0.1, dtype)
        wgt = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.01, dtype)
        acc = jnp.float32

    oh, ow = (h + stride - 1) // stride, (w + stride - 1) // stride

    def body(i, carry):
        x, seed = carry
        y = jax.lax.conv_general_dilated(
            x, wgt, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc)
        # feed a whole-tensor function of y back into the next input so
        # the conv can be neither hoisted nor narrowed: resize y's output
        # back to the input geometry via a cheap broadcast-pad
        red = jnp.sum(y, axis=-1, dtype=jnp.float32)  # [B, oh, ow]
        red = jnp.pad(red, ((0, 0), (0, h - oh), (0, w - ow)))
        if dtype == jnp.int8:
            x = (x + (red[..., None] % 3).astype(jnp.int8)).astype(jnp.int8)
        else:
            x = x + (red[..., None] * 1e-6).astype(dtype)
        return x, seed

    f = jax.jit(lambda x: jax.lax.fori_loop(0, steps, body, (x, 0))[0])
    for _ in range(trials):
        t0 = time.perf_counter()
        out = f(x0)
        float(jnp.max(out.astype(jnp.float32)))
        dt = time.perf_counter() - t0
    return dt / steps


def main():
    print(f"devices: {jax.devices()}  B={B}")
    tot8 = totb = 0.0
    for label, h, w, cin, cout, k, stride in SHAPES:
        tb = time_conv(h, w, cin, cout, k, stride, jnp.bfloat16)
        t8 = time_conv(h, w, cin, cout, k, stride, jnp.int8)
        tot8 += t8
        totb += tb
        print(f"{label:28s} bf16 {1000 * tb:7.3f} ms  int8 {1000 * t8:7.3f} ms"
              f"  ({tb / t8:4.2f}x)")
    print(f"{'TOTAL (distinct shapes)':28s} bf16 {1000 * totb:7.3f} ms  "
          f"int8 {1000 * tot8:7.3f} ms  ({totb / tot8:4.2f}x)")


if __name__ == "__main__":
    main()
