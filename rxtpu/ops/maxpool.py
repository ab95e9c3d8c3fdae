"""Max-pool 3x3/stride-2/pad-1 with an elementwise custom backward.

MEASURED DEAD END (round 3) — kept as a retired hypothesis, not wired
into the models. XLA lowers the gradient of ``reduce_window(max)`` to a
``select-and-scatter`` op that costs ~2.1 ms/step in the train trace
(OPTIMIZATION.md round-2 attribution) — about 2x its traffic roofline.
The elementwise reformulation below was hypothesized to beat it, but the
clean A/B (dev/time_step.py, v5e, bs32): custom 142.1 ms/step vs
select-and-scatter 127.1 ms/step — the 9 compare-multiply taps over the
182^2 x 64ch stem activation cost ~9x the pool's input traffic and XLA
does not collapse the shifted slices into one fused read. The backward
routes dy[i,j] to every input position of window (i,j) whose value
equals the window max,

    dx[p,q] = sum_{windows (i,j) containing (p,q)}  dy[i,j] * (x[p,q] == y[i,j])

computed as 9 statically-shifted compare-multiply taps against the
stride-2-dilated y/dy grids (no gather, no scatter).

Semantics note: ties route gradient to ALL maximal positions, where
torch / select-and-scatter pick one winner. Post-BN activations are
continuous, so ties have measure ~zero in training; the parity tests
check agreement on generic float inputs.

Forward semantics (shape and values) match
``flax.linen.max_pool(window=(3,3), strides=(2,2), padding=((1,1),(1,1)))``
== torch ``MaxPool2d(3, 2, 1)`` (models.py:16 via torchvision resnet50).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _pool_fwd_raw(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


@jax.custom_vjp
def max_pool_3x3s2(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC [N, H, W, C] -> [N, ceil(H/2), ceil(W/2), C]."""
    return _pool_fwd_raw(x)


def _fwd(x):
    y = _pool_fwd_raw(x)
    return y, (x, y)


def _bwd(res, dy):
    x, y = res
    n, h, w, c = x.shape
    ho, wo = y.shape[1], y.shape[2]
    # dilate y/dy onto the input grid: position (2i, 2j), then shift by the
    # tap offset (u-1, v-1), u,v in {0,1,2}. All slices are static.
    # padded canvas large enough for every tap: [2*ho+2, 2*wo+2]
    ph, pw = 2 * ho + 2, 2 * wo + 2
    yd = jnp.zeros((n, ph, pw, c), y.dtype)
    yd = yd.at[:, 1:1 + 2 * ho:2, 1:1 + 2 * wo:2, :].set(y)
    dd = jnp.zeros((n, ph, pw, c), dy.dtype)
    dd = dd.at[:, 1:1 + 2 * ho:2, 1:1 + 2 * wo:2, :].set(dy)

    dx = jnp.zeros(x.shape, dy.dtype)
    for u in (0, 1, 2):
        for v in (0, 1, 2):
            # window (i,j) covers input rows 2i-1+u; solving for the input
            # grid: shifted slice of the dilated canvas starting at
            # (2-u, 2-v) aligns y[i,j] with x[2i-1+u, 2j-1+v]
            ys = yd[:, 2 - u:2 - u + h, 2 - v:2 - v + w, :]
            ds = dd[:, 2 - u:2 - u + h, 2 - v:2 - v + w, :]
            dx = dx + jnp.where(x == ys, ds, jnp.zeros_like(ds))
    return (dx,)


max_pool_3x3s2.defvjp(_fwd, _bwd)
