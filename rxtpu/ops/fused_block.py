"""Fused two-pass ResNet bottleneck block (Pallas, TPU).

Reproduces the train-mode composition of the reference backbone's bottleneck
(torchvision resnet50 Bottleneck, consumed via ``models.py:16``; our standard
flax counterpart is ``rxtpu.models.resnet.BottleneckBlock``):

    c1 = conv1x1(x); a1 = relu(bn1(c1))
    c2 = conv3x3(a1); a2 = relu(bn2(c2))
    c3 = conv1x1(a2); y  = relu(bn3(c3) + residual)

but restructured for HBM traffic instead of op-by-op execution. Profiling
(OPTIMIZATION.md round-2 trace dissection) shows stage1 of the step spends
~45 ms/step at bs32 re-reading 91^2 activations for BN statistics, BN
gradient reductions and weight-grad convolutions. This module:

- works on views flattened to ``[V, P=H*W, C]`` (zero-padded along P to a
  slab grid, see below) so 1x1 convs are plain MXU matmuls and the 3x3
  conv is nine statically-shifted slices of a halo window, column-masked
  at the row boundaries to reproduce SAME zero padding;
- computes train-BN statistics by accumulating per-grid-step partial sums
  into a shared output block (TPU grids are sequential), so stats ride the
  conv kernels instead of separate HBM sweeps;
- saves only ``x, c1, c2`` (+ the output ``y``) as residuals and recomputes
  everything else in a 4-pass custom backward; dgamma/dbeta fall out of the
  backward reduction sums at no extra cost.

Slab decomposition: whole 91^2 planes at 256 channels exceed the ~16 MB
VMEM scope, so each view is split into ``nslab`` slabs of ``slab`` pixels
(8-aligned; the plane is zero-padded from P to nslab*slab). The grid is
``(V, nslab)``; the 3x3-conv kernels receive the previous/next slab as
extra (clamped) inputs to cover the W+1-pixel halo. Padding rows are kept
identically zero at every stage — each kernel re-masks values that a BN
shift would resurrect — so the statistics sums are exact with
``count = V * P``.

Numerics follow the flax composition: matmuls in bf16 with f32
accumulation, activations stored bf16, statistics and normalization math in
f32, biased (1/M) variance for both normalization and the running-average
update (flax BatchNorm defaults, ``momentum=0.9``, ``eps=1e-5``).

The projection variant (stage1 block1: 1x1 conv + BN on the residual path,
stride 1) is supported; strided blocks (stage2-4 entry) keep the standard
composition.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OFFSETS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))

# The Mosaic default scoped-VMEM cap (16 MiB) throttles slabs to ~1k pixels
# and leaves the kernels grid-overhead-bound (~9x above roofline, see
# OPTIMIZATION.md); v5e has 128 MiB VMEM, so claim most of it.
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _pallas(kern, cfg: "BlockCfg", **kw):
    interpret = cfg._interpret()
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES)
    return pl.pallas_call(kern, interpret=interpret, **kw)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


class BlockCfg(NamedTuple):
    """Static configuration of one fused bottleneck block."""

    height: int
    width: int
    features: int  # F: bottleneck width
    in_features: int  # C: block input channels
    slab: int  # pixels per grid step (multiple of 8)
    nslab: int  # grid steps per view
    eps: float = 1e-5
    proj: bool = False  # residual through 1x1 conv + BN (stage1 block1)
    interpret: Optional[bool] = None

    @property
    def pixels(self) -> int:
        return self.height * self.width

    @property
    def padded(self) -> int:
        return self.slab * self.nslab

    @property
    def halo(self) -> int:
        return self.width + 1

    @property
    def out_features(self) -> int:
        return 4 * self.features

    def _interpret(self) -> bool:
        return (not _on_tpu()) if self.interpret is None else self.interpret


# Default pixels per grid step. ResNet's stage-level padding and the
# per-block planning inside FusedBottleneckBlock must agree on this: both
# route through plan_block's default so the padded pixel count matches.
DEFAULT_SLAB_TARGET = 1024


def plan_block(height: int, width: int, features: int, in_features: int,
               eps: float = 1e-5, proj: bool = False,
               interpret: Optional[bool] = None,
               slab_target: int = DEFAULT_SLAB_TARGET) -> BlockCfg:
    """Pick a slab decomposition: ~slab_target pixels, 8-aligned, halo-safe."""
    P = height * width
    nslab = max(1, round(P / slab_target))
    slab = -(-P // nslab // 8) * 8  # ceil to multiple of 8
    while slab < width + 1:  # halo must fit inside one slab
        nslab -= 1
        if nslab == 0:
            raise ValueError(
                f"plane {height}x{width} too small for the {width + 1}-pixel"
                " halo: no 8-aligned slab decomposition exists")
        slab = -(-P // nslab // 8) * 8
    return BlockCfg(height, width, features, in_features, slab, nslab,
                    eps=eps, proj=proj, interpret=interpret)


def pad_pixels(x, cfg: BlockCfg):
    """[V, P, C] -> [V, padded, C] with zero rows appended."""
    extra = cfg.padded - cfg.pixels
    if extra == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, extra), (0, 0)))


# ---------------------------------------------------------------------------
# Spec / in-kernel helpers
# ---------------------------------------------------------------------------


def _slab_spec(S, C):
    return pl.BlockSpec((1, S, C), lambda v, s: (v, s, 0))


def _prev_spec(S, C):
    return pl.BlockSpec((1, S, C), lambda v, s: (v, jnp.maximum(s - 1, 0), 0))


def _next_spec(S, C, NS):
    return pl.BlockSpec(
        (1, S, C), lambda v, s: (v, jnp.minimum(s + 1, NS - 1), 0))


def _shared_spec(*dims):
    n = len(dims)
    return pl.BlockSpec(dims, lambda v, s, _n=n: (0,) * _n)


def _accum_into(ref, value):
    """Accumulate ``value`` into an output block shared by all grid steps."""

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        ref[...] = jnp.zeros_like(ref)

    ref[...] += value


def _sum_sq(v_bf16):
    v = v_bf16.astype(jnp.float32)
    return (
        jnp.sum(v, axis=0, keepdims=True),
        jnp.sum(v * v, axis=0, keepdims=True),
    )


def _grow(n, start):
    """Global row indices [n,1] for local rows starting at ``start``."""
    return start + jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)


def _row_valid(cfg, n, start, dtype=jnp.bfloat16):
    """[n,1] mask of rows whose global index lies in [0, P)."""
    g = _grow(n, start)
    return ((g >= 0) & (g < cfg.pixels)).astype(dtype)


def _col_masks(cfg, n, start, dtype=jnp.bfloat16):
    """(not_first_col, not_last_col) [n,1] masks at global row offsets."""
    g = _grow(n, start)
    col = g - (g // cfg.width) * cfg.width
    return (col != 0).astype(dtype), (col != cfg.width - 1).astype(dtype)


def _slab_start(cfg):
    """Traced global row index of the current slab's first row."""
    return pl.program_id(1) * cfg.slab


def _bn_relu(c_bf16, scale_ref, shift_ref):
    return jnp.maximum(
        c_bf16.astype(jnp.float32) * scale_ref[...] + shift_ref[...], 0.0
    ).astype(jnp.bfloat16)


def _window(cfg, prev, cur, nxt):
    """[halo + S + halo, F] window around the current slab.

    prev/nxt are the clamped neighbor slabs (None when nslab == 1); rows
    outside the plane are garbage here and must be masked by the caller
    via _row_valid(start = slab_start - halo).
    """
    Hh = cfg.halo
    if prev is None:
        z = jnp.zeros((Hh, cur.shape[1]), cur.dtype)
        return jnp.concatenate([z, cur, z], axis=0)
    return jnp.concatenate([prev[-Hh:, :], cur, nxt[:Hh, :]], axis=0)


def _conv_taps(cfg, a1w, w2, adjoint=False):
    """sum_k shift_k(a1w) @ w2[k] over the current slab's output rows.

    a1w: masked halo window [halo+S+halo, F]; w2: [9, F, F] bf16
    (w2[k] transposed by the caller for the adjoint). Column masks are
    applied on the output side: for the forward conv, tap dx=+1 reads
    source column 0 exactly at output column W-1 (and dx=-1 at column 0);
    for the adjoint the forward source mask lands on the output row.
    """
    S, Hh = cfg.slab, cfg.halo
    nf, nl = _col_masks(cfg, S, _slab_start(cfg))
    acc = None
    for k, (dy, dx) in enumerate(_OFFSETS):
        off = -(dy * cfg.width + dx) if adjoint else (dy * cfg.width + dx)
        sl = a1w[Hh + off:Hh + off + S, :]
        if dx != 0:
            if adjoint:
                mask = nf if dx == 1 else nl
            else:
                mask = nl if dx == 1 else nf
            sl = sl * mask
        term = jnp.dot(sl, w2[k], preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    return acc


# ---------------------------------------------------------------------------
# Forward kernels
# ---------------------------------------------------------------------------


def _k1_kernel(cfg, x_ref, w1_ref, wp_ref, c1_ref, s1_ref, q1_ref,
               sp_ref=None, qp_ref=None):
    # x padding rows are zero by invariant, so c1/cp pad rows are zero and
    # the stat sums need no mask.
    x = x_ref[0]
    c1 = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32).astype(
        jnp.bfloat16)
    c1_ref[0] = c1
    s, q = _sum_sq(c1)
    _accum_into(s1_ref, s)
    _accum_into(q1_ref, q)
    if cfg.proj:
        cp = jnp.dot(x, wp_ref[...], preferred_element_type=jnp.float32).astype(
            jnp.bfloat16)
        s, q = _sum_sq(cp)
        _accum_into(sp_ref, s)
        _accum_into(qp_ref, q)


def _k1(cfg: BlockCfg, x, w1b, wpb):
    V, PP, C = x.shape
    S = cfg.slab
    F = cfg.features
    C4 = cfg.out_features
    outs = [
        jax.ShapeDtypeStruct((V, PP, F), jnp.bfloat16),
        jax.ShapeDtypeStruct((1, F), jnp.float32),
        jax.ShapeDtypeStruct((1, F), jnp.float32),
    ]
    out_specs = [_slab_spec(S, F), _shared_spec(1, F), _shared_spec(1, F)]
    ins = [x, w1b]
    in_specs = [_slab_spec(S, C), _shared_spec(C, F)]
    if cfg.proj:
        ins.append(wpb)
        in_specs.append(_shared_spec(C, C4))
        outs += [jax.ShapeDtypeStruct((1, C4), jnp.float32)] * 2
        out_specs += [_shared_spec(1, C4)] * 2
        kern = functools.partial(_k1_kernel, cfg)
    else:
        def kern(x_ref, w1_ref, *rest):
            _k1_kernel(cfg, x_ref, w1_ref, None, *rest)
    return _pallas(
        kern,
        grid=(V, cfg.nslab),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=outs,
        cfg=cfg,
    )(*ins)


def _c1_windows(cfg, x_like):
    """(ins, in_specs) for a halo-windowed slab input (prev, cur, next)."""
    S = cfg.slab
    F = x_like.shape[2]
    if cfg.nslab == 1:
        return [x_like], [_slab_spec(S, F)]
    return (
        [x_like, x_like, x_like],
        [_prev_spec(S, F), _slab_spec(S, F), _next_spec(S, F, cfg.nslab)],
    )


def _take3(cfg, refs):
    """Unpack (prev, cur, next) slab values from windowed refs."""
    if cfg.nslab == 1:
        return None, refs[0][0], None
    return refs[0][0], refs[1][0], refs[2][0]


def _k2_kernel(cfg, *refs):
    nwin = 1 if cfg.nslab == 1 else 3
    c1w = refs[:nwin]
    sc1_ref, sh1_ref, w2_ref = refs[nwin:nwin + 3]
    c2_ref, s2_ref, q2_ref = refs[nwin + 3:]
    S, Hh = cfg.slab, cfg.halo
    prev, cur, nxt = _take3(cfg, c1w)
    win = _window(cfg, prev, cur, nxt)
    a1 = _bn_relu(win, sc1_ref, sh1_ref)
    a1 = a1 * _row_valid(cfg, a1.shape[0], _slab_start(cfg) - Hh)
    c2 = _conv_taps(cfg, a1, w2_ref[...]).astype(jnp.bfloat16)
    c2 = c2 * _row_valid(cfg, S, _slab_start(cfg))
    c2_ref[0] = c2
    s, q = _sum_sq(c2)
    _accum_into(s2_ref, s)
    _accum_into(q2_ref, q)


def _k2(cfg: BlockCfg, c1, sc1, sh1, w2b):
    V, PP, F = c1.shape
    S = cfg.slab
    wins, win_specs = _c1_windows(cfg, c1)
    return _pallas(
        functools.partial(_k2_kernel, cfg),
        grid=(V, cfg.nslab),
        in_specs=win_specs + [
            _shared_spec(1, F), _shared_spec(1, F), _shared_spec(9, F, F),
        ],
        out_specs=[_slab_spec(S, F), _shared_spec(1, F), _shared_spec(1, F)],
        out_shape=[
            jax.ShapeDtypeStruct((V, PP, F), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
        ],
        cfg=cfg,
    )(*wins, sc1, sh1, w2b)


def _k3_kernel(cfg, c2_ref, sc2_ref, sh2_ref, w3_ref, s3_ref, q3_ref):
    a2 = _bn_relu(c2_ref[0], sc2_ref, sh2_ref)
    # the BN shift resurrects padding rows; re-zero before the stats matmul
    a2 = a2 * _row_valid(cfg, cfg.slab, _slab_start(cfg))
    c3 = jnp.dot(a2, w3_ref[...], preferred_element_type=jnp.float32).astype(
        jnp.bfloat16)
    s, q = _sum_sq(c3)
    _accum_into(s3_ref, s)
    _accum_into(q3_ref, q)


def _k3(cfg: BlockCfg, c2, sc2, sh2, w3b):
    V, PP, F = c2.shape
    S = cfg.slab
    C4 = cfg.out_features
    return _pallas(
        functools.partial(_k3_kernel, cfg),
        grid=(V, cfg.nslab),
        in_specs=[
            _slab_spec(S, F),
            _shared_spec(1, F),
            _shared_spec(1, F),
            _shared_spec(F, C4),
        ],
        out_specs=[_shared_spec(1, C4), _shared_spec(1, C4)],
        out_shape=[jax.ShapeDtypeStruct((1, C4), jnp.float32)] * 2,
        cfg=cfg,
    )(c2, sc2, sh2, w3b)


def _k4_kernel(cfg, c2_ref, x_ref, sc2_ref, sh2_ref, w3_ref, sc3_ref,
               sh3_ref, wp_ref, scp_ref, shp_ref, y_ref):
    a2 = _bn_relu(c2_ref[0], sc2_ref, sh2_ref)
    c3 = jnp.dot(a2, w3_ref[...], preferred_element_type=jnp.float32).astype(
        jnp.bfloat16)
    bn3 = (c3.astype(jnp.float32) * sc3_ref[...] + sh3_ref[...]).astype(
        jnp.bfloat16)
    if cfg.proj:
        cp = jnp.dot(
            x_ref[0], wp_ref[...], preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        res = (cp.astype(jnp.float32) * scp_ref[...] + shp_ref[...]).astype(
            jnp.bfloat16)
    else:
        res = x_ref[0]
    y = jnp.maximum(
        bn3.astype(jnp.float32) + res.astype(jnp.float32), 0.0
    ).astype(jnp.bfloat16)  # f32 max: Mosaic lacks bf16 compare/select
    # keep padding rows identically zero for the next block in the chain
    y_ref[0] = y * _row_valid(cfg, cfg.slab, _slab_start(cfg))


def _k4(cfg: BlockCfg, c2, x, sc2, sh2, w3b, sc3, sh3, wpb, scp, shp):
    V, PP, F = c2.shape
    S = cfg.slab
    C4 = cfg.out_features
    ins = [c2, x, sc2, sh2, w3b, sc3, sh3]
    in_specs = [
        _slab_spec(S, F),
        _slab_spec(S, x.shape[2]),
        _shared_spec(1, F),
        _shared_spec(1, F),
        _shared_spec(F, C4),
        _shared_spec(1, C4),
        _shared_spec(1, C4),
    ]
    if cfg.proj:
        ins += [wpb, scp, shp]
        in_specs += [
            _shared_spec(cfg.in_features, C4),
            _shared_spec(1, C4),
            _shared_spec(1, C4),
        ]
        kern = functools.partial(_k4_kernel, cfg)
    else:
        def kern(c2_ref, x_ref, sc2_ref, sh2_ref, w3_ref, sc3_ref, sh3_ref,
                 y_ref):
            _k4_kernel(cfg, c2_ref, x_ref, sc2_ref, sh2_ref, w3_ref, sc3_ref,
                       sh3_ref, None, None, None, y_ref)
    return _pallas(
        kern,
        grid=(V, cfg.nslab),
        in_specs=in_specs,
        out_specs=_slab_spec(S, C4),
        out_shape=jax.ShapeDtypeStruct((V, PP, C4), jnp.bfloat16),
        cfg=cfg,
    )(*ins)


def _finalize(s, q, gamma, beta, count, eps):
    """Batch stats + folded scale/shift from accumulated (sum, sum_sq)."""
    mean = s / count  # [1, C]
    var = jnp.maximum(q / count - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    scale = gamma[None, :] * inv
    shift = beta[None, :] - mean * scale
    return mean, var, inv, scale, shift


class _Folded(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray
    inv: jnp.ndarray
    scale: jnp.ndarray
    shift: jnp.ndarray


def _fwd_impl(cfg: BlockCfg, x, params):
    """Runs K1..K4 on padded [V, PP, C]. Returns y, folded stats, (c1, c2)."""
    V = x.shape[0]
    count = float(V * cfg.pixels)
    w1b = params["w1"].astype(jnp.bfloat16)
    w2b = params["w2"].astype(jnp.bfloat16)
    w3b = params["w3"].astype(jnp.bfloat16)
    wpb = params["wp"].astype(jnp.bfloat16) if cfg.proj else None

    r1 = _k1(cfg, x, w1b, wpb)
    if cfg.proj:
        c1, s1, q1, sp, qp = r1
        fp = _Folded(*_finalize(sp, qp, params["gp"], params["bp"], count,
                                cfg.eps))
    else:
        c1, s1, q1 = r1
        fp = None
    f1 = _Folded(*_finalize(s1, q1, params["g1"], params["b1"], count,
                            cfg.eps))

    c2, s2, q2 = _k2(cfg, c1, f1.scale, f1.shift, w2b)
    f2 = _Folded(*_finalize(s2, q2, params["g2"], params["b2"], count,
                            cfg.eps))

    s3, q3 = _k3(cfg, c2, f2.scale, f2.shift, w3b)
    f3 = _Folded(*_finalize(s3, q3, params["g3"], params["b3"], count,
                            cfg.eps))

    y = _k4(cfg, c2, x, f2.scale, f2.shift, w3b, f3.scale, f3.shift,
            wpb, fp.scale if cfg.proj else None,
            fp.shift if cfg.proj else None)
    return y, (f1, f2, f3, fp), (c1, c2)


# ---------------------------------------------------------------------------
# Backward kernels (4 passes; see module docstring)
# ---------------------------------------------------------------------------


def _g3(dy_ref, y_ref):
    # dy padding rows are zero by invariant, so g3 is zero there too
    # (comparisons run in f32: Mosaic has no bf16 compare)
    y = y_ref[0].astype(jnp.float32)
    return dy_ref[0] * (y > 0).astype(jnp.bfloat16)


def _b1_kernel(cfg, dy_ref, y_ref, c2_ref, sc2_ref, sh2_ref, w3_ref,
               m3_ref, i3_ref, x_ref, wp_ref, mp_ref, ip_ref,
               s3a_ref, s3b_ref, spb_ref=None):
    # g3 is zero on padding rows, so every sum here is pad-safe unmasked.
    g3 = _g3(dy_ref, y_ref).astype(jnp.float32)
    a2 = _bn_relu(c2_ref[0], sc2_ref, sh2_ref)
    c3 = jnp.dot(a2, w3_ref[...], preferred_element_type=jnp.float32).astype(
        jnp.bfloat16)
    xhat3 = (c3.astype(jnp.float32) - m3_ref[...]) * i3_ref[...]
    _accum_into(s3a_ref, jnp.sum(g3, axis=0, keepdims=True))
    _accum_into(s3b_ref, jnp.sum(g3 * xhat3, axis=0, keepdims=True))
    if cfg.proj:
        cp = jnp.dot(
            x_ref[0], wp_ref[...], preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        xhatp = (cp.astype(jnp.float32) - mp_ref[...]) * ip_ref[...]
        _accum_into(spb_ref, jnp.sum(g3 * xhatp, axis=0, keepdims=True))


def _b1(cfg: BlockCfg, dy, y, c2, f2, w3b, f3, x, wpb, fp):
    S = cfg.slab
    F = cfg.features
    C4 = cfg.out_features
    ins = [dy, y, c2, f2.scale, f2.shift, w3b, f3.mean, f3.inv]
    in_specs = [
        _slab_spec(S, C4), _slab_spec(S, C4), _slab_spec(S, F),
        _shared_spec(1, F), _shared_spec(1, F), _shared_spec(F, C4),
        _shared_spec(1, C4), _shared_spec(1, C4),
    ]
    outs = [jax.ShapeDtypeStruct((1, C4), jnp.float32)] * 2
    out_specs = [_shared_spec(1, C4)] * 2
    if cfg.proj:
        ins += [x, wpb, fp.mean, fp.inv]
        in_specs += [_slab_spec(S, cfg.in_features),
                     _shared_spec(cfg.in_features, C4),
                     _shared_spec(1, C4), _shared_spec(1, C4)]
        outs.append(jax.ShapeDtypeStruct((1, C4), jnp.float32))
        out_specs.append(_shared_spec(1, C4))
        kern = functools.partial(_b1_kernel, cfg)
    else:
        def kern(dy_r, y_r, c2_r, sc2, sh2, w3_r, m3, i3, s3a, s3b):
            _b1_kernel(cfg, dy_r, y_r, c2_r, sc2, sh2, w3_r, m3, i3,
                       None, None, None, None, s3a, s3b)
    return _pallas(
        kern, grid=(dy.shape[0], cfg.nslab), in_specs=in_specs,
        out_specs=out_specs, out_shape=outs, cfg=cfg,
    )(*ins)


def _b2_kernel(cfg, dy_ref, y_ref, c2_ref, sc2_ref, sh2_ref, w3_ref,
               w3t_ref, m3_ref, i3_ref, k3_ref, d3a_ref, d3b_ref,
               m2_ref, i2_ref, g2_ref, dw3_ref, s2a_ref, s2b_ref):
    g3 = _g3(dy_ref, y_ref).astype(jnp.float32)
    a2 = _bn_relu(c2_ref[0], sc2_ref, sh2_ref)
    c3 = jnp.dot(a2, w3_ref[...], preferred_element_type=jnp.float32).astype(
        jnp.bfloat16)
    xhat3 = (c3.astype(jnp.float32) - m3_ref[...]) * i3_ref[...]
    dc3 = (k3_ref[...] * (g3 - d3a_ref[...] - xhat3 * d3b_ref[...])).astype(
        jnp.bfloat16)
    # the -d3a term resurrects padding rows; re-zero before contractions
    dc3 = dc3 * _row_valid(cfg, cfg.slab, _slab_start(cfg))
    _accum_into(dw3_ref, jax.lax.dot_general(
        a2, dc3, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    da2 = jnp.dot(dc3, w3t_ref[...], preferred_element_type=jnp.float32)
    g2 = (da2 * (a2.astype(jnp.float32) > 0)).astype(jnp.bfloat16)
    g2_ref[0] = g2
    g2f = g2.astype(jnp.float32)
    xhat2 = (c2_ref[0].astype(jnp.float32) - m2_ref[...]) * i2_ref[...]
    _accum_into(s2a_ref, jnp.sum(g2f, axis=0, keepdims=True))
    _accum_into(s2b_ref, jnp.sum(g2f * xhat2, axis=0, keepdims=True))


def _b2(cfg: BlockCfg, dy, y, c2, f2, w3b, w3tb, f3, d3a, d3b):
    V, PP, F = c2.shape
    S = cfg.slab
    C4 = cfg.out_features
    # the BN-backward channel factor gamma*inv is the folded forward scale
    k3 = f3.scale
    return _pallas(
        functools.partial(_b2_kernel, cfg),
        grid=(V, cfg.nslab),
        in_specs=[
            _slab_spec(S, C4), _slab_spec(S, C4), _slab_spec(S, F),
            _shared_spec(1, F), _shared_spec(1, F),
            _shared_spec(F, C4), _shared_spec(C4, F),
            _shared_spec(1, C4), _shared_spec(1, C4), _shared_spec(1, C4),
            _shared_spec(1, C4), _shared_spec(1, C4),
            _shared_spec(1, F), _shared_spec(1, F),
        ],
        out_specs=[
            _slab_spec(S, F),
            _shared_spec(F, C4),
            _shared_spec(1, F), _shared_spec(1, F),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((V, PP, F), jnp.bfloat16),
            jax.ShapeDtypeStruct((F, C4), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
        ],
        cfg=cfg,
    )(dy, y, c2, f2.scale, f2.shift, w3b, w3tb, f3.mean, f3.inv, k3,
      d3a, d3b, f2.mean, f2.inv)


def _b3_kernel(cfg, *refs):
    nwin = 1 if cfg.nslab == 1 else 3
    g2w = refs[:nwin]
    c2w = refs[nwin:2 * nwin]
    c1w = refs[2 * nwin:3 * nwin]
    (sc1_ref, sh1_ref, k2_ref, d2a_ref, d2b_ref, m2_ref, i2_ref, w2t_ref,
     m1_ref, i1_ref) = refs[3 * nwin:3 * nwin + 10]
    g1_ref, dw2_ref, s1a_ref, s1b_ref = refs[3 * nwin + 10:]
    S, Hh = cfg.slab, cfg.halo
    start = _slab_start(cfg)

    # dc2 over the halo window (needed by the conv adjoint)
    g2win = _window(cfg, *_take3(cfg, g2w)).astype(jnp.float32)
    c2win = _window(cfg, *_take3(cfg, c2w))
    xhat2 = (c2win.astype(jnp.float32) - m2_ref[...]) * i2_ref[...]
    dc2 = (k2_ref[...] * (g2win - d2a_ref[...] - xhat2 * d2b_ref[...])
           ).astype(jnp.bfloat16)
    dc2 = dc2 * _row_valid(cfg, dc2.shape[0], start - Hh)

    # a1 over the halo window (needed by the weight-grad taps)
    a1w = _bn_relu(_window(cfg, *_take3(cfg, c1w)), sc1_ref, sh1_ref)
    a1w = a1w * _row_valid(cfg, a1w.shape[0], start - Hh)

    nf, nl = _col_masks(cfg, S, start)
    dc2_cur = dc2[Hh:Hh + S, :]
    dw2 = []
    for k, (dy_, dx) in enumerate(_OFFSETS):
        # dw2[k] = sum_p shift_k(a1 col-masked)[p] (x) dc2[p]; fold the
        # source-column mask onto dc2's output rows (dx=+1 masks out rows
        # at column W-1, dx=-1 at column 0)
        a1s = a1w[Hh + dy_ * cfg.width + dx:Hh + dy_ * cfg.width + dx + S, :]
        d = dc2_cur
        if dx == 1:
            d = d * nl
        elif dx == -1:
            d = d * nf
        dw2.append(jax.lax.dot_general(
            a1s, d, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[None])
    _accum_into(dw2_ref, jnp.concatenate(dw2, axis=0))

    # adjoint conv: da1[q] = sum_k mask_k(q) * dc2[q - off_k] @ w2[k]^T
    da1 = _conv_taps(cfg, dc2, w2t_ref[...], adjoint=True)
    a1_cur = a1w[Hh:Hh + S, :]
    g1 = (da1 * (a1_cur.astype(jnp.float32) > 0)).astype(jnp.bfloat16)
    g1_ref[0] = g1
    g1f = g1.astype(jnp.float32)
    c1_cur = c1w[1][0] if nwin == 3 else c1w[0][0]
    xhat1 = (c1_cur.astype(jnp.float32) - m1_ref[...]) * i1_ref[...]
    _accum_into(s1a_ref, jnp.sum(g1f, axis=0, keepdims=True))
    _accum_into(s1b_ref, jnp.sum(g1f * xhat1, axis=0, keepdims=True))


def _b3(cfg: BlockCfg, g2, c1, c2, f1, f2, d2a, d2b, w2tb):
    V, PP, F = c1.shape
    S = cfg.slab
    k2 = f2.scale
    ins, in_specs = [], []
    for arr in (g2, c2, c1):
        w, s = _c1_windows(cfg, arr)
        ins += w
        in_specs += s
    shared = [f1.scale, f1.shift, k2, d2a, d2b, f2.mean, f2.inv, w2tb,
              f1.mean, f1.inv]
    shared_specs = [
        _shared_spec(1, F), _shared_spec(1, F), _shared_spec(1, F),
        _shared_spec(1, F), _shared_spec(1, F), _shared_spec(1, F),
        _shared_spec(1, F), _shared_spec(9, F, F),
        _shared_spec(1, F), _shared_spec(1, F),
    ]
    return _pallas(
        functools.partial(_b3_kernel, cfg),
        grid=(V, cfg.nslab),
        in_specs=in_specs + shared_specs,
        out_specs=[
            _slab_spec(S, F),
            _shared_spec(9, F, F),
            _shared_spec(1, F), _shared_spec(1, F),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((V, PP, F), jnp.bfloat16),
            jax.ShapeDtypeStruct((9, F, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
        ],
        cfg=cfg,
    )(*ins, *shared)


def _b4_kernel(cfg, g1_ref, c1_ref, x_ref, dy_ref, y_ref, k1_ref,
               d1a_ref, d1b_ref, m1_ref, i1_ref, w1t_ref,
               wp_ref, wpt_ref, kp_ref, dpa_ref, dpb_ref, mp_ref, ip_ref,
               dx_ref, dw1_ref, dwp_ref=None):
    valid = _row_valid(cfg, cfg.slab, _slab_start(cfg))
    x = x_ref[0]
    xhat1 = (c1_ref[0].astype(jnp.float32) - m1_ref[...]) * i1_ref[...]
    dc1 = (k1_ref[...] * (g1_ref[0].astype(jnp.float32) - d1a_ref[...]
                          - xhat1 * d1b_ref[...])).astype(jnp.bfloat16)
    dc1 = dc1 * valid
    _accum_into(dw1_ref, jax.lax.dot_general(
        x, dc1, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    dx = jnp.dot(dc1, w1t_ref[...], preferred_element_type=jnp.float32)
    g3 = _g3(dy_ref, y_ref).astype(jnp.float32)
    if cfg.proj:
        cp = jnp.dot(x, wp_ref[...], preferred_element_type=jnp.float32
                     ).astype(jnp.bfloat16)
        xhatp = (cp.astype(jnp.float32) - mp_ref[...]) * ip_ref[...]
        dcp = (kp_ref[...] * (g3 - dpa_ref[...] - xhatp * dpb_ref[...])
               ).astype(jnp.bfloat16)
        dcp = dcp * valid
        _accum_into(dwp_ref, jax.lax.dot_general(
            x, dcp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dx = dx + jnp.dot(dcp, wpt_ref[...],
                          preferred_element_type=jnp.float32)
    else:
        dx = dx + g3
    dx_ref[0] = dx.astype(jnp.bfloat16)


def _b4(cfg: BlockCfg, g1, c1, x, dy, y, f1, d1a, d1b, w1tb,
        wpb, wptb, fp, dpa, dpb):
    V, PP, F = c1.shape
    S = cfg.slab
    C = cfg.in_features
    C4 = cfg.out_features
    k1 = f1.scale
    ins = [g1, c1, x, dy, y, k1, d1a, d1b, f1.mean, f1.inv, w1tb]
    in_specs = [
        _slab_spec(S, F), _slab_spec(S, F), _slab_spec(S, C),
        _slab_spec(S, C4), _slab_spec(S, C4),
        _shared_spec(1, F), _shared_spec(1, F), _shared_spec(1, F),
        _shared_spec(1, F), _shared_spec(1, F),
        _shared_spec(F, C),
    ]
    outs = [
        jax.ShapeDtypeStruct((V, PP, C), jnp.bfloat16),
        jax.ShapeDtypeStruct((C, F), jnp.float32),
    ]
    out_specs = [_slab_spec(S, C), _shared_spec(C, F)]
    if cfg.proj:
        ins += [wpb, wptb, fp.scale, dpa, dpb, fp.mean, fp.inv]
        in_specs += [
            _shared_spec(C, C4), _shared_spec(C4, C),
            _shared_spec(1, C4), _shared_spec(1, C4), _shared_spec(1, C4),
            _shared_spec(1, C4), _shared_spec(1, C4),
        ]
        outs.append(jax.ShapeDtypeStruct((C, C4), jnp.float32))
        out_specs.append(_shared_spec(C, C4))
        kern = functools.partial(_b4_kernel, cfg)
    else:
        def kern(g1_r, c1_r, x_r, dy_r, y_r, k1_r, d1a_r, d1b_r, m1_r,
                 i1_r, w1t_r, dx_r, dw1_r):
            _b4_kernel(cfg, g1_r, c1_r, x_r, dy_r, y_r, k1_r, d1a_r, d1b_r,
                       m1_r, i1_r, w1t_r, None, None, None, None, None,
                       None, None, dx_r, dw1_r)
    return _pallas(
        kern, grid=(V, cfg.nslab), in_specs=in_specs, out_specs=out_specs,
        out_shape=outs, cfg=cfg,
    )(*ins)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _stats_out(cfg: BlockCfg, folded):
    """Batch (mean, var) per BN, shaped [C] — for running-average updates."""
    f1, f2, f3, fp = folded
    out = {
        "bn1": (f1.mean[0], f1.var[0]),
        "bn2": (f2.mean[0], f2.var[0]),
        "bn3": (f3.mean[0], f3.var[0]),
    }
    if cfg.proj:
        out["bnp"] = (fp.mean[0], fp.var[0])
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def bottleneck_fused(cfg: BlockCfg, x, params):
    """Fused train-mode bottleneck on padded input.

    ``x``: [V, cfg.padded, C] with rows >= cfg.pixels identically zero
    (use ``pad_pixels``). Returns ``(y, stats)`` with y padded the same
    way; ``stats`` maps bn1/bn2/bn3(/bnp) to batch (mean, var) — auxiliary
    outputs with zero cotangent. ``params`` keys: w1 [C,F], w2 [9,F,F]
    (3x3 taps row-major), w3 [F,4F], g*/b* per BN, plus wp/gp/bp when
    ``cfg.proj``.
    """
    y, folded, _ = _fwd_impl(cfg, x, params)
    return y, _stats_out(cfg, folded)


def _fused_fwd(cfg: BlockCfg, x, params):
    y, folded, (c1, c2) = _fwd_impl(cfg, x, params)
    return (y, _stats_out(cfg, folded)), (x, params, y, c1, c2, folded)


def _fused_bwd(cfg: BlockCfg, res, cts):
    dy, _ = cts  # stats cotangents are structurally zero
    x, params, y, c1, c2, (f1, f2, f3, fp) = res
    count = jnp.float32(x.shape[0] * cfg.pixels)
    dy = dy.astype(jnp.bfloat16)
    w1b = params["w1"].astype(jnp.bfloat16)
    w2b = params["w2"].astype(jnp.bfloat16)
    w3b = params["w3"].astype(jnp.bfloat16)
    w1tb = w1b.T
    w2tb = jnp.transpose(w2b, (0, 2, 1))
    w3tb = w3b.T
    wpb = params["wp"].astype(jnp.bfloat16) if cfg.proj else None
    wptb = wpb.T if cfg.proj else None

    r1 = _b1(cfg, dy, y, c2, f2, w3b, f3, x, wpb, fp)
    if cfg.proj:
        s3a, s3b, spb = r1
    else:
        s3a, s3b = r1
    g2, dw3, s2a, s2b = _b2(
        cfg, dy, y, c2, f2, w3b, w3tb, f3, s3a / count, s3b / count)
    g1, dw2, s1a, s1b = _b3(
        cfg, g2, c1, c2, f1, f2, s2a / count, s2b / count, w2tb)
    if cfg.proj:
        dx, dw1, dwp = _b4(
            cfg, g1, c1, x, dy, y, f1, s1a / count, s1b / count, w1tb,
            wpb, wptb, fp, s3a / count, spb / count)
    else:
        dx, dw1 = _b4(
            cfg, g1, c1, x, dy, y, f1, s1a / count, s1b / count, w1tb,
            None, None, None, None, None)

    pd = params["w1"].dtype
    grads = {
        "w1": dw1.astype(pd), "w2": dw2.astype(pd), "w3": dw3.astype(pd),
        "g1": s1b[0].astype(pd), "b1": s1a[0].astype(pd),
        "g2": s2b[0].astype(pd), "b2": s2a[0].astype(pd),
        "g3": s3b[0].astype(pd), "b3": s3a[0].astype(pd),
    }
    if cfg.proj:
        grads["wp"] = dwp.astype(pd)
        grads["gp"] = spb[0].astype(pd)
        grads["bp"] = s3a[0].astype(pd)  # same upstream g3 feeds both paths
    return dx.astype(x.dtype), grads


bottleneck_fused.defvjp(_fused_fwd, _fused_bwd)
