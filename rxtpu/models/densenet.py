"""Flax DenseNet-121 with a 6-channel stem (BASELINE config 2).

Fresh NHWC/bfloat16 implementation of the DenseNet-BC architecture
(growth 32, blocks 6/12/24/16) so the framework offers the reference's
alternative-backbone capability without torchvision.

W8A8 int8 inference (``quantized``/``quant_observe`` flags) follows the
resnet design (rxtpu/models/quant.py) adapted to pre-activation BN:
concat segments travel as int8 with per-segment scales; each BN-relu is
an explicit per-channel affine fused with the requantize
(``QuantPreNorm``); the post-conv BNs (stem bn_init, each layer's BN2
which follows Conv_0) fold into the conv dequant scale/bias exactly; and
because quantization is symmetric zero-point-free, conv zero padding
stays exact. Calibration runs the standard eval forward with
``ObservedConv`` recording per-conv ranges plus segment-range sows.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from rxtpu.models.norm import TorchBatchNorm


class DenseLayer(nn.Module):
    growth_rate: int
    conv: Any
    norm: Any

    @nn.compact
    def __call__(self, x):
        # explicit names so the calibration pass (ObservedConv) binds the
        # same tree nn.Conv auto-naming produced
        y = self.norm()(x)
        y = nn.relu(y)
        y = self.conv(4 * self.growth_rate, (1, 1), name="Conv_0")(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.growth_rate, (3, 3), name="Conv_1")(y)
        return jnp.concatenate([x, y], axis=-1)


class TransitionLayer(nn.Module):
    out_features: int
    conv: Any
    norm: Any

    @nn.compact
    def __call__(self, x):
        x = self.norm()(x)
        x = nn.relu(x)
        x = self.conv(self.out_features, (1, 1), name="Conv_0")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class QuantDenseLayer(nn.Module):
    """int8-resident DenseLayer: (int8 state, per-channel scale vec) ->
    same pair with the new segment appended. Parameter scopes mirror the
    eval layer (``BatchNorm_0``/``Conv_0``/``Conv_1``); BN2 lives
    inside Conv_0's dequant scale/bias (post-conv BN folds exactly)."""

    growth_rate: int
    conv: Any

    @nn.compact
    def __call__(self, x):
        from rxtpu.models.quant import QuantPreNorm

        q, svec = x
        p = self.variables["params"]
        s_in2 = p["Conv_0"]["out_scale"]  # = Conv_1's per-channel input scale
        s_out = p["Conv_1"]["out_scale"]
        z = QuantPreNorm(q.shape[-1], name="BatchNorm_0")(
            x, out_scale=p["Conv_0"]["in_scale_vec"])
        z = self.conv(4 * self.growth_rate, (1, 1), name="Conv_0")(
            z, relu_out=True, out_scale=s_in2)
        yq, _ = self.conv(self.growth_rate, (3, 3), name="Conv_1")(
            z, out_scale=s_out)
        return (jnp.concatenate([q, yq], axis=-1),
                jnp.concatenate(
                    [svec, jnp.broadcast_to(s_out, (self.growth_rate,))]))


class QuantTransitionLayer(nn.Module):
    """int8 transition: pre-norm affine+relu+requant, 1x1 int8 conv, avg
    pool in float (means of ints are not ints), requantize to the new
    single-segment state scale."""

    out_features: int
    conv: Any

    @nn.compact
    def __call__(self, x):
        from rxtpu.models.quant import QuantPreNorm, quantize_to

        q, svec = x
        p = self.variables["params"]
        s_out = p["Conv_0"]["out_scale"]
        z = QuantPreNorm(q.shape[-1], name="BatchNorm_0")(
            x, out_scale=p["Conv_0"]["in_scale_vec"])
        t = self.conv(self.out_features, (1, 1), name="Conv_0")(z)
        t = nn.avg_pool(t, (2, 2), strides=(2, 2))
        tq, _ = quantize_to(t, s_out)
        return tq, jnp.broadcast_to(s_out, (self.out_features,))


class DenseNet(nn.Module):
    block_sizes: Sequence[int] = (6, 12, 24, 16)
    growth_rate: int = 32
    num_init_features: int = 64
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    # W8A8 inference variants (rxtpu.models.quant / rxtpu.infer.quant):
    # `quantized` consumes the int8 tree quantize_densenet_backbone
    # builds; `quant_observe` runs the standard eval forward recording
    # per-conv and per-segment ranges into the 'qstats' collection.
    quantized: bool = False
    quant_observe: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.quantized:
            assert not train, "the int8 forward is eval-only"
            return self._quantized(x)
        if self.quant_observe:
            from rxtpu.models.quant import ObservedConv

            conv_cls = ObservedConv
        else:
            conv_cls = nn.Conv
        conv = functools.partial(
            conv_cls, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        )
        norm = functools.partial(
            TorchBatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
            axis_name=self.bn_axis_name if train else None,
        )

        def observe(tag, v):
            if self.quant_observe:
                va = jnp.abs(v.astype(jnp.float32))
                self.sow("qstats", tag, jnp.max(va),
                         init_fn=lambda: jnp.float32(0.0),
                         reduce_fn=lambda a, b: jnp.maximum(a, b))
                # per-channel range: the int8 path quantizes stored
                # segments per channel (see infer/quant._qconv_entry)
                nch = v.shape[-1]
                self.sow("qstats", f"{tag}_ch",
                         jnp.max(va, axis=tuple(range(va.ndim - 1))),
                         init_fn=lambda: jnp.zeros((nch,), jnp.float32),
                         reduce_fn=lambda a, b: jnp.maximum(a, b))

        x = x.astype(self.dtype)
        x = conv(self.num_init_features, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], name="conv_init")(x)
        x = norm(name="bn_init")(x)
        x = nn.relu(x)
        # the stored segment range: stride 2 < window 3 means every value
        # lands in some pool window, so the pre-pool absmax == post-pool
        # absmax and one sow covers the int8 path's quantize-before-pool
        observe("stem_absmax", x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        features = self.num_init_features
        for i, n_layers in enumerate(self.block_sizes):
            for j in range(n_layers):
                x = DenseLayer(self.growth_rate, conv=conv, norm=norm,
                               name=f"block{i+1}_layer{j+1}")(x)
            features += n_layers * self.growth_rate
            if i != len(self.block_sizes) - 1:
                features //= 2
                x = TransitionLayer(features, conv=conv, norm=norm, name=f"transition{i+1}")(x)
                observe(f"transition{i+1}_absmax", x)
        x = norm(name="bn_final")(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return x.astype(self.dtype)

    def _quantized(self, x):
        from rxtpu.models.quant import (
            QuantConv, QuantPreNorm, quant_max_pool)

        conv = functools.partial(
            QuantConv, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype)
        p = self.variables["params"]
        # int8 input = quantize-at-source views already at the stem
        # conv's calibrated scale (models/quant.py QuantConv contract)
        if x.dtype != jnp.int8:
            x = x.astype(self.dtype)
        # stem: post-conv BN (bn_init) folded into conv_init's dequant
        # scale/bias by quantize_densenet_backbone; relu in the epilogue;
        # maxpool on int8 (monotone => exact)
        xq = conv(self.num_init_features, (7, 7), (2, 2),
                  padding=[(3, 3), (3, 3)], name="conv_init")(
            x, relu_out=True, out_scale=p["conv_init"]["out_scale"])
        q, s0 = quant_max_pool(xq)
        svec = jnp.broadcast_to(s0, (self.num_init_features,))
        state = (q, svec)
        features = self.num_init_features
        for i, n_layers in enumerate(self.block_sizes):
            for j in range(n_layers):
                state = QuantDenseLayer(
                    self.growth_rate, conv=conv,
                    name=f"block{i+1}_layer{j+1}")(state)
            features += n_layers * self.growth_rate
            if i != len(self.block_sizes) - 1:
                features //= 2
                state = QuantTransitionLayer(
                    features, conv=conv, name=f"transition{i+1}")(state)
        z = QuantPreNorm(features, name="bn_final")(state, out_scale=None)
        z = jnp.mean(z, axis=(1, 2))
        return z.astype(self.dtype)


def densenet121(**kw) -> DenseNet:
    return DenseNet(block_sizes=(6, 12, 24, 16), **kw)
