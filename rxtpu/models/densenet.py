"""Flax DenseNet-121 with a 6-channel stem (BASELINE config 2).

Fresh NHWC/bfloat16 implementation of the DenseNet-BC architecture
(growth 32, blocks 6/12/24/16) so the framework offers the reference's
alternative-backbone capability without torchvision.
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
        y = self.norm()(x)
        y = nn.relu(y)
        y = self.conv(4 * self.growth_rate, (1, 1))(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.growth_rate, (3, 3))(y)
        return jnp.concatenate([x, y], axis=-1)


class TransitionLayer(nn.Module):
    out_features: int
    conv: Any
    norm: Any

    @nn.compact
    def __call__(self, x):
        x = self.norm()(x)
        x = nn.relu(x)
        x = self.conv(self.out_features, (1, 1))(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    block_sizes: Sequence[int] = (6, 12, 24, 16)
    growth_rate: int = 32
    num_init_features: int = 64
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = functools.partial(
            nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        )
        norm = functools.partial(
            TorchBatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
            axis_name=self.bn_axis_name if train else None,
        )
        x = x.astype(self.dtype)
        x = conv(self.num_init_features, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], name="conv_init")(x)
        x = norm(name="bn_init")(x)
        x = nn.relu(x)
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
        x = norm(name="bn_final")(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return x.astype(self.dtype)


def densenet121(**kw) -> DenseNet:
    return DenseNet(block_sizes=(6, 12, 24, 16), **kw)
