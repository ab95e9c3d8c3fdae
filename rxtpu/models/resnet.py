"""Flax ResNet backbones with a 6-channel microscopy stem.

TPU-first reimplementation of the reference backbone
(``cell_classifier/models.py:16-29``: torchvision resnet50, conv1 swapped
for a 6-in-channel 7x7 stride-2 conv, fc removed). Design choices:

- NHWC layout end to end (XLA's native conv layout on TPU; channels-last
  keeps the lane dimension dense for the MXU).
- bfloat16 compute / float32 params and BatchNorm statistics.
- BatchNorm semantics match torch defaults (eps 1e-5, running-stat
  momentum 0.1 => flax ``momentum=0.9``); batch statistics are computed
  over the per-shard batch exactly like ``nn.DataParallel`` replicas
  (SURVEY.md §7 "BatchNorm under data parallelism") unless ``bn_axis_name``
  requests a cross-replica mean.

The 6-channel stem initialization rule of ``models.py:24-26`` (replicate the
mean-over-RGB of a pretrained conv1 kernel across all 6 input channels) is
implemented in ``rxtpu.models.pretrained.stem_kernel_from_rgb``.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rxtpu.models.norm import TorchBatchNorm

ModuleDef = Any


class ResNetBlock(nn.Module):
    """Basic 3x3+3x3 residual block (resnet18/34)."""

    filters: int
    conv: ModuleDef
    norm: ModuleDef
    strides: Tuple[int, int] = (1, 1)
    # int8-resident W8A8 inference dataflow (rxtpu.models.quant): x and the
    # return value are (int8, scale) pairs, relu/requantize fold into the
    # conv epilogues, the residual branch reads the int8 tensor
    quantized: bool = False

    @nn.compact
    def __call__(self, x, out_scale=None):
        if self.quantized:
            scales = self.variables["params"]
            residual = x
            xin = x[0] if isinstance(x, tuple) else x
            y = self.conv(self.filters, (3, 3), self.strides,
                          padding=[(1, 1), (1, 1)], name="Conv_0")(
                x, out_scale=scales["Conv_1"]["in_scale"], relu_out=True)
            if self.strides != (1, 1) or xin.shape[-1] != self.filters:
                # see BottleneckBlock: int8-resident proj residual
                residual = self.conv(self.filters, (1, 1), self.strides,
                                     name="conv_proj")(
                    residual, out_scale=scales["conv_proj"].get("out_scale"))
            return self.conv(self.filters, (3, 3),
                             padding=[(1, 1), (1, 1)], name="Conv_1")(
                y, out_scale=out_scale, relu_out=True, residual=residual)
        residual = x
        # conv names are explicit (== what auto-naming produced) so the
        # quantized/observed conv classes keep identical parameter paths
        # explicit (1,1) padding == torch Conv2d(padding=1); XLA 'SAME'
        # would pad (0,1) at stride 2, shifting the grid one pixel vs torch
        y = self.conv(self.filters, (3, 3), self.strides,
                      padding=[(1, 1), (1, 1)], name="Conv_0")(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)],
                      name="Conv_1")(y)
        y = self.norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1), self.strides, name="conv_proj")(residual)
            residual = self.norm(name="norm_proj")(residual)
        return nn.relu(residual + y)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck block (resnet50/101/152)."""

    filters: int
    conv: ModuleDef
    norm: ModuleDef
    strides: Tuple[int, int] = (1, 1)
    quantized: bool = False  # see ResNetBlock.quantized

    @nn.compact
    def __call__(self, x, out_scale=None):
        if self.quantized:
            scales = self.variables["params"]
            residual = x
            xin = x[0] if isinstance(x, tuple) else x
            y = self.conv(self.filters, (1, 1), name="Conv_0")(
                x, out_scale=scales["Conv_1"]["in_scale"], relu_out=True)
            y = self.conv(self.filters, (3, 3), self.strides,
                          padding=[(1, 1), (1, 1)], name="Conv_1")(
                y, out_scale=scales["Conv_2"]["in_scale"], relu_out=True)
            if self.strides != (1, 1) or xin.shape[-1] != self.filters * 4:
                # int8-resident residual: the proj output requantizes with
                # its own calibrated output range (no relu — pre-add value)
                residual = self.conv(self.filters * 4, (1, 1), self.strides,
                                     name="conv_proj")(
                    residual, out_scale=scales["conv_proj"].get("out_scale"))
            return self.conv(self.filters * 4, (1, 1), name="Conv_2")(
                y, out_scale=out_scale, relu_out=True, residual=residual)
        residual = x
        # conv names are explicit (== what auto-naming produced) so the
        # quantized/observed conv classes keep identical parameter paths
        y = self.conv(self.filters, (1, 1), name="Conv_0")(x)
        y = self.norm()(y)
        y = nn.relu(y)
        # explicit (1,1) padding == torch Conv2d(padding=1); XLA 'SAME'
        # would pad (0,1) at stride 2, shifting the grid one pixel vs torch
        y = self.conv(self.filters, (3, 3), self.strides,
                      padding=[(1, 1), (1, 1)], name="Conv_1")(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters * 4, (1, 1), name="Conv_2")(y)
        y = self.norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters * 4, (1, 1), self.strides, name="conv_proj")(residual)
            residual = self.norm(name="norm_proj")(residual)
        return nn.relu(residual + y)


class ResNet(nn.Module):
    """Feature extractor: stem + 4 stages + global average pool.

    Returns [N, num_features] embeddings (the reference removes ``fc`` via
    ``nn.Identity()``, models.py:29 — here there is simply no head).
    """

    stage_sizes: Sequence[int]
    block_cls: ModuleDef
    num_filters: int = 64
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None  # None = per-replica stats (DataParallel parity)
    # Substitute the fused Pallas bottleneck (rxtpu.ops.fused_block) for
    # stride-1 bottlenecks during training. Parameter trees are identical
    # either way, so the flag can differ between train and eval applies.
    fuse_blocks: bool = False
    # Inference-only variant consuming BN-folded weights
    # (rxtpu.infer.fold): convs carry a bias, norms are gone entirely.
    folded: bool = False
    # Input is the STEM OUTPUT (post conv_init/bn/relu/maxpool), produced
    # by the fused Pallas stem kernel (rxtpu.ops.fused_stem); skip the
    # stem ops here. The conv_init/bn_init params still exist in the tree
    # (flax ignores unconsumed variables at apply time).
    stem_input: bool = False
    # W8A8 inference variants (rxtpu.models.quant / rxtpu.infer.quant),
    # both folded-only: `quantized` consumes the int8 weight tree;
    # `quant_observe` runs the folded f32 forward while recording per-conv
    # input ranges into the mutable 'qstats' collection (calibration).
    quantized: bool = False
    quant_observe: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not (self.folded and train), "folded weights are eval-only"
        if self.quantized or self.quant_observe:
            assert self.folded, "quantization builds on BN-folded weights"
        if self.quantized:
            from rxtpu.models.quant import QuantConv
            conv_cls = QuantConv
        elif self.quant_observe:
            from rxtpu.models.quant import ObservedConv
            conv_cls = ObservedConv
        else:
            conv_cls = nn.Conv
        conv = functools.partial(
            conv_cls,
            use_bias=self.folded,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        )
        if self.folded:
            def norm(*_a, **_k):  # BN lives inside the conv weights now
                return lambda y: y
        else:
            norm = functools.partial(
                TorchBatchNorm,
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                axis_name=self.bn_axis_name if train else None,
            )

        qnames = qscales = None
        if self.quantized:
            # int8-resident dataflow: each producer requantizes to the
            # NEXT conv's calibrated scale in its own epilogue; the scales
            # are the consumers' in_scale params, read from the tree here
            qnames = [f"stage{i+1}_block{j+1}"
                      for i, bs in enumerate(self.stage_sizes)
                      for j in range(bs)]
            pvars = self.variables["params"]
            qscales = [pvars[n]["Conv_0"]["in_scale"] for n in qnames]

        if not (self.quantized and x.dtype == jnp.int8):
            # int8 input = quantize-at-source views already at the stem
            # conv's calibrated scale (quant.py QuantConv contract); a
            # bf16 cast here would silently dequantize-by-identity
            x = x.astype(self.dtype)
        if not self.stem_input:
            # 6-channel stem: 7x7/2 conv (models.py:18-27), 3x3/2 maxpool.
            if self.quantized:
                from rxtpu.models.quant import quant_max_pool

                # stride 2 < window 3 => every pre-pool value lands in some
                # window, so max(pool(x)) == max(x) and quantizing BEFORE
                # the pool with the pool-output calibration is exact
                x = conv(self.num_filters, (7, 7), (2, 2),
                         padding=[(3, 3), (3, 3)], name="conv_init")(
                    x, out_scale=qscales[0], relu_out=True)
                x = quant_max_pool(x)
            else:
                x = conv(self.num_filters, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], name="conv_init")(x)
                x = norm(name="bn_init")(x)
                x = nn.relu(x)
                # NOTE: rxtpu.ops.maxpool's elementwise custom-vjp backward
                # was A/B-measured 15 ms/step SLOWER than select-and-scatter
                # here (OPTIMIZATION.md round 3); the XLA default stays.
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        fuse = (
            self.fuse_blocks
            and train
            and self.block_cls is BottleneckBlock
            and self.bn_axis_name is None
        )
        for i, block_size in enumerate(self.stage_sizes):
            flat_hw = None  # (h, w) while x is flat-padded inside a fused run
            for j in range(block_size):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                name = f"stage{i+1}_block{j+1}"
                if fuse and strides == (1, 1):
                    from rxtpu.models.fused import FusedBottleneckBlock
                    from rxtpu.ops.fused_block import (
                        DEFAULT_SLAB_TARGET, pad_pixels, plan_block)

                    # one slab_target for the stage pad AND every block's
                    # internal plan — they must agree on the padded size
                    slab_target = DEFAULT_SLAB_TARGET
                    if flat_hw is None:
                        # flatten + zero-pad once per run of fused blocks;
                        # the pad rows stay zero across the whole run
                        n, h, w, c = x.shape
                        x = pad_pixels(
                            x.reshape(n, h * w, c),
                            plan_block(h, w, self.num_filters * 2**i, c,
                                       slab_target=slab_target))
                        flat_hw = (h, w)
                    x = FusedBottleneckBlock(
                        self.num_filters * 2**i,
                        strides=strides,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        slab_target=slab_target,
                        height=flat_hw[0],
                        width=flat_hw[1],
                        name=name,
                    )(x)
                elif self.quantized:
                    k = qnames.index(name)
                    nxt = qscales[k + 1] if k + 1 < len(qnames) else None
                    x = self.block_cls(
                        self.num_filters * 2**i,
                        strides=strides,
                        conv=conv,
                        norm=norm,
                        quantized=True,
                        name=name,
                    )(x, out_scale=nxt)
                else:
                    x = self.block_cls(
                        self.num_filters * 2**i,
                        strides=strides,
                        conv=conv,
                        norm=norm,
                        name=name,
                    )(x)
            if flat_hw is not None:
                h, w = flat_hw
                n = x.shape[0]
                x = x[:, :h * w, :].reshape(n, h, w, x.shape[-1])
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> [N, F]
        return x.astype(self.dtype)


def resnet18(**kw) -> ResNet:
    return ResNet(stage_sizes=[2, 2, 2, 2], block_cls=ResNetBlock, **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(stage_sizes=[3, 4, 6, 3], block_cls=ResNetBlock, **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(stage_sizes=[3, 4, 6, 3], block_cls=BottleneckBlock, **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(stage_sizes=[3, 4, 23, 3], block_cls=BottleneckBlock, **kw)


def resnet152(**kw) -> ResNet:
    return ResNet(stage_sizes=[3, 8, 36, 3], block_cls=BottleneckBlock, **kw)


BACKBONE_FEATURES = {
    "resnet18": 512,
    "resnet34": 512,
    "resnet50": 2048,
    "resnet101": 2048,
    "resnet152": 2048,
    "densenet121": 1024,
}


def make_backbone(arch: str, **kw):
    if arch == "resnet18":
        return resnet18(**kw)
    if arch == "resnet34":
        return resnet34(**kw)
    if arch == "resnet50":
        return resnet50(**kw)
    if arch == "resnet101":
        return resnet101(**kw)
    if arch == "resnet152":
        return resnet152(**kw)
    if arch == "densenet121":
        from rxtpu.models.densenet import densenet121

        kw.pop("fuse_blocks", None)  # bottleneck fusion is ResNet-only
        if kw.pop("folded", False):  # BN folding is ResNet-only (fold.py)
            raise ValueError("densenet121 does not support BN folding")
        if kw.pop("stem_input", False):  # fused stem is ResNet-only
            raise ValueError("densenet121 does not support the fused stem")
        return densenet121(**kw)
    raise ValueError(f"unknown backbone {arch!r}")
