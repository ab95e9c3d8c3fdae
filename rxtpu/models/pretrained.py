"""Pretrained-weight capability: 6-channel stem init + torch checkpoint porting.

The reference builds its stem from torchvision's pretrained resnet50
(``cell_classifier/models.py:16-27``): a new 6-in-channel 7x7 conv whose
kernel is the *mean over RGB* of the pretrained conv1 kernel, replicated
across all 6 input channels. This module reproduces that rule exactly and
adds an offline porting path: given a torch resnet50 ``state_dict`` file
(no torchvision / network needed at runtime), map it onto the Flax
parameter tree of ``rxtpu.models.resnet.resnet50``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def stem_kernel_from_rgb(kernel_rgb_hwio: np.ndarray, nb_channels: int = 6) -> np.ndarray:
    """models.py:24-26: stem = mean-over-RGB of conv1, tiled across channels.

    Args:
      kernel_rgb_hwio: [7, 7, 3, 64] HWIO conv kernel.
    Returns:
      [7, 7, nb_channels, 64] kernel, each input channel = mean over RGB.
    """
    mean = kernel_rgb_hwio.mean(axis=2, keepdims=True)  # [7,7,1,64]
    return np.broadcast_to(mean, mean.shape[:2] + (nb_channels,) + mean.shape[3:]).copy()


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``state_dict`` file into numpy arrays (CPU, offline)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def _conv_oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _make_setters(sd: Dict[str, np.ndarray]):
    """(set_conv, set_bn) closures copying torch tensors into flax trees —
    shared by the resnet and densenet porters."""

    def set_conv(dst: Dict[str, Any], torch_key: str):
        dst["kernel"] = _conv_oihw_to_hwio(sd[torch_key]).astype(dst["kernel"].dtype)

    def set_bn(dst_p: Dict[str, Any], dst_s: Dict[str, Any], torch_prefix: str):
        dst_p["scale"] = sd[f"{torch_prefix}.weight"].astype(dst_p["scale"].dtype)
        dst_p["bias"] = sd[f"{torch_prefix}.bias"].astype(dst_p["bias"].dtype)
        dst_s["mean"] = sd[f"{torch_prefix}.running_mean"].astype(dst_s["mean"].dtype)
        dst_s["var"] = sd[f"{torch_prefix}.running_var"].astype(dst_s["var"].dtype)

    return set_conv, set_bn


_RESNET50_STAGES = [3, 4, 6, 3]

# stage sizes + convs-per-block for every portable torchvision resnet
_RESNET_ARCH = {
    "resnet18": ([2, 2, 2, 2], 2),
    "resnet34": ([3, 4, 6, 3], 2),
    "resnet50": ([3, 4, 6, 3], 3),
    "resnet101": ([3, 4, 23, 3], 3),
    "resnet152": ([3, 8, 36, 3], 3),
}


def port_torch_resnet(
    sd: Dict[str, np.ndarray],
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    arch: str = "resnet50",
    backbone_scope: str = "backbone",
    nb_channels: int = 6,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Copy a torch resnet state_dict into the Flax trees (any variant)."""
    stages, convs_per_block = _RESNET_ARCH[arch]
    return _port_torch_resnet(
        sd, params, batch_stats, stages, convs_per_block, backbone_scope, nb_channels
    )


def port_torch_resnet50(
    sd: Dict[str, np.ndarray],
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    backbone_scope: str = "backbone",
    nb_channels: int = 6,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Copy torch resnet50 weights into the Flax trees (in place on copies).

    Key mapping (torch -> flax under ``params[backbone_scope]``):
      conv1              -> conv_init            (stem: 6-ch rule applied)
      bn1                -> bn_init
      layer{L}.{B}.convN -> stage{L}_block{B+1}.Conv_{N-1}
      layer{L}.{B}.bnN   -> stage{L}_block{B+1}.BatchNorm_{N-1}
      layer{L}.{B}.downsample.0/1 -> conv_proj / norm_proj
    """
    return _port_torch_resnet(sd, params, batch_stats, _RESNET50_STAGES, 3,
                              backbone_scope, nb_channels)


def _port_torch_resnet(
    sd: Dict[str, np.ndarray],
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    stages,
    convs_per_block: int,
    backbone_scope: str,
    nb_channels: int,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)
    p = params[backbone_scope]
    bs = batch_stats[backbone_scope]

    set_conv, set_bn = _make_setters(sd)

    # Stem: 6-channel replication rule.
    rgb = _conv_oihw_to_hwio(sd["conv1.weight"])
    p["conv_init"]["kernel"] = stem_kernel_from_rgb(rgb, nb_channels).astype(
        p["conv_init"]["kernel"].dtype
    )
    set_bn(p["bn_init"], bs["bn_init"], "bn1")

    for li, n_blocks in enumerate(stages):
        for bi in range(n_blocks):
            scope = f"stage{li+1}_block{bi+1}"
            tp = f"layer{li+1}.{bi}"
            for ci in range(convs_per_block):
                set_conv(p[scope][f"Conv_{ci}"], f"{tp}.conv{ci+1}.weight")
                set_bn(
                    p[scope][f"BatchNorm_{ci}"], bs[scope][f"BatchNorm_{ci}"],
                    f"{tp}.bn{ci+1}",
                )
            if f"{tp}.downsample.0.weight" in sd:
                set_conv(p[scope]["conv_proj"], f"{tp}.downsample.0.weight")
                set_bn(p[scope]["norm_proj"], bs[scope]["norm_proj"], f"{tp}.downsample.1")

    params[backbone_scope] = p
    batch_stats[backbone_scope] = bs
    to_jnp = lambda t: jax.tree_util.tree_map(np.asarray, t)  # noqa: E731
    return to_jnp(params), to_jnp(batch_stats)


_DENSENET121_BLOCKS = [6, 12, 24, 16]


def port_torch_densenet121(
    sd: Dict[str, np.ndarray],
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    backbone_scope: str = "backbone",
    nb_channels: int = 6,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Copy a torchvision densenet121 state_dict into the Flax trees.

    Generalizes the reference's pretrained capability (models.py:16,
    ``pretrained=True``) to the densenet backbone it also offers. Mapping
    (torch -> flax under ``params[backbone_scope]``):
      features.conv0                     -> conv_init (6-channel stem rule)
      features.norm0                     -> bn_init
      features.denseblock{B}.denselayer{L}.norm1/conv1/norm2/conv2
          -> block{B}_layer{L}.BatchNorm_0/Conv_0/BatchNorm_1/Conv_1
      features.transition{T}.norm/conv   -> transition{T}.BatchNorm_0/Conv_0
      features.norm5                     -> bn_final
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)
    p = params[backbone_scope]
    bs = batch_stats[backbone_scope]

    set_conv, set_bn = _make_setters(sd)

    rgb = _conv_oihw_to_hwio(sd["features.conv0.weight"])
    p["conv_init"]["kernel"] = stem_kernel_from_rgb(rgb, nb_channels).astype(
        p["conv_init"]["kernel"].dtype
    )
    set_bn(p["bn_init"], bs["bn_init"], "features.norm0")

    for b, n_layers in enumerate(_DENSENET121_BLOCKS, start=1):
        for l in range(1, n_layers + 1):
            scope = f"block{b}_layer{l}"
            tp = f"features.denseblock{b}.denselayer{l}"
            set_bn(p[scope]["BatchNorm_0"], bs[scope]["BatchNorm_0"], f"{tp}.norm1")
            set_conv(p[scope]["Conv_0"], f"{tp}.conv1.weight")
            set_bn(p[scope]["BatchNorm_1"], bs[scope]["BatchNorm_1"], f"{tp}.norm2")
            set_conv(p[scope]["Conv_1"], f"{tp}.conv2.weight")
        if b < len(_DENSENET121_BLOCKS):
            scope = f"transition{b}"
            tp = f"features.transition{b}"
            set_bn(p[scope]["BatchNorm_0"], bs[scope]["BatchNorm_0"], f"{tp}.norm")
            set_conv(p[scope]["Conv_0"], f"{tp}.conv.weight")
    set_bn(p["bn_final"], bs["bn_final"], "features.norm5")

    params[backbone_scope] = p
    batch_stats[backbone_scope] = bs
    return params, batch_stats


def synthetic_densenet121_state_dict(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random torch-format densenet121 state_dict (for tests/fixtures)."""
    growth, init_feats = 32, 64
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}

    def conv(key, o, i, k):
        sd[key] = rng.normal(0, 0.05, size=(o, i, k, k)).astype(np.float32)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.normal(1, 0.02, size=(c,)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(0, 0.02, size=(c,)).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.normal(0, 0.02, size=(c,)).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.abs(rng.normal(1, 0.02, size=(c,))).astype(np.float32)

    conv("features.conv0.weight", init_feats, 3, 7)
    bn("features.norm0", init_feats)
    feats = init_feats
    for b, n_layers in enumerate(_DENSENET121_BLOCKS, start=1):
        for l in range(1, n_layers + 1):
            tp = f"features.denseblock{b}.denselayer{l}"
            bn(f"{tp}.norm1", feats)
            conv(f"{tp}.conv1.weight", 4 * growth, feats, 1)
            bn(f"{tp}.norm2", 4 * growth)
            conv(f"{tp}.conv2.weight", growth, 4 * growth, 3)
            feats += growth
        if b < len(_DENSENET121_BLOCKS):
            bn(f"features.transition{b}.norm", feats)
            conv(f"features.transition{b}.conv.weight", feats // 2, feats, 1)
            feats //= 2
    bn("features.norm5", feats)
    sd["classifier.weight"] = rng.normal(0, 0.02, size=(1000, feats)).astype(np.float32)
    sd["classifier.bias"] = np.zeros(1000, dtype=np.float32)
    return sd


def synthetic_resnet_state_dict(arch: str = "resnet50", seed: int = 0) -> Dict[str, np.ndarray]:
    """Generate a random torch-format resnet state_dict (for tests/fixtures)."""
    stages, convs_per_block = _RESNET_ARCH[arch]
    expansion = 4 if convs_per_block == 3 else 1
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}

    def conv(key, o, i, k):
        sd[key] = rng.normal(0, 0.05, size=(o, i, k, k)).astype(np.float32)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.normal(1, 0.02, size=(c,)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(0, 0.02, size=(c,)).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.normal(0, 0.02, size=(c,)).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.abs(rng.normal(1, 0.02, size=(c,))).astype(np.float32)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    in_ch = 64
    for li, n_blocks in enumerate(stages):
        width = 64 * 2**li
        out_ch = width * expansion
        for bi in range(n_blocks):
            tp = f"layer{li+1}.{bi}"
            if convs_per_block == 3:
                conv(f"{tp}.conv1.weight", width, in_ch, 1)
                bn(f"{tp}.bn1", width)
                conv(f"{tp}.conv2.weight", width, width, 3)
                bn(f"{tp}.bn2", width)
                conv(f"{tp}.conv3.weight", out_ch, width, 1)
                bn(f"{tp}.bn3", out_ch)
            else:
                conv(f"{tp}.conv1.weight", width, in_ch, 3)
                bn(f"{tp}.bn1", width)
                conv(f"{tp}.conv2.weight", out_ch, width, 3)
                bn(f"{tp}.bn2", out_ch)
            if in_ch != out_ch:
                conv(f"{tp}.downsample.0.weight", out_ch, in_ch, 1)
                bn(f"{tp}.downsample.1", out_ch)
            in_ch = out_ch
    sd["fc.weight"] = rng.normal(0, 0.02, size=(1000, in_ch)).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, dtype=np.float32)
    return sd


def synthetic_resnet50_state_dict(seed: int = 0) -> Dict[str, np.ndarray]:
    return synthetic_resnet_state_dict("resnet50", seed)
