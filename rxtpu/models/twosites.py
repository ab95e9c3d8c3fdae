"""TwoSitesNN: control-conditioned classifier over grouped views.

Reimplements the forward of ``cell_classifier/models.py:41-57`` TPU-first:
the G-view axis is folded into the batch for one large backbone pass (MXU
likes one big conv batch, not three small ones), features are regrouped
``[B, G, F]``, mean-pooled over each third of G (G=3 at train: one view each
of sample / negative control / positive control; G=6 at test: two sites per
group — the built-in two-site TTA), concatenated to ``[B, 3F]`` and fed to
the head.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from rxtpu.models.heads import ArcFaceHead, MLPHead
from rxtpu.models.resnet import BACKBONE_FEATURES, make_backbone


class TwoSitesNN(nn.Module):
    """x: [B, G, H, W, C] with G divisible by 3 -> logits [B, nb_classes]."""

    backbone: str = "resnet50"
    nb_classes: int = 1108
    size_features: int = 1024
    dropout: float = 0.3
    head: str = "mlp"                 # "mlp" | "arcface"
    arcface_margin: float = 0.3
    arcface_scale: float = 30.0
    control_calibration: bool = False  # subtract neg-control embedding (config 4)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    fuse_blocks: bool = False  # Pallas fused bottlenecks in train mode
    folded: bool = False       # BN-folded inference weights (rxtpu.infer.fold)
    stem_input: bool = False   # x is the fused-stem output (rxtpu.ops.fused_stem)
    quantized: bool = False       # W8A8 int8 backbone (rxtpu.infer.quant)
    quant_observe: bool = False   # calibration pass recording conv in-ranges

    @nn.compact
    def __call__(self, x, train: bool = False, labels=None):
        b, g = x.shape[0], x.shape[1]
        assert g % 3 == 0, f"G-view axis must be divisible by 3, got {g}"
        x = x.reshape((b * g,) + x.shape[2:])          # models.py:44
        feats = make_backbone(
            self.backbone,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            bn_axis_name=self.bn_axis_name,
            fuse_blocks=self.fuse_blocks,
            folded=self.folded,
            stem_input=self.stem_input,
            quantized=self.quantized,
            quant_observe=self.quant_observe,
            name="backbone",
        )(x, train=train)                               # [B*G, F]
        f = feats.shape[-1]
        feats = feats.reshape(b, g, f)
        views = g // 3
        # mean over each group of views (models.py:46-50); G=6 => 2-site TTA
        grouped = feats.reshape(b, 3, views, f).mean(axis=2)
        if self.control_calibration:
            # plate-effect calibration (BASELINE config 4): reference the
            # sample and positive-control embeddings against the plate's
            # negative control; the raw neg embedding is kept as context.
            img, neg, pos = grouped[:, 0], grouped[:, 1], grouped[:, 2]
            grouped = jnp.stack([img - neg, neg, pos - neg], axis=1)
        feats = grouped.reshape(b, 3 * f)               # [B, 3F] concat (models.py:51-54)
        if self.head == "arcface":
            assert not self.folded, "BN folding supports the mlp head only"
            return ArcFaceHead(
                nb_classes=self.nb_classes,
                size_features=self.size_features,
                dropout=self.dropout,
                margin=self.arcface_margin,
                scale=self.arcface_scale,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="head",
            )(feats, train=train, labels=labels)
        return MLPHead(
            nb_classes=self.nb_classes,
            size_features=self.size_features,
            dropout=self.dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            folded=self.folded,
            name="head",
        )(feats, train=train)

    @property
    def num_backbone_features(self) -> int:
        return BACKBONE_FEATURES[self.backbone]


class DummyClassifier:
    """Random-logit stand-in for --debug local runs (models.py:60-68).

    Matches the reference's distribution: uniform logits in [-1, 1] with
    1e-4 granularity (``zeros.random_(-10000, 10000) / 10000``).
    """

    def __init__(self, nb_classes: int, seed: int = 0):
        import jax

        self.nb_classes = nb_classes
        self._key = jax.random.PRNGKey(seed)

    def __call__(self, x):
        import jax

        self._key, sub = jax.random.split(self._key)
        bs = x.shape[0]
        ints = jax.random.randint(sub, (bs, self.nb_classes), -10000, 10000)
        return ints.astype(jnp.float32) / 10000.0
