"""Classification heads.

- ``MLPHead``: the reference's control-conditioned MLP
  (``cell_classifier/models.py:31-39``): BatchNorm1d -> Dropout -> Dense ->
  ReLU -> BatchNorm1d -> Dropout -> Dense over concatenated
  [img, neg_control, pos_control] features.
- ``ArcFaceHead``: cosine-margin head with feature/weight L2 normalization
  (BASELINE config 4). Margin is applied to the target-class logit during
  training; inference returns plain scaled cosines.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rxtpu.models.norm import TorchBatchNorm


class MLPHead(nn.Module):
    nb_classes: int
    size_features: int = 1024      # models.py:10
    dropout: float = 0.3           # models.py:11
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # Inference-only: consume BN-folded weights (rxtpu.infer.fold) — the
    # bn1/bn2 affines live inside fc1/fc2, so the head is two matmuls.
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dense = lambda f, name: nn.Dense(  # noqa: E731
            f, dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        # logits at >= f32 for a stable softmax/CE; promote (not cast) so
        # an f64 numerics probe keeps f64 logits (bf16/f32 compute -> f32)
        logit_dt = jnp.promote_types(self.dtype, jnp.float32)
        x = x.astype(self.dtype)
        if self.folded:
            assert not train, "folded weights are eval-only"
            x = dense(self.size_features, "fc1")(x)
            x = nn.relu(x)
            x = dense(self.nb_classes, "fc2")(x)
            return x.astype(logit_dt)
        norm = lambda name: TorchBatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        x = norm("bn1")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = dense(self.size_features, "fc1")(x)
        x = nn.relu(x)
        x = norm("bn2")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = dense(self.nb_classes, "fc2")(x)
        return x.astype(logit_dt)


class ArcFaceHead(nn.Module):
    """Additive angular margin head (cos(theta + m) on the target class).

    Feature path mirrors MLPHead up to the embedding, then classifies with
    an L2-normalized weight matrix. ``labels=None`` (inference) returns
    ``scale * cos(theta)`` — directly comparable probabilities after softmax.
    """

    nb_classes: int
    size_features: int = 1024
    dropout: float = 0.3
    margin: float = 0.3
    scale: float = 30.0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, labels: Optional[jnp.ndarray] = None):
        x = x.astype(self.dtype)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=self.param_dtype, name="bn1")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.size_features, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.relu(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=self.param_dtype, name="bn2")(x)
        emb = x.astype(jnp.promote_types(self.dtype, jnp.float32))

        w = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (self.size_features, self.nb_classes),
            self.param_dtype,
        )
        emb_n = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
        w_n = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + 1e-12)
        cos = jnp.clip(emb_n @ w_n, -1.0 + 1e-7, 1.0 - 1e-7)
        if labels is None or not train:
            return self.scale * cos
        theta = jnp.arccos(cos)
        target = jnp.cos(theta + self.margin)
        onehot = jax.nn.one_hot(labels, self.nb_classes, dtype=cos.dtype)
        return self.scale * (onehot * target + (1.0 - onehot) * cos)
