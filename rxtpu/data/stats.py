"""Per-experiment / per-channel image statistics — one streaming device pass.

TPU-native replacement for the reference's offline CPU loop
(``compute_stats_experiments.py:8-24``): instead of one ``cv2.imread`` +
numpy accumulation per file, decoded uint8 images stream to the device in
batches and a jit-compiled kernel accumulates per-(experiment, channel)
``count / sum(x) / sum(x^2)`` with ``segment_sum`` on the MXU-adjacent VPU.
Math parity: pixels are scaled by 1/255 (``compute_stats_experiments.py:15``),
``std = sqrt(E[x^2] - E[x]^2)`` (``:21-23``).

The artifact is JSON (``stats_experiments.json``) replacing the pickle
(``compute_stats_experiments.py:27,43-44``); the reference pickle format can
also be read for drop-in parity. A verification pass mirrors
``compute_stats_experiments.py:47-57``.
"""

from __future__ import annotations

import functools
import json
import os
import pickle
from typing import Dict, Iterable, Iterator, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NB_CHANNELS = 6


# Pixels per device-side partial sum. 256 uint8 pixels bound the chunk sums
# by 256*255^2 < 2^24, so the int32->f32-free integer arithmetic below is
# EXACT; all lossy accumulation happens in f64 on the host.
_CHUNK = 256


@functools.partial(jax.jit, static_argnames=("n_chunks",))
def _partial_sums(images: jax.Array, n_chunks: int) -> jax.Array:
    """uint8 [N, H, W] -> int32 [N, n_chunks, 2] exact (sum_v, sum_v2) chunks."""
    n = images.shape[0]
    v = images.reshape(n, -1).astype(jnp.int32)
    pad = n_chunks * _CHUNK - v.shape[1]
    if pad:
        v = jnp.pad(v, ((0, 0), (0, pad)))  # zero pixels add nothing
    v = v.reshape(n, n_chunks, _CHUNK)
    return jnp.stack([v.sum(-1), (v * v).sum(-1)], axis=-1)


def compute_stats_streaming(
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    experiments: Sequence[str],
) -> Dict[str, Dict[str, np.ndarray]]:
    """Single streaming pass over decoded images.

    Args:
      batches: yields ``(images uint8 [N,H,W], bucket_ids int32 [N])`` where
        ``bucket_id = experiment_index * 6 + (channel - 1)``. Batches may be
        zero-padded; padded rows must carry ``bucket_id == -1``.
      experiments: experiment names, indexed by ``experiment_index``.

    Returns ``{experiment: {"mean": [6], "std": [6]}}`` (float64 on host),
    matching the reference pickle's schema (compute_stats_experiments.py:38-41).

    Precision: the device computes exact integer chunk sums (see ``_CHUNK``);
    cross-image accumulation is int64/f64 on the host. At Kaggle scale
    (~5e9 pixels per bucket) a pure-f32 device accumulator would lose the
    low digits of sum(x^2) and the ``sqrt(E[x^2]-E[x]^2)`` subtraction would
    cancel catastrophically — this path instead matches the reference's f64
    host accumulation (compute_stats_experiments.py:8-24) to ~1e-15.
    """
    n_buckets = len(experiments) * NB_CHANNELS
    acc = np.zeros((n_buckets, 3), dtype=np.float64)  # count, sum_x, sum_x2
    for images, bucket_ids in batches:
        valid = bucket_ids >= 0
        npix = int(np.prod(images.shape[1:]))
        n_chunks = -(-npix // _CHUNK)
        parts = np.asarray(_partial_sums(jnp.asarray(images), n_chunks))
        per_img = parts.astype(np.int64).sum(axis=1)  # [N, 2] exact
        ids = bucket_ids[valid]
        np.add.at(acc[:, 0], ids, float(npix))
        np.add.at(acc[:, 1], ids, per_img[valid, 0] / 255.0)
        np.add.at(acc[:, 2], ids, per_img[valid, 1] / (255.0 * 255.0))
    count = acc[:, 0].reshape(len(experiments), NB_CHANNELS)
    sum_x = acc[:, 1].reshape(len(experiments), NB_CHANNELS)
    sum_x2 = acc[:, 2].reshape(len(experiments), NB_CHANNELS)
    out: Dict[str, Dict[str, np.ndarray]] = {}
    with np.errstate(invalid="ignore", divide="ignore"):
        for i, exp in enumerate(experiments):
            mean = sum_x[i] / count[i]  # NaN marks an empty (exp, channel) bucket
            std = np.sqrt(sum_x2[i] / count[i] - mean**2)
            out[exp] = {"mean": mean, "std": std}
    return out


def compute_stats_numpy(
    images_by_bucket: Iterator[Tuple[str, int, np.ndarray]],
) -> Dict[str, Dict[str, np.ndarray]]:
    """Host-side golden reference: same math as compute_stats_experiments.py:8-24.

    Takes ``(experiment, channel_1based, uint8 image)`` triples.
    Used by tests to validate the streaming device pass.
    """
    acc: Dict[str, np.ndarray] = {}
    for exp, channel, img in images_by_bucket:
        a = acc.setdefault(exp, np.zeros((NB_CHANNELS, 3), dtype=np.float64))
        x = img.astype(np.float64) / 255.0
        a[channel - 1, 0] += x.size
        a[channel - 1, 1] += x.sum()
        a[channel - 1, 2] += (x**2).sum()
    out = {}
    for exp, a in acc.items():
        mean = a[:, 1] / a[:, 0]
        std = np.sqrt(a[:, 2] / a[:, 0] - mean**2)
        out[exp] = {"mean": mean, "std": std}
    return out


# ---------------------------------------------------------------------------
# Artifact IO — JSON replaces the reference pickle; pickle is still readable.
# ---------------------------------------------------------------------------

def save_stats(stats: Dict[str, Dict[str, np.ndarray]], path: str) -> None:
    payload = {
        exp: {"mean": np.asarray(v["mean"]).tolist(), "std": np.asarray(v["std"]).tolist()}
        for exp, v in stats.items()
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)


def load_stats(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Load stats from JSON (ours) or pickle (reference stats_experiments.pickle)."""
    if path.endswith(".pickle") or path.endswith(".pkl"):
        with open(path, "rb") as f:
            raw = pickle.load(f)
    else:
        with open(path) as f:
            raw = json.load(f)
    return {
        exp: {
            "mean": np.asarray(v["mean"], dtype=np.float64),
            "std": np.asarray(v["std"], dtype=np.float64),
        }
        for exp, v in raw.items()
    }


def stats_table(
    stats: Dict[str, Dict[str, np.ndarray]], experiments: Sequence[str]
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack stats as dense [n_exp, 6] mean/std tables for device lookup."""
    mean = np.stack([np.asarray(stats[e]["mean"], dtype=np.float32) for e in experiments])
    std = np.stack([np.asarray(stats[e]["std"], dtype=np.float32) for e in experiments])
    return mean, std


def channel_from_path(path: str) -> int:
    """Filename channel parse parity with compute_stats_experiments.py:14.

    ``{well}_s{site}_w{channel}.{ext}`` -> 1-based channel int.
    """
    fname = os.path.basename(path)
    return int(fname.split("_")[2][1])


def verify_stats(
    stats: Dict[str, Dict[str, np.ndarray]],
    images_by_bucket: Iterator[Tuple[str, int, np.ndarray]],
) -> Dict[str, Dict[str, np.ndarray]]:
    """Re-normalization verification pass (compute_stats_experiments.py:47-57).

    Applies the computed stats and recomputes mean/std; a correct stats
    artifact yields mean ~ 0 and std ~ 1 per channel.
    """
    acc: Dict[str, np.ndarray] = {}
    for exp, channel, img in images_by_bucket:
        a = acc.setdefault(exp, np.zeros((NB_CHANNELS, 3), dtype=np.float64))
        c = channel - 1
        x = img.astype(np.float64) / 255.0
        x = (x - stats[exp]["mean"][c]) / stats[exp]["std"][c]
        a[c, 0] += x.size
        a[c, 1] += x.sum()
        a[c, 2] += (x**2).sum()
    out = {}
    for exp, a in acc.items():
        mean = a[:, 1] / a[:, 0]
        std = np.sqrt(a[:, 2] / a[:, 0] - mean**2)
        out[exp] = {"mean": mean, "std": std}
    return out
