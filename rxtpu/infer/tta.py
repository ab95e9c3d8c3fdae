"""Test-time inference: two-site TTA forward + optional flip/rotation TTA.

The reference's test forward is ``model(x[bs,6,6,364,364]) -> softmax``
accumulated to numpy (``test.py:23-32``); the two-site averaging lives
inside the model's G=6 grouping. Here the batched predict step is
jit-compiled (``rxtpu.train.step.make_predict_step``) and an optional
dihedral TTA (flips / 90-degree rotations, BASELINE config 3) averages
softmax probabilities over deterministic geometric variants — done on
device by transforming the already-normalized views.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from rxtpu.data.pipeline import Pipeline, device_prefetch
from rxtpu.train.step import TrainState

# named dihedral variants applied to NHWC views [B, G, H, W, C]
_TTA_VARIANTS: Dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "identity": lambda v: v,
    "hflip": lambda v: v[:, :, :, ::-1, :],
    "vflip": lambda v: v[:, :, ::-1, :, :],
    "rot180": lambda v: v[:, :, ::-1, ::-1, :],
    # square center crops, so the 90-degree rotations are valid variants too
    "rot90": lambda v: v.swapaxes(2, 3)[:, :, ::-1, :, :],
    "rot270": lambda v: v.swapaxes(2, 3)[:, :, :, ::-1, :],
    "transpose": lambda v: v.swapaxes(2, 3),
    "anti_transpose": lambda v: v.swapaxes(2, 3)[:, :, ::-1, ::-1, :],
}


def tta_transforms(tta: str) -> List[Callable[[jnp.ndarray], jnp.ndarray]]:
    """Resolve a TTA mode name to its list of view transforms."""
    if tta == "none":
        names = ["identity"]
    elif tta == "flips":
        names = ["identity", "hflip", "vflip", "rot180"]
    elif tta == "dihedral":
        # the full 8-element group the train augmentation samples from
        names = ["identity", "hflip", "vflip", "rot180", "rot90", "rot270",
                 "transpose", "anti_transpose"]
    else:
        raise ValueError(f"unknown tta mode {tta!r}")
    return [_TTA_VARIANTS[n] for n in names]


def make_tta_predict_step(
    model, crop_size: Optional[int] = None, tta: str = "none",
    average: str = "probs"
):
    """Build a jitted step: raw uint8 batch -> averaged softmax probs.

    ``crop_size=None`` matches the reference TEST transform (normalize
    only, no crop — dataloader.py:128-139). ``average``: 'probs' averages
    softmax outputs across variants; 'logits' averages pre-softmax logits
    (BASELINE config 3's "flip/rotate TTA logit averaging") then
    softmaxes once. Thin wrapper over the one predict-step implementation
    (rxtpu.train.step.make_predict_step) with this module's variant
    geometry plugged in.
    """
    from rxtpu.train.step import make_predict_step

    return make_predict_step(
        model, crop_size, transforms=tta_transforms(tta), average=average
    )


def predict_dataset(
    model,
    state: TrainState,
    pipe: Pipeline,
    crop_size: Optional[int] = None,
    tta: str = "none",
    put=None,
    model_fn: Optional[Callable] = None,
    tta_average: str = "probs",
) -> Tuple[np.ndarray, List[str]]:
    """Softmax probabilities for a whole (test) pipeline.

    Returns (probs [N, nb_classes], id_codes [N]) with padding rows removed.
    ``model_fn`` overrides the predict step (used for DummyClassifier in
    --debug local mode, main.py:144-145).
    """
    if put is None:
        put = device_prefetch
    step = model_fn if model_fn is not None else make_tta_predict_step(
        model, crop_size, tta, tta_average
    )
    def host_batches():
        # the keep mask comes from id_codes (below), so `valid` is dead
        # weight for predict — drop it HOST-side, before put() device-puts
        # (or collectively materializes, on pods) the batch
        for b in pipe.epoch(0):
            b.pop("valid", None)
            yield b

    all_probs, all_ids = [], []
    for batch in put(host_batches()):
        # id_codes span the GLOBAL batch on every host (Pipeline metadata
        # contract) — padding rows are "", so the keep mask needs no
        # device readback of the sharded `valid` array
        id_codes = batch.pop("id_codes")
        probs = _to_host(step(state, batch))
        keep = np.asarray([i != "" for i in id_codes])
        all_probs.append(probs[keep])
        all_ids.extend([i for i in id_codes if i != ""])
    return np.concatenate(all_probs, axis=0), all_ids


def _to_host(x) -> np.ndarray:
    """Materialize a (possibly globally-sharded) array on this host.

    On a pod the predict step's output spans non-addressable devices;
    the shared helper replicates it across processes (collective: every
    host calls this on the same value) before reading.
    """
    from rxtpu.train.checkpoint import replicate_to_host

    return replicate_to_host(x)
