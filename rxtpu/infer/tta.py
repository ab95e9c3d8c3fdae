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


def make_scanned_tta_predict_step(
    model, crop_size: Optional[int] = None, tta: str = "none",
    average: str = "probs"
):
    """Windowed variant of make_tta_predict_step: [K, B, ...] -> [K, B, C].

    One dispatch serves K batches (lax.scan over the window), amortizing
    per-launch runtime overhead. Each window slice is numerically
    identical to a ``make_tta_predict_step`` call on that batch.
    """
    from rxtpu.train.step import make_scanned_predict_step

    return make_scanned_predict_step(
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
    scan_window: int = 1,
    mesh=None,
    scan_step: Optional[Callable] = None,
) -> Tuple[np.ndarray, List[str]]:
    """Softmax probabilities for a whole (test) pipeline.

    Returns (probs [N, nb_classes], id_codes [N]) with padding rows removed.
    ``model_fn`` overrides the predict step (used for DummyClassifier in
    --debug local mode, main.py:144-145).

    ``scan_window > 1`` runs K batches per device dispatch (lax.scan over
    a stacked window; see rxtpu.train.step.make_scanned_predict_step) —
    same numbers, fewer launches. The short tail window is padded by
    repeating its last batch (keeping one compiled shape) and the pad
    slices dropped. Single-process only (a pod's global batch is
    assembled per-process; window stacking would need a collective
    re-layout), and incompatible with ``model_fn`` (which is per-batch).
    ``mesh`` shards each window's batch dim over 'data' (scan axis
    replicated); without it leaves go to the default device whole.
    ``scan_step`` supplies a pre-built make_scanned_tta_predict_step so
    callers draining many same-shape pipelines compile it once.
    """
    if put is None:
        put = device_prefetch

    def host_batches():
        # the keep mask comes from id_codes (below), so `valid` is dead
        # weight for predict — drop it HOST-side, before put() device-puts
        # (or collectively materializes, on pods) the batch
        for b in pipe.epoch(0):
            b.pop("valid", None)
            yield b

    if scan_window > 1 and model_fn is None:
        import jax

        if jax.process_count() == 1:
            return _predict_dataset_scanned(
                model, state, host_batches(), crop_size, tta, tta_average,
                scan_window, mesh, scan_step,
            )
        # pods: fall through to the per-batch path (put handles the
        # collective global-batch assembly there)

    step = model_fn if model_fn is not None else make_tta_predict_step(
        model, crop_size, tta, tta_average
    )
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


def _predict_dataset_scanned(
    model, state, host_batches, crop_size, tta, tta_average,
    scan_window: int, mesh, scan_step=None,
) -> Tuple[np.ndarray, List[str]]:
    """K-batches-per-dispatch drain of a predict pipeline (single process)."""
    import jax

    from rxtpu.data.pipeline import double_buffer

    step = scan_step if scan_step is not None else (
        make_scanned_tta_predict_step(model, crop_size, tta, tta_average))

    def windows():
        buf = []
        for b in host_batches:
            buf.append(b)
            if len(buf) == scan_window:
                yield buf
                buf = []
        if buf:
            yield buf

    def put_window(bufs):
        ids = [b.pop("id_codes") for b in bufs]
        n_real = len(bufs)
        # pad the tail window by repeating its last batch: ONE compiled
        # window shape, pad slices sliced off after the step
        bufs = bufs + [bufs[-1]] * (scan_window - n_real)
        if mesh is not None:
            from rxtpu.parallel.mesh import shard_batch_window

            w = shard_batch_window(bufs, mesh)
        else:
            w = {k: jax.device_put(np.stack([b[k] for b in bufs]))
                 for k in bufs[0]}
        return w, ids, n_real

    all_probs, all_ids = [], []
    for w, ids, n_real in double_buffer(windows(), put_window):
        probs = np.asarray(step(state, w))  # [K, B, C]
        for kdx in range(n_real):
            id_codes = ids[kdx]
            keep = np.asarray([i != "" for i in id_codes])
            all_probs.append(probs[kdx][keep])
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
