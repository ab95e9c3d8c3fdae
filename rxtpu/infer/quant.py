"""Post-training W8A8 quantization for the inference path.

Workflow (all opt-in via ``--quantize int8``; reference inference is
``cell_classifier/test.py:23-32``, numerics intentionally differ —
accuracy is pinned by tests instead of bit-parity):

1. ``calibrate(model, state, batches)``: run the BN-folded f32/bf16
   forward with ``quant_observe=True`` over a few batches; every conv
   records its input absmax into the ``qstats`` collection (max-reduced
   across batches). Unlabeled data suffices — test batches work.
2. ``prepare_quantized(model, state, qstats)``: symmetric per-out-channel
   int8 weights (``w_scale``), per-tensor activation scales
   (``in_scale = absmax/127``). Runs ONCE per trained model — the weights
   are static at inference time, so quantizing inside the predict step is
   pure redundant work (measured +0.5 to +9.5 ms/step across runs on v5e
   — the relay's XLA fuses the pass nondeterministically — which
   prequantizing removes entirely; dev/int8_eval_ab.py).
3. ``make_quantized_predict_step(model, ...)``: jitted
   ``step(qvars, batch) -> probs``. ``qvars`` ride as a traced argument
   so ONE compiled step serves every per-experiment model (the CLI's
   18-experiment loop must not recompile, cli.py:458-466).

Why: the bf16 eval forward is AT its composition ceiling
(OPTIMIZATION.md); int8 moves the ceiling — 1.68x MXU rate and half the
HBM bytes on this v5e (dev/int8_probe.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rxtpu.infer.fold import fold_variables, foldable


def quantizable(model) -> bool:
    """resnet int8 builds on BN folding (resnet backbone + mlp head);
    densenet121 int8 keeps its pre-activation BNs as explicit affines
    (models/densenet.py QuantPreNorm) so it needs no folding."""
    return foldable(model) or _is_densenet(model)


def _is_densenet(model) -> bool:
    return (str(getattr(model, "backbone", "")) == "densenet121"
            and getattr(model, "head", None) == "mlp")


def calibrate(
    model,
    state,
    batches: Iterable[Dict[str, Any]],
    crop_size: Optional[int] = None,
) -> Dict[str, Any]:
    """Per-conv input absmax tree (numpy) from a few (unlabeled) batches.

    ``batches`` are pipeline batches (uint8 images + per-experiment
    mean/std); each runs through the same normalize + folded forward the
    predict step uses, with every conv input's range recorded.
    """
    from rxtpu.train.step import eval_batch_normalize

    if not quantizable(model):
        raise ValueError(
            "int8 inference supports resnet backbones with the mlp head "
            f"and densenet121, got {model.backbone!r}/{model.head!r}")
    if _is_densenet(model):
        obs_model = model.clone(quant_observe=True)

        @jax.jit
        def observe(state, batch):
            views = eval_batch_normalize(
                batch["images"], batch["mean"], batch["std"], crop_size)
            _, aux = obs_model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                views, train=False, mutable=["qstats"])
            return aux["qstats"]
    else:
        obs_model = model.clone(folded=True, quant_observe=True,
                                fuse_blocks=False, stem_input=False)

        @jax.jit
        def observe(state, batch):
            views = eval_batch_normalize(
                batch["images"], batch["mean"], batch["std"], crop_size)
            fvars = fold_variables(state.params, state.batch_stats)
            _, aux = obs_model.apply(fvars, views, train=False,
                                     mutable=["qstats"])
            return aux["qstats"]

    stats = None
    n = 0
    for batch in batches:
        batch = {k: batch[k] for k in ("images", "mean", "std")}
        s = jax.device_get(observe(state, batch))
        stats = s if stats is None else jax.tree_util.tree_map(
            np.maximum, stats, s)
        n += 1
    if n == 0:
        raise ValueError("calibration needs at least one batch")
    return stats


def _quantize_backbone(p: Dict[str, Any], s: Dict[str, Any]):
    out: Dict[str, Any] = {}
    for k, v in p.items():
        if isinstance(v, dict) and "kernel" in v and v["kernel"].ndim == 4:
            kf = v["kernel"].astype(jnp.float32)
            w_scale = jnp.maximum(
                jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / 127.0, 1e-12)
            out[k] = {
                "kernel_q": jnp.clip(
                    jnp.round(kf / w_scale), -127, 127).astype(jnp.int8),
                "w_scale": w_scale,
                "bias": v["bias"].astype(jnp.float32),
                "in_scale": jnp.maximum(
                    jnp.asarray(s[k]["in_absmax"], jnp.float32).reshape(())
                    / 127.0, 1e-12),
            }
            if "out_absmax" in s.get(k, {}):
                # used by projection convs, whose int8 output is a residual
                # branch with no consumer conv to take a scale from
                out[k]["out_scale"] = jnp.maximum(
                    jnp.asarray(s[k]["out_absmax"], jnp.float32).reshape(())
                    / 127.0, 1e-12)
        elif isinstance(v, dict):
            out[k] = _quantize_backbone(v, s.get(k, {}))
        else:
            out[k] = v
    return out


def _qconv_entry(kernel, in_absmax, out_absmax=None, mul=None, add=None,
                 in_absmax_ch=None):
    """One QuantConv param dict. ``mul``/``add`` fold a FOLLOWING eval-BN
    into the conv (kernel * mul per out-channel before quantization —
    post-conv BN folds exactly; the bias carries the shift).

    ``in_absmax_ch`` switches the conv to PER-INPUT-CHANNEL activation
    quantization: the per-channel scale vector is baked into the kernel
    (W' = W * s_in[i] — exact, since the conv is linear per input
    channel), stored as ``in_scale_vec`` for the producer to quantize
    with, and the runtime ``in_scale`` is fixed at 1 (QuantConv skips the
    scalar dequant multiply when the incoming pair carries a vector).
    Trained pre-activation BNs make densenet concat channel ranges span
    orders of magnitude; per-tensor activation scales measured 67%
    int8-vs-bf16 submission agreement on trained checkpoints."""
    kf = kernel.astype(jnp.float32)
    if mul is not None:
        kf = kf * mul
    d = {}
    if in_absmax_ch is not None:
        s_in_vec = jnp.maximum(
            jnp.asarray(in_absmax_ch, jnp.float32) / 127.0, 1e-12)
        kf = kf * s_in_vec.reshape(1, 1, -1, 1)
        d["in_scale_vec"] = s_in_vec
        d["in_scale"] = jnp.float32(1.0)
    else:
        d["in_scale"] = jnp.maximum(
            jnp.asarray(in_absmax, jnp.float32).reshape(()) / 127.0, 1e-12)
    w_scale = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / 127.0,
                          1e-12)
    d.update({
        "kernel_q": jnp.clip(
            jnp.round(kf / w_scale), -127, 127).astype(jnp.int8),
        "w_scale": w_scale,
        "bias": (add.astype(jnp.float32) if add is not None
                 else jnp.zeros((kernel.shape[-1],), jnp.float32)),
    })
    if out_absmax is not None:
        # scalar or per-channel vector; the epilogue requantize broadcasts
        d["out_scale"] = jnp.maximum(
            jnp.asarray(out_absmax, jnp.float32) / 127.0, 1e-12)
    return d


def quantize_densenet_backbone(params: Dict[str, Any],
                               batch_stats: Dict[str, Any],
                               qstats: Dict[str, Any]) -> Dict[str, Any]:
    """densenet121 int8 tree (models/densenet.py DenseNet._quantized).

    Pre-activation BNs become explicit affine params (``mul``/``add``
    under the eval BN's scope name, consumed by QuantPreNorm); the two
    post-conv BNs — bn_init after conv_init, and each layer's BN2 after
    Conv_0 — fold into those convs' dequant scale/bias. Segment scales:
    conv_init/Conv_1/transition Conv_0 carry an ``out_scale`` from the
    observed range of the tensor actually stored in the int8 concat
    state (stem post-relu, Conv_1 raw output, post-avg-pool)."""
    from rxtpu.infer.fold import _affine

    out: Dict[str, Any] = {}
    mul0, add0 = _affine(params["bn_init"], batch_stats["bn_init"])
    # stem input is the (quantize-at-source) image: per-tensor in_scale;
    # everything downstream quantizes activations PER CHANNEL (the _ch
    # ranges), with each consumer conv baking its input vector into its
    # quantized kernel — exact, and the only granularity that survives
    # trained pre-activation BNs (see _qconv_entry)
    out["conv_init"] = _qconv_entry(
        params["conv_init"]["kernel"], qstats["conv_init"]["in_absmax"],
        out_absmax=qstats["stem_absmax_ch"], mul=mul0, add=add0)
    for scope, sub in params.items():
        qs = qstats.get(scope, {})
        if scope.startswith("block"):
            mul1, add1 = _affine(sub["BatchNorm_0"],
                                 batch_stats[scope]["BatchNorm_0"])
            mul2, add2 = _affine(sub["BatchNorm_1"],
                                 batch_stats[scope]["BatchNorm_1"])
            out[scope] = {
                "BatchNorm_0": {"mul": mul1, "add": add1},
                # Conv_0's requantize target IS Conv_1's input range
                "Conv_0": _qconv_entry(
                    sub["Conv_0"]["kernel"], None,
                    in_absmax_ch=qs["Conv_0"]["in_absmax_ch"],
                    out_absmax=qs["Conv_1"]["in_absmax_ch"],
                    mul=mul2, add=add2),
                "Conv_1": _qconv_entry(
                    sub["Conv_1"]["kernel"], None,
                    in_absmax_ch=qs["Conv_1"]["in_absmax_ch"],
                    out_absmax=qs["Conv_1"]["out_absmax_ch"]),
            }
        elif scope.startswith("transition"):
            mul1, add1 = _affine(sub["BatchNorm_0"],
                                 batch_stats[scope]["BatchNorm_0"])
            out[scope] = {
                "BatchNorm_0": {"mul": mul1, "add": add1},
                "Conv_0": _qconv_entry(
                    sub["Conv_0"]["kernel"], None,
                    in_absmax_ch=qs["Conv_0"]["in_absmax_ch"],
                    out_absmax=qstats[f"{scope}_absmax_ch"]),
            }
        elif scope == "bn_final":
            mul, add = _affine(sub, batch_stats["bn_final"])
            out["bn_final"] = {"mul": mul, "add": add}
    return out


def quantize_variables(folded_vars: Dict[str, Any],
                       qstats: Dict[str, Any]) -> Dict[str, Any]:
    """Folded weight tree + calibration stats -> the tree a
    ``quantized=True`` model consumes (int8 backbone convs; the folded
    mlp head passes through in bf16 — it is <0.2% of the forward FLOPs).
    jit-traceable (round/clip/scale only)."""
    params = folded_vars["params"]
    return {"params": {
        "backbone": _quantize_backbone(
            params["backbone"], qstats["backbone"]),
        "head": params["head"],
    }}


def prepare_quantized(model, state, qstats: Dict[str, Any]) -> Dict[str, Any]:
    """Fold + quantize the trained weights ONCE (device-resident tree).

    Runs as one jitted pass over the parameters; the result is what
    ``make_quantized_predict_step``'s step consumes. Re-run after any
    weight update (inference-time weights are static, so once per model).
    """
    if not quantizable(model):
        raise ValueError(
            "int8 inference supports resnet backbones with the mlp head "
            f"and densenet121, got {model.backbone!r}/{model.head!r}")
    if _is_densenet(model):
        # the head is NOT folded (densenet has no BN-fold path), so its
        # batch_stats ride along for the eval-mode head BNs
        return jax.jit(lambda s, q: {
            "params": {
                "backbone": quantize_densenet_backbone(
                    s.params["backbone"], s.batch_stats["backbone"],
                    q["backbone"]),
                "head": s.params["head"],
            },
            "batch_stats": {"head": s.batch_stats["head"]},
        })(state, qstats)
    return jax.jit(
        lambda s, q: quantize_variables(
            fold_variables(s.params, s.batch_stats), q)
    )(state, qstats)


def make_quantized_predict_step(
    model, crop_size: Optional[int] = None,
    transforms=None, average: str = "probs",
) -> Callable:
    """Jitted ``step(qvars, batch) -> probs [B, nb_classes]``.

    Same TTA/average semantics as ``make_predict_step``; the forward runs
    the W8A8 backbone on weights prepared by ``prepare_quantized``.
    ``qvars`` is a traced argument: one compile serves every experiment's
    model (same shapes), and the quantize pass never rides the hot step
    (measured +0.5 to +9.5 ms/step when it did).
    """
    body = _make_quantized_body(model, crop_size, transforms, average)

    @jax.jit
    def step_fn(qvars, batch):
        return body(qvars, batch)

    return step_fn


def make_scanned_quantized_predict_step(
    model, crop_size: Optional[int] = None,
    transforms=None, average: str = "probs",
) -> Callable:
    """Windowed W8A8 variant: ``step(qvars, batches[K,B,...]) -> [K,B,C]``.

    lax.scan over a stacked window of K batches, one dispatch per window
    (same amortization as ``make_scanned_predict_step``); each window
    slice is numerically identical to a ``make_quantized_predict_step``
    call on that batch.
    """
    body = _make_quantized_body(model, crop_size, transforms, average)

    def step_fn(qvars, batches):
        def f(carry, batch):
            return carry, body(qvars, batch)

        _, probs = jax.lax.scan(f, None, batches)
        return probs

    return jax.jit(step_fn)


def _make_quantized_body(model, crop_size, transforms, average) -> Callable:
    from rxtpu.train.step import _make_predict_body

    if not quantizable(model):
        raise ValueError(
            "int8 inference supports resnet backbones with the mlp head "
            f"and densenet121, got {model.backbone!r}/{model.head!r}")
    if _is_densenet(model):
        qmodel = model.clone(quantized=True)
    else:
        qmodel = model.clone(folded=True, quantized=True, fuse_blocks=False,
                             stem_input=False)

    def apply_fn(qvars, views):
        return qmodel.apply(qvars, views, train=False)

    normalize_fn = None
    if not transforms:
        from rxtpu.ops import eval_batch_normalize

        def normalize_fn(qvars, batch):
            # quantize-at-source: the Pallas crop-normalize kernel emits
            # int8 at the stem conv's calibrated in_scale in its single
            # pass, so no bf16 view tensor (write+read) nor a standalone
            # quantize kernel ever hits HBM. The bare-int8 QuantConv
            # contract (models/quant.py) closes the loop: conv_init reads
            # the SAME in_scale param this quantization used. TTA
            # transforms keep the bf16 path (dihedral reverses are
            # MXU-matmul ops, not int8-safe).
            s = qvars["params"]["backbone"]["conv_init"]["in_scale"]
            return eval_batch_normalize(
                batch["images"], batch["mean"], batch["std"], crop_size,
                quant_scale=s)

    return _make_predict_body(model, crop_size, transforms=transforms,
                              average=average, apply_fn=apply_fn,
                              normalize_fn=normalize_fn)
