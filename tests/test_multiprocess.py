"""True 2-process jax.distributed test of the multi-host input path.

Two OS processes (4 virtual CPU devices each) initialize jax.distributed
against a local coordinator, build the SAME global epoch order, decode only
their own Pipeline slice (num_hosts=2), feed via
make_array_from_process_local_data, and run one SPMD train step on the
8-device global mesh. Both processes must report the identical loss, and it
must match the single-process global-batch loss computed in the parent.

Complements the single-process equivalence tests in test_parallel_extras
(sliced==global bit parity; step-numerics parity) with a real
multi-controller run. Skips gracefully where multi-process CPU collectives
are unavailable.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; root = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
except Exception as e:
    print("INIT_FAIL", type(e).__name__, str(e)[:120]); sys.exit(3)
if jax.device_count() != 8 or jax.process_count() != 2:
    print("INIT_FAIL topology", jax.device_count(), jax.process_count()); sys.exit(3)

import numpy as np, jax.numpy as jnp
from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
from rxtpu.data.pipeline import ByteStore, Pipeline
from rxtpu.data.records import load_metadata, read_metadata_csvs
from rxtpu.parallel import make_mesh, make_put, place_state
from rxtpu.train import build_model, create_train_state, make_train_step

SRC, CROP, BS = 64, 32, 8
df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "train")
idx = load_metadata(df, dfc, "train")
store = ByteStore(idx, root, preload=True)
exps = sorted({r.experiment for r in idx.records})
stats = {e: {"mean": np.full(6, 0.5), "std": np.full(6, 0.25)} for e in exps}
pipe = Pipeline(idx, store, stats, BS, "train", src_size=SRC, seed=7,
                num_hosts=2, host_id=pid)

cfg = Config(
    data=DataConfig(path_data="x", crop_size=CROP, src_size=SRC),
    model=ModelConfig(backbone="resnet18", nb_classes=8, pretrained=False,
                      size_features=8, compute_dtype="float32"),
    train=TrainConfig(bs_per_device=1), experiment_id="mp",
)
model = build_model(cfg)
state, _ = create_train_state(cfg, model, steps_per_epoch=1)  # same seed everywhere
mesh = make_mesh(n_devices=8)
put = make_put(mesh)  # process_count == 2 -> multihost_prefetch
step = make_train_step(model, CROP, donate=False)

def host_batches():
    for b in pipe.epoch(0):
        b.pop("id_codes", None)
        b.pop("valid", None)
        yield b

with mesh:
    state = place_state(state, mesh)
    it = put(host_batches())
    batch = next(it)
    _, m = step(state, batch, jax.random.PRNGKey(1), jnp.asarray(True))
    print("LOSS", repr(float(m["loss"])))

    # multi-host predict path: sharded step output gathered to every host,
    # keep-mask derived from the global id_codes metadata
    from rxtpu.infer import predict_dataset
    pipe_t = Pipeline(idx, store, stats, BS, "test", src_size=SRC, seed=7,
                      shuffle=False, drop_last=False, num_hosts=2, host_id=pid)
    probs, ids = predict_dataset(model, state, pipe_t, CROP, put=put)
    print("PRED", len(ids), repr(float(np.asarray(probs, np.float64).sum())))

    # pod int8 path (CLI --quantize int8): calibration observes the SAME
    # globally-assembled batches on every process -> identical scales ->
    # identical quantized predictions gathered on both controllers
    import itertools
    from rxtpu.infer import calibrate, prepare_quantized
    from rxtpu.infer.quant import make_quantized_predict_step

    def calib():
        for b in itertools.islice(pipe_t.epoch(0), 1):
            yield {k: b[k] for k in ("images", "mean", "std")}
    qstats = calibrate(model, state, put(calib()), CROP)
    qvars = prepare_quantized(model, state, qstats)
    qprobs, qids = predict_dataset(
        model, qvars, pipe_t, CROP, put=put,
        model_fn=make_quantized_predict_step(model, CROP))
    print("QPRED", len(qids),
          repr(float(np.asarray(qprobs, np.float64).sum())))

    # multi-process checkpointing: collective host gather, process-0 write
    from rxtpu.train.checkpoint import save_checkpoint
    ck = os.path.join(sys.argv[4], "mp_last.ckpt")
    save_checkpoint(ck, {"params": state.params, "step": state.step})
    # the in-save barrier guarantees EVERY process sees the written file
    print("CKPT", os.path.exists(ck))

    # orbax backend is COLLECTIVE (its save barriers globally): calling it
    # from every process must complete, not deadlock
    ck2 = os.path.join(sys.argv[4], "mp_orbax.ckpt")
    save_checkpoint(ck2, {"step": state.step}, backend="orbax")
    print("ORBAX", os.path.exists(ck2))

    # shared-filesystem contract check passes when hosts agree — no manual
    # sync needed: save_checkpoint itself barriers before returning, so
    # the promote is visible to every process here
    from rxtpu.train.checkpoint import assert_consistent_checkpoint_view
    assert_consistent_checkpoint_view(ck, ck2)
    print("VIEWOK")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_feed(synthetic_root, tmp_path):
    root, _ = synthetic_root
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), root,
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            # generous: the int8 leg adds calibrate+quantized compiles and
            # CPU XLA executes s8 convs ~2.3x slower than bf16
            out, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("2-process run timed out (constrained CI host)")
        outs.append(out)
    if any("INIT_FAIL" in o for o in outs):
        pytest.skip("jax.distributed multi-process CPU unavailable here: "
                    + outs[0].splitlines()[-1][:120])
    losses = []
    for o in outs:
        lines = [l for l in o.splitlines() if l.startswith("LOSS ")]
        assert lines, f"worker produced no loss:\n{o[-2000:]}"
        losses.append(float(lines[-1].split()[1].strip("'\"")))
    # both controllers see the same replicated loss
    assert losses[0] == pytest.approx(losses[1], abs=1e-6), losses

    # both controllers ran predict and gathered IDENTICAL global results
    preds = []
    for o in outs:
        lines = [l for l in o.splitlines() if l.startswith("PRED ")]
        assert lines, f"worker produced no predictions:\n{o[-2000:]}"
        _, n, ssum = lines[-1].split(" ", 2)
        preds.append((int(n), float(ssum.strip("'\""))))
    assert preds[0] == preds[1], preds
    assert preds[0][0] > 0

    # int8 pod path: both controllers derived identical calibration scales
    # from the globally-assembled batches and gathered identical quantized
    # predictions over the full test set
    qpreds = []
    for o in outs:
        lines = [l for l in o.splitlines() if l.startswith("QPRED ")]
        assert lines, f"worker produced no int8 predictions:\n{o[-2000:]}"
        _, n, ssum = lines[-1].split(" ", 2)
        qpreds.append((int(n), float(ssum.strip("'\""))))
    assert qpreds[0] == qpreds[1], qpreds
    assert qpreds[0][0] == preds[0][0]

    # multi-process checkpoint: written exactly once (by process 0), and
    # the in-save barrier makes it visible to BOTH processes on return
    assert all("CKPT True" in o for o in outs), outs[1][-500:]
    from rxtpu.train.checkpoint import load_checkpoint

    saved = load_checkpoint(str(tmp_path / "mp_last.ckpt"))
    # the worker saves its INITIAL state (the stepped one is discarded)
    assert int(saved["step"]) == 0
    assert saved["params"]  # non-empty param tree round-tripped

    # collective orbax save completed on both processes without deadlock,
    # promote visible everywhere
    assert all("ORBAX True" in o for o in outs), outs[1][-500:]
    assert all("VIEWOK" in o for o in outs), outs[1][-500:]
    saved2 = load_checkpoint(str(tmp_path / "mp_orbax.ckpt"))
    assert int(saved2["step"]) == 0

    # and it matches the single-process global batch exactly (the pipeline
    # slicing is bit-identical, so only collective math could differ)
    import jax
    import jax.numpy as jnp

    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.data.pipeline import ByteStore, Pipeline
    from rxtpu.data.records import load_metadata, read_metadata_csvs
    from rxtpu.parallel import make_mesh, place_state
    from rxtpu.parallel.mesh import shard_batch
    from rxtpu.train import build_model, create_train_state, make_train_step

    SRC, CROP, BS = 64, 32, 8
    df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "train")
    idx = load_metadata(df, dfc, "train")
    store = ByteStore(idx, root, preload=True)
    exps = sorted({r.experiment for r in idx.records})
    stats = {e: {"mean": np.full(6, 0.5), "std": np.full(6, 0.25)} for e in exps}
    pipe = Pipeline(idx, store, stats, BS, "train", src_size=SRC, seed=7)
    cfg = Config(
        data=DataConfig(path_data="x", crop_size=CROP, src_size=SRC),
        model=ModelConfig(backbone="resnet18", nb_classes=8, pretrained=False,
                          size_features=8, compute_dtype="float32"),
        train=TrainConfig(bs_per_device=1), experiment_id="mp",
    )
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    mesh = make_mesh(n_devices=8)
    step = make_train_step(model, CROP, donate=False)
    batch = next(iter(pipe.epoch(0)))
    batch.pop("id_codes"), batch.pop("valid")
    with mesh:
        state = place_state(state, mesh)
        _, m = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(1),
                    jnp.asarray(True))
    assert losses[0] == pytest.approx(float(m["loss"]), rel=1e-5), (
        losses, float(m["loss"]))

    # the gathered multi-host predictions match a single-process predict
    from rxtpu.infer import predict_dataset

    pipe_t = Pipeline(idx, store, stats, BS, "test", src_size=SRC, seed=7,
                      shuffle=False, drop_last=False)
    with mesh:
        probs_sp, ids_sp = predict_dataset(model, state, pipe_t, CROP)
    assert preds[0][0] == len(ids_sp)
    assert preds[0][1] == pytest.approx(
        float(np.asarray(probs_sp, np.float64).sum()), rel=1e-4)
