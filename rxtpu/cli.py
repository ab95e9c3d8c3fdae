"""Driver CLI — preserves the reference surface of ``python main.py``.

Flags ``--debug``, ``--experiment_id``, ``--lr`` behave as in
``main.py:26-31``; the full flow is main.py's:

1. hyperparameters with debug/local shrinking (main.py:41-54)
2. per-experiment stats artifact (main.py:83-84; auto-computed here if
   missing instead of crashing)
3. model + optimizer; training SKIPPED if the best checkpoint exists
   (main.py:96-97)
4. stratified (or experiment-wise) split, optional nb_examples cap,
   training with val-best checkpointing (main.py:100-142)
5. test phase: DummyClassifier when local (main.py:144-145), plate-group
   construction (main.py:157-167), per-experiment constrained assignment
   (main.py:174-196), ``submission_{experiment_id}.csv`` (main.py:198-201)

Extra flags expose framework capabilities (backbone/head choice, TTA,
assignment method, mesh shape) without changing the defaults' semantics.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

import numpy as np

# Reference main.py:168: hand-derived plate-group permutation per test
# experiment of the Kaggle release (18 experiments).
REFERENCE_EXPERIMENT_TYPES = [3, 1, 0, 0, 0, 0, 2, 2, 3, 0, 0, 3, 1, 0, 0, 0, 2, 3]


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="rxtpu driver")
    # reference surface (main.py:26-31)
    p.add_argument("--debug", default=False, action="store_true")
    p.add_argument("--experiment_id")
    p.add_argument("--lr", type=float)
    # framework extensions
    p.add_argument("--data-dir", default="data")
    p.add_argument("--stats", default=None, help="stats artifact (.json or .pickle)")
    p.add_argument("--image-ext", default="jpeg", choices=["jpeg", "png"])
    p.add_argument("--pack", default=None,
                   help="rxpack directory (decode-free raw input; see rxtpu.tools pack)")
    p.add_argument("--backbone", default=None, help="resnet18|resnet50|densenet121")
    p.add_argument("--head", default="mlp", choices=["mlp", "arcface"])
    p.add_argument("--pretrained-path", default=None, help="torch resnet50 state_dict")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--val-fraction", type=float, default=None)
    p.add_argument("--early-stopping", action="store_true",
                   help="stop when val accuracy stalls (HYPERPARAMS['early_stopping'])")
    p.add_argument("--patience", type=int, default=None)
    p.add_argument("--no-scheduler", action="store_true",
                   help="disable cosine annealing (HYPERPARAMS['scheduler'])")
    p.add_argument("--split-by-experiment", action="store_true",
                   help="experiment-wise val holdout (HYPERPARAMS['train_split_by_experiment'])")
    p.add_argument("--batch-size", type=int, default=None, help="per-device batch size")
    p.add_argument("--crop-size", type=int, default=None)
    p.add_argument("--two-site-train", action="store_true",
                   help="train with both sites per view group (config 3)")
    p.add_argument("--test-crop", type=int, default=None,
                   help="center-crop test images to N before inference "
                        "(default: none — the reference tests on full-size "
                        "images; cropping is ~2x faster at 364)")
    p.add_argument("--tta", default="none", choices=["none", "flips", "dihedral"])
    p.add_argument("--tta-average", default="probs", choices=["probs", "logits"])
    p.add_argument("--predict-scan-window", type=int, default=1,
                   help="run K test batches per device dispatch (lax.scan "
                        "window) — same numbers, fewer launches; >1 is "
                        "single-process only")
    p.add_argument("--quantize", default="none", choices=["none", "int8"],
                   help="post-training W8A8 test inference: int8 backbone "
                        "convs calibrated on the first test batches "
                        "(resnet backbones + mlp head; rxtpu/infer/quant.py)")
    p.add_argument("--calib-batches", type=int, default=2,
                   help="test batches observed for int8 activation scales")
    p.add_argument("--calibrate", action="store_true",
                   help="neg-control embedding calibration in the head (config 4)")
    p.add_argument("--fuse-blocks", default="auto",
                   choices=["auto", "on", "off"],
                   help="fused Pallas bottleneck blocks in train mode "
                        "(auto = off; opt-in, see OPTIMIZATION.md)")
    p.add_argument("--augment", default="shear", choices=["shear", "gather"],
                   help="train augmentation backend (gather = exact reference warp)")
    p.add_argument("--assign-method", default="greedy",
                   choices=["greedy", "greedy_jax", "hungarian", "argmax"])
    p.add_argument("--no-plate-leak", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="resume mid-training from the rolling last checkpoint")
    p.add_argument("--experiment-types", default=None,
                   help="comma list of plate-group types per test experiment")
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--distributed", action="store_true",
                   help="initialize jax.distributed for multi-host pod slices; "
                        "each host then decodes only its 1/num_hosts input slice")
    p.add_argument("--coordinator-address", default=None,
                   help="host:port of process 0 (auto-detected on Cloud TPU)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--nb-classes", type=int, default=None,
                   help="override the 1108 Kaggle classes (synthetic datasets)")
    p.add_argument("--checkpoint-every-steps", type=int, default=None,
                   help="also roll the resume checkpoint every N steps "
                        "(preemption-safe mid-epoch resume)")
    p.add_argument("--checkpoint-backend", default="pickle",
                   choices=["pickle", "orbax"])
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler device trace of the first "
                        "training steps into board/{experiment_id}/profile")
    p.add_argument("--out-dir", default=".")
    return p


def resolve_config(args) -> "Config":
    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig, debug_overrides
    import jax

    cfg = Config(
        data=DataConfig(path_data=args.data_dir, image_ext=args.image_ext),
        model=ModelConfig(head=args.head, pretrained_path=args.pretrained_path),
        train=TrainConfig(),
        experiment_id=args.experiment_id,
    )
    local = args.debug and jax.default_backend() == "cpu"  # main.py:41
    if args.debug:
        cfg = debug_overrides(cfg, local)
    if args.pretrained_path:
        # an explicit checkpoint implies the pretrained freeze schedule even
        # in debug mode (reference disables pretrained locally only because
        # torchvision would need network access, main.py:44)
        cfg.model.pretrained = True
    if args.backbone:
        cfg.model.backbone = args.backbone
    elif local and not args.pretrained_path:
        cfg.model.backbone = "resnet18"  # CPU-runnable slice (BASELINE config 1)
    if args.epochs is not None:
        cfg.train.nb_epochs = args.epochs
    if args.val_fraction is not None:
        cfg.train.val_fraction = args.val_fraction
    if args.early_stopping:
        cfg.train.early_stopping = True
    if args.patience is not None:
        if args.patience < 1 and args.early_stopping:
            # ignite parity: EarlyStopping validates patience only when it is
            # actually constructed (early stopping enabled); a stray
            # --patience without --early-stopping is inert, as in main.py
            raise SystemExit("--patience must be >= 1 (ignite parity: "
                             "EarlyStopping rejects patience < 1)")
        cfg.train.patience = args.patience
    if args.no_scheduler:
        cfg.train.scheduler = False
    if args.split_by_experiment:
        cfg.train.train_split_by_experiment = True
    cfg.train.checkpoint_backend = args.checkpoint_backend
    cfg.train.checkpoint_every_steps = args.checkpoint_every_steps
    if args.batch_size is not None:
        cfg.train.bs_per_device = args.batch_size
        cfg.train.nb_examples = cfg.train.bs_per_device if args.debug else None
    if args.crop_size is not None:
        cfg.data.crop_size = args.crop_size
    elif local:
        cfg.data.crop_size = 48
    if args.lr is not None:
        cfg.train.lr = args.lr
    if args.nb_classes is not None:
        cfg.model.nb_classes = args.nb_classes
    cfg.model.control_calibration = args.calibrate
    if args.fuse_blocks != "auto":
        cfg.model.fuse_blocks = args.fuse_blocks == "on"
    cfg.train.augment_backend = args.augment
    if args.stats is not None:
        cfg.data.stats_path = args.stats
    else:
        for cand in ("stats_experiments.json", "stats_experiments.pickle"):
            if os.path.exists(cand):
                cfg.data.stats_path = cand
                break
    if cfg.model.pretrained and not cfg.model.pretrained_path:
        # the reference's pretrained=True always came with real torchvision
        # weights (models.py:13); with nothing to load, the progressive-
        # unfreeze schedule would train the head on frozen RANDOM features
        # for freeze_head_only_epochs — disable it and train end-to-end
        print("no --pretrained-path given: training end-to-end from random "
              "init (pretrained freeze schedule disabled)", file=sys.stderr)
        cfg.model.pretrained = False
    return cfg


def _load_or_compute_stats(cfg):
    import jax

    from rxtpu.data.stats import load_stats

    if os.path.exists(cfg.data.stats_path):
        return load_stats(cfg.data.stats_path)
    print(f"stats artifact {cfg.data.stats_path} missing; computing...")
    from rxtpu.tools import run_stats

    out = cfg.data.stats_path if cfg.data.stats_path.endswith(".json") \
        else "stats_experiments.json"
    if jax.process_count() > 1:
        # pod: compute once on process 0 (N hosts would duplicate the full
        # dataset pass AND race-write the same artifact on shared storage),
        # then barrier and have the others read the finished file
        from jax.experimental import multihost_utils

        if jax.process_index() == 0:
            stats = run_stats(cfg.data.path_data, out, ext=cfg.data.image_ext)
        multihost_utils.sync_global_devices("rxtpu_stats_artifact")
        if jax.process_index() != 0:
            stats = load_stats(out)
        return stats
    return run_stats(cfg.data.path_data, out, ext=cfg.data.image_ext)


def _probe_src_size(cfg, index, pack: Optional[str] = None) -> int:
    # pack-only deployments (only .rxpack files shipped to the pod host)
    # must not touch the original image tree: the pack metadata already
    # records the source geometry
    if pack:
        import json

        with open(os.path.join(pack, f"{index.split}.rxpack.json")) as f:
            return int(json.load(f)["h"])
    from rxtpu.data.records import image_path
    import cv2

    r = index.records[0]
    p = image_path(cfg.data.path_data, index.split, r.experiment, r.plate,
                   r.well, 1, 1, cfg.data.image_ext)
    img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
    return img.shape[0]


def main(argv: Optional[List[str]] = None) -> int:
    args = build_argparser().parse_args(argv)

    # multi-host pod slice: must initialize BEFORE any other jax use —
    # including resolve_config's backend query — so jax.devices() sees the
    # whole slice (SURVEY §5 distributed backend)
    if args.distributed:
        from rxtpu.parallel import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    cfg = resolve_config(args)

    import jax
    import jax.numpy as jnp
    import pandas as pd

    from rxtpu.config import global_batch_size
    from rxtpu.data.pipeline import ByteStore, Pipeline
    from rxtpu.data.records import (
        build_plate_groups, get_celltype, load_metadata, read_metadata_csvs,
        split_by_experiment, stratified_split,
    )
    from rxtpu.infer import constrained_predict, predict_dataset, write_submission
    from rxtpu.infer.plate_leak import rescale
    from rxtpu.models import DummyClassifier
    from rxtpu.parallel import make_mesh, make_put, place_state
    from rxtpu.train import (
        build_model, checkpoint_exists, create_train_state, load_checkpoint,
        run_training,
    )

    num_hosts, host_id = jax.process_count(), jax.process_index()

    if num_hosts > 1 and args.experiment_id is None:
        # the timestamp-default id (config.py __post_init__) can differ
        # across processes (clock skew / second boundaries), silently
        # diverging every derived path — checkpoints, submissions. Agree
        # on process 0's id before any path is used.
        from jax.experimental import multihost_utils

        buf = np.zeros(64, np.uint8)
        raw = cfg.experiment_id.encode()[:64]
        buf[: len(raw)] = np.frombuffer(raw, np.uint8)
        agreed = np.asarray(multihost_utils.broadcast_one_to_all(buf))
        cfg.experiment_id = bytes(agreed).rstrip(b"\x00").decode()

    n_devices = jax.device_count()
    local = cfg.local
    mesh = make_mesh(model_parallel=args.model_parallel)
    put = make_put(mesh)
    global_bs = global_batch_size(cfg, n_devices)  # main.py:67
    n_local = jax.local_device_count()
    decoder_threads = 0 if local else 4 * n_local  # main.py:61-64 spirit
    print(f"Devices: {n_devices} ({jax.default_backend()}), global batch {global_bs}"
          + (f", host {host_id}/{num_hosts}" if num_hosts > 1 else ""))

    stats = _load_or_compute_stats(cfg)
    model = build_model(cfg)

    ckpt_path = cfg.checkpoint_path
    # phase-skip (main.py:96-97) when a best checkpoint exists — UNLESS the
    # user asked to resume and a rolling checkpoint is present: the best
    # file is written at epoch 0 already, so skipping here would strand a
    # preempted run on its epoch-0 weights. Resuming a COMPLETED run is a
    # cheap no-op (the epoch loop is empty).
    from rxtpu.train import last_checkpoint_path
    from rxtpu.train.checkpoint import assert_consistent_checkpoint_view

    if num_hosts > 1:
        # the gates below branch on file existence; hosts must agree
        assert_consistent_checkpoint_view(
            ckpt_path, last_checkpoint_path(cfg))
    resume_pending = args.resume and checkpoint_exists(last_checkpoint_path(cfg))
    if not checkpoint_exists(ckpt_path) or resume_pending:
        print("########## TRAINING ##########")
        df, df_controls = read_metadata_csvs(cfg.data.path_metadata, "train")
        df["celltype"] = df["experiment"].apply(get_celltype)
        if cfg.train.train_split_by_experiment:
            df_train, df_val = split_by_experiment(df, random_state=cfg.train.split_seed)
        else:
            if local:
                df_train, df_val = stratified_split(
                    df, cfg.train.val_fraction, cfg.train.split_seed, stratify_by_sirna=False
                )
            else:
                print("Stratify train/val split by sirna...")
                df_train, df_val = stratified_split(
                    df, cfg.train.val_fraction, cfg.train.split_seed
                )
        if cfg.train.nb_examples is not None:  # main.py:115-117
            # the reference caps to the GLOBAL batch (main.py:54,67): keep
            # at least one full global batch so multi-device --debug still
            # trains a step (drop_last would otherwise yield 0 batches)
            cap = max(cfg.train.nb_examples, global_bs)
            df_train = df_train[:cap]
            df_val = df_val[:cap]
        print(f"Size training dataset: {len(df_train)}")
        print(f"Size validation dataset: {len(df_val)}")

        idx_train = load_metadata(df_train, df_controls, "train")
        idx_val = load_metadata(df_val, df_controls, "train")
        src_size = _probe_src_size(cfg, idx_train, pack=args.pack)
        cfg.data.src_size = src_size
        if cfg.data.crop_size > src_size:
            raise SystemExit(
                f"crop size {cfg.data.crop_size} exceeds source image size "
                f"{src_size}; pass --crop-size <= {src_size}"
            )
        if args.pack:
            from rxtpu.data.pack import PackStore

            store = store_val = PackStore(os.path.join(args.pack, "train.rxpack"))
        else:
            store = ByteStore(
                idx_train, cfg.data.path_data, cfg.data.image_ext,
                preload=cfg.data.cache_bytes_in_ram, verbose=not args.debug,
            )
            store_val = ByteStore(
                idx_val, cfg.data.path_data, cfg.data.image_ext,
                preload=cfg.data.cache_bytes_in_ram,
            )
        pipe_train = Pipeline(
            idx_train, store, stats, global_bs, "train", src_size,
            seed=cfg.train.seed, decoder_threads=decoder_threads,
            prefetch_depth=cfg.data.prefetch_depth,
            two_site=args.two_site_train,
            num_hosts=num_hosts, host_id=host_id,
        )
        pipe_val = Pipeline(
            idx_val, store_val, stats, global_bs, "val", src_size,
            seed=cfg.train.seed, decoder_threads=decoder_threads,
            drop_last=False, shuffle=False, two_site=args.two_site_train,
            num_hosts=num_hosts, host_id=host_id,
        )
        state, lr = create_train_state(
            cfg, model, steps_per_epoch=max(1, len(pipe_train)), n_devices=n_devices
        )
        state = place_state(state, mesh)
        print(f"lr: {lr}")
        if args.profile:
            from rxtpu.utils import trace as profiler_trace
            import contextlib

            profile_ctx = profiler_trace(
                os.path.join(cfg.train.board_dir, cfg.experiment_id, "profile")
            )
        else:
            import contextlib

            profile_ctx = contextlib.nullcontext()
        with profile_ctx:
            result = run_training(
            cfg, model, state, pipe_train, pipe_val,
                base_key=jax.random.PRNGKey(cfg.train.seed), put=put,
                resume=args.resume,
                place_fn=lambda st: place_state(st, mesh),
            )
        print(f"Best validation accuracy: {result.best_accuracy:.4f}")

    print("\n\n########## TEST ##########")
    df_test, df_controls_test = read_metadata_csvs(cfg.data.path_metadata, "test")
    print(f"Size test dataset: {len(df_test)}")

    if local:
        predict_model = DummyClassifier(nb_classes=cfg.model.nb_classes)
        state = None
    else:
        payload = load_checkpoint(ckpt_path)
        state, _ = create_train_state(cfg, model, steps_per_epoch=1, n_devices=n_devices)
        state = state.replace(
            params=payload["params"], batch_stats=payload["batch_stats"]
        )
        state = place_state(state, mesh)
        predict_model = None

    # plate-group construction (main.py:157-167)
    plate_groups = None
    if not args.no_plate_leak:
        meta_train = os.path.join(cfg.data.path_metadata, "train.csv")
        full_meta = os.path.join(cfg.data.path_data, "full_metadata", "train.csv")
        src = full_meta if (local and os.path.exists(full_meta)) else meta_train
        try:
            plate_groups = build_plate_groups(
                pd.read_csv(src), nb_classes=cfg.model.nb_classes
            )
        except AssertionError as e:
            print(f"plate-group construction failed ({e}); "
                  "falling back to unconstrained argmax")

    experiments = list(df_test["experiment"].unique())
    if args.experiment_types:
        experiment_types = [int(x) for x in args.experiment_types.split(",")]
    elif len(experiments) == len(REFERENCE_EXPERIMENT_TYPES):
        experiment_types = REFERENCE_EXPERIMENT_TYPES
    else:
        experiment_types = [0] * len(experiments)
        if not args.no_plate_leak and plate_groups is not None:
            print(
                f"warning: {len(experiments)} test experiments do not match the "
                "18 Kaggle experiments; assuming plate-group type 0 for all "
                "(override with --experiment-types)"
            )
    # main.py:172-173's assert, but validated up front for ALL modes
    # (a local run with a wrong-length --experiment-types otherwise dies
    # with a bare IndexError after the prediction work is done)
    if len(experiment_types) != len(experiments):
        raise SystemExit(
            f"--experiment-types has {len(experiment_types)} entries but "
            f"the test metadata has {len(experiments)} experiments"
        )

    idx_test_all = load_metadata(df_test, df_controls_test, "test")
    src_size = _probe_src_size(cfg, idx_test_all, pack=args.pack)
    if args.test_crop is not None and not 0 < args.test_crop <= src_size:
        raise SystemExit(
            f"--test-crop {args.test_crop} must be in (0, {src_size}] "
            f"(test source image size)"
        )

    if args.pack:
        from rxtpu.data.pack import PackStore

        # one mmap for the whole split: PackStore is lazy, so unlike the
        # ByteStore branch there is no per-experiment RAM reason to rebuild
        pack_store_test = PackStore(os.path.join(args.pack, "test.rxpack"))

    # ONE jitted predict step shared across all experiments: batch shapes
    # are constant (Pipeline pads to global_bs), so building it inside the
    # loop would retrace+recompile the identical full-size forward once
    # per experiment (~18x compile wall-clock on the Kaggle test set)
    use_int8 = args.quantize == "int8"
    if use_int8:
        from rxtpu.infer import quantizable

        if predict_model is not None:
            raise SystemExit(
                "--quantize int8 needs a trained model (unavailable with "
                "--debug local's DummyClassifier)")
        if not quantizable(model):
            raise SystemExit(
                "--quantize int8 supports resnet backbones with the mlp "
                f"head and densenet121, got "
                f"{cfg.model.backbone}/{cfg.model.head}")
        if args.calib_batches < 1:
            raise SystemExit("--calib-batches must be >= 1")

    scan_window = max(1, args.predict_scan_window)
    use_scan = (scan_window > 1 and predict_model is None and num_hosts == 1)
    shared_step = shared_scan_step = None
    if predict_model is not None:
        def shared_step(_state, batch):
            logits = predict_model(batch["images"])
            return jax.nn.softmax(jnp.asarray(logits), axis=-1)
    elif use_int8:
        from rxtpu.infer import make_quantized_predict_step
        from rxtpu.infer.quant import make_scanned_quantized_predict_step
        from rxtpu.infer.tta import tta_transforms

        # step(qvars, batch): the quantized weight tree rides where the
        # train state otherwise would (predict_dataset passes it through);
        # the scanned variant is slice-bitwise-identical (test_quant.py)
        if use_scan:
            shared_scan_step = make_scanned_quantized_predict_step(
                model, args.test_crop, transforms=tta_transforms(args.tta),
                average=args.tta_average,
            )
        else:
            shared_step = make_quantized_predict_step(
                model, args.test_crop, transforms=tta_transforms(args.tta),
                average=args.tta_average,
            )
    elif use_scan:
        from rxtpu.infer.tta import make_scanned_tta_predict_step

        shared_scan_step = make_scanned_tta_predict_step(
            model, args.test_crop, args.tta, args.tta_average
        )
    else:
        from rxtpu.infer.tta import make_tta_predict_step

        shared_step = make_tta_predict_step(
            model, args.test_crop, args.tta, args.tta_average
        )

    pred_by_id = {}
    qvars = None
    for i, experiment in enumerate(experiments):
        # per-experiment byte store, mirroring the reference's per-experiment
        # ImagesDS (main.py:176-181) so test RAM stays one experiment wide
        idx_exp = idx_test_all.for_experiment(experiment)
        if args.pack:
            store_exp = pack_store_test
        else:
            store_exp = ByteStore(
                idx_exp, cfg.data.path_data, cfg.data.image_ext,
                preload=cfg.data.cache_bytes_in_ram,
            )
        pipe = Pipeline(
            idx_exp, store_exp, stats, global_bs, "test", src_size,
            decoder_threads=decoder_threads, shuffle=False, drop_last=False,
            num_hosts=num_hosts, host_id=host_id,
        )
        if use_int8 and qvars is None:
            # one calibration pass on the first experiment's opening
            # batches, one fold+quantize: every later experiment reuses
            # the same compiled step AND the same quantized weights
            import itertools

            from rxtpu.infer import calibrate as quant_calibrate
            from rxtpu.infer import prepare_quantized

            def calib_batches():
                # feed through `put` so pods observe globally-assembled
                # batches: every process derives IDENTICAL scales (a
                # host-local slice would give each host its own qvars)
                it = itertools.islice(pipe.epoch(0), args.calib_batches)
                for b in it:
                    yield {k: b[k] for k in ("images", "mean", "std")}

            qstats = quant_calibrate(model, state, put(calib_batches()),
                                     args.test_crop)
            qvars = prepare_quantized(model, state, qstats)
        # reference parity: TEST images are normalized but NOT cropped
        # (dataloader.py:128-139); --test-crop N opts into faster cropped
        # inference. DummyClassifier (--debug local) feeds raw images.
        if use_scan:
            probs, ids = predict_dataset(
                model, qvars if use_int8 else state, pipe, args.test_crop,
                scan_window=scan_window, mesh=mesh,
                scan_step=shared_scan_step,
            )
        else:
            probs, ids = predict_dataset(
                model, qvars if use_int8 else state, pipe, args.test_crop,
                model_fn=shared_step,
                put=None if predict_model is not None else put,
            )
        # rows arrive pipeline-ordered == df order (shuffle=False)
        df_exp = df_test[df_test["experiment"] == experiment]
        assert list(df_exp["id_code"]) == ids
        plates = df_exp["plate"].to_numpy()
        if plate_groups is not None:
            preds = constrained_predict(
                probs, plates, plate_groups, experiment_types[i], method=args.assign_method
            )
        else:
            preds = rescale(probs).argmax(axis=1).astype(np.float64)
        pred_by_id.update(zip(ids, preds))

    # align by id_code, not position: test.csv rows need not be contiguous
    # by experiment
    preds = np.asarray([pred_by_id[i] for i in df_test["id_code"]])
    if host_id == 0:
        # predictions are replicated to every host; only one process may
        # write the CSV (concurrent to_csv on shared storage interleaves)
        path = write_submission(df_test, preds, cfg.experiment_id, args.out_dir)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
