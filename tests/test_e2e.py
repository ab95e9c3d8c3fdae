"""End-to-end CLI test: train -> checkpoint -> test -> submission CSV.

Drives the full main.py-parity flow on a Kaggle-structured synthetic
dataset (plate leak intact), in-process via rxtpu.cli.main.
"""

import os

import numpy as np
import pandas as pd
import pytest

from rxtpu.cli import main as cli_main
from rxtpu.data.synthetic import make_plate_balanced_synthetic_dataset


@pytest.fixture(scope="module")
def e2e_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    manifest = make_plate_balanced_synthetic_dataset(
        str(root / "data"), nb_classes=4, img_size=48,
        n_test_experiments=1, test_types=(0,),
    )
    return root, manifest


def test_cli_full_flow(e2e_root, monkeypatch):
    root, manifest = e2e_root
    monkeypatch.chdir(root)
    rc = cli_main([
        "--debug", "--experiment_id", "e2e", "--nb-classes", "4",
        "--epochs", "1", "--crop-size", "32", "--experiment-types", "0",
    ])
    assert rc == 0
    # checkpoint written (best-val semantics, train.py:88-96)
    assert os.path.exists("models/best_model_e2e.ckpt")
    # submission format parity (main.py:198-201)
    sub = pd.read_csv("submission_e2e.csv")
    assert list(sub.columns) == ["id_code", "sirna"]
    assert len(sub) == len(manifest["test"])
    assert sub.sirna.dtype.kind == "i"
    # plate-leak respected: every predicted sirna's group plate == well plate
    pg = manifest["plate_groups"]
    for r in sub.itertuples():
        plate = int(r.id_code.split("_")[1])
        assert pg[r.sirna, 0] == plate
    # one-to-one assignment within the experiment
    assert sub.sirna.nunique() == len(sub) or len(sub) > pg.shape[0]
    # metrics logged and flushed (fixes reference quirk 2)
    assert os.path.exists("board/e2e/metrics.jsonl")
    assert os.path.getsize("board/e2e/metrics.jsonl") > 0

    # second run skips training (main.py:96-97) and still writes a submission
    os.remove("submission_e2e.csv")
    rc = cli_main([
        "--debug", "--experiment_id", "e2e", "--nb-classes", "4",
        "--epochs", "1", "--crop-size", "32", "--experiment-types", "0",
    ])
    assert rc == 0
    assert os.path.exists("submission_e2e.csv")

    # --resume must reach run_training even though the best checkpoint
    # exists (the phase-skip gate would otherwise strand preempted runs on
    # their epoch-0 weights); resuming a COMPLETED run is a no-op
    os.remove("submission_e2e.csv")
    rc = cli_main([
        "--debug", "--experiment_id", "e2e", "--nb-classes", "4",
        "--epochs", "1", "--crop-size", "32", "--experiment-types", "0",
        "--resume",
    ])
    assert rc == 0
    assert os.path.exists("submission_e2e.csv")


def test_cli_quantized_int8_predict(tmp_path, monkeypatch):
    """--quantize int8: full train -> calibrate -> W8A8 test inference.

    Non-debug run (int8 needs a trained model, not the DummyClassifier),
    so the dataset must survive the stratified val split: 10 train
    experiments give 10 rows/class. Submission must keep the same
    format/leak properties as the f32 path.
    """
    manifest = make_plate_balanced_synthetic_dataset(
        str(tmp_path / "data"), nb_classes=4, n_train_experiments=10,
        n_test_experiments=1, test_types=(0,), img_size=48,
    )
    monkeypatch.chdir(tmp_path)
    # --test-crop keeps the int8 predict cheap on the CPU mesh: the 8
    # virtual devices share one core and CPU XLA executes s8 convs ~2.3x
    # slower than bf16 (the int8 path targets the TPU MXU; full-size
    # 48^2 predicts here cost ~2 min/batch)
    rc = cli_main([
        "--experiment_id", "q8", "--nb-classes", "4", "--backbone",
        "resnet18", "--epochs", "1", "--batch-size", "2", "--crop-size",
        "32", "--experiment-types", "0", "--quantize", "int8",
        "--calib-batches", "1", "--tta", "flips", "--test-crop", "24",
    ])
    assert rc == 0
    sub = pd.read_csv("submission_q8.csv")
    assert list(sub.columns) == ["id_code", "sirna"]
    assert len(sub) == len(manifest["test"])
    pg = manifest["plate_groups"]
    for r in sub.itertuples():
        plate = int(r.id_code.split("_")[1])
        assert pg[r.sirna, 0] == plate

    # int8 + scanned predict (phase-skip re-run: best ckpt exists, so this
    # goes straight to test): scan slices are bitwise-identical to the
    # per-batch step, so the submission must match exactly
    rc = cli_main([
        "--experiment_id", "q8", "--nb-classes", "4", "--backbone",
        "resnet18", "--epochs", "1", "--batch-size", "2", "--crop-size",
        "32", "--experiment-types", "0", "--quantize", "int8",
        "--calib-batches", "1", "--tta", "flips", "--test-crop", "24",
        "--predict-scan-window", "2",
    ])
    assert rc == 0
    sub2 = pd.read_csv("submission_q8.csv")
    assert sub2.equals(sub)

    # guard rails: int8 rejects the DummyClassifier path and non-resnets
    with pytest.raises(SystemExit):
        cli_main([
            "--debug", "--experiment_id", "q8d", "--nb-classes", "4",
            "--quantize", "int8",
        ])


def test_tools_stats_cli(e2e_root, monkeypatch, capsys):
    root, _ = e2e_root
    monkeypatch.chdir(root)
    from rxtpu.tools import main as tools_main

    tools_main(["stats", "--data", "data", "--out", "st.json"])
    import json

    stats = json.load(open("st.json"))
    assert len(stats) >= 2  # train + test experiments
    for v in stats.values():
        assert len(v["mean"]) == 6 and len(v["std"]) == 6
        assert all(0 < m < 1 for m in v["mean"])


def test_tools_png2jpeg(tmp_path, monkeypatch):
    import cv2

    from rxtpu.tools import run_png2jpeg

    d = tmp_path / "data" / "train" / "X-01" / "Plate1"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    cv2.imwrite(str(d / "B03_s1_w1.png"), img)
    n = run_png2jpeg(str(tmp_path / "data"), quality=95)
    assert n == 1
    out = cv2.imread(str(d / "B03_s1_w1.jpeg"), cv2.IMREAD_GRAYSCALE)
    assert out is not None and out.shape == (32, 32)
    # q95 jpeg of noise: close but lossy
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 12


def test_training_reproducibility(synthetic_root, tmp_path):
    """Same seed + same data -> bit-identical params after a full epoch,
    despite threaded prefetch and random control pairing (counter-based
    RNG design, SURVEY §7 'hard parts')."""
    import jax
    import jax.numpy as jnp

    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.data.pipeline import ByteStore, Pipeline
    from rxtpu.data.records import load_metadata, read_metadata_csvs
    from rxtpu.train import build_model, create_train_state, run_training

    root, _ = synthetic_root
    df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "train")
    idx = load_metadata(df, dfc, "train")
    store = ByteStore(idx, root, preload=True)
    stats = {e: {"mean": np.full(6, 0.4), "std": np.full(6, 0.2)}
             for e in idx.experiments}

    def one_run(tag):
        cfg = Config(
            data=DataConfig(path_data=root, crop_size=24, src_size=64),
            model=ModelConfig(backbone="resnet18", nb_classes=8, pretrained=False,
                              size_features=16, compute_dtype="float32"),
            train=TrainConfig(nb_epochs=1, bs_per_device=4,
                              checkpoint_dir=str(tmp_path / f"m{tag}"),
                              board_dir=str(tmp_path / f"b{tag}")),
            experiment_id="rep",
        )
        model = build_model(cfg)
        state, _ = create_train_state(cfg, model, steps_per_epoch=3)
        pt = Pipeline(idx, store, stats, 4, "train", 64, seed=5)
        pv = Pipeline(idx, store, stats, 4, "val", 64, drop_last=False, shuffle=False)
        res = run_training(cfg, model, state, pt, pv,
                           base_key=jax.random.PRNGKey(7),
                           print_fn=lambda *a: None)
        return res.state

    s1 = one_run("a")
    s2 = one_run("b")
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_pretrained_path_ports_torch_weights(e2e_root, monkeypatch, tmp_path):
    """--pretrained-path loads a torch resnet50 state_dict and applies the
    6-channel stem rule, even in debug mode."""
    import torch

    from rxtpu.models.pretrained import synthetic_resnet50_state_dict

    root, _ = e2e_root
    monkeypatch.chdir(root)
    sd = synthetic_resnet50_state_dict(seed=1)
    pth = str(tmp_path / "rn50.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, pth)

    from rxtpu.cli import build_argparser, resolve_config
    from rxtpu.train import build_model, create_train_state

    args = build_argparser().parse_args([
        "--debug", "--pretrained-path", pth, "--nb-classes", "4",
        "--crop-size", "32", "--backbone", "resnet50",
    ])
    cfg = resolve_config(args)
    assert cfg.model.pretrained
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    got = np.asarray(state.params["backbone"]["conv_init"]["kernel"])
    from rxtpu.models import stem_kernel_from_rgb

    want = stem_kernel_from_rgb(np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cli_with_rxpack(e2e_root, monkeypatch):
    """Full CLI flow through the decode-free rxpack input path."""
    root, manifest = e2e_root
    monkeypatch.chdir(root)
    from rxtpu.tools import main as tools_main

    # zlib-compressed pack: the CLI auto-detects the variant from the
    # pack JSON (no flag), so the whole flow also covers the batch
    # inflate path through the native pool
    tools_main(["pack", "--data", "data", "--out", "packs",
                "--compress", "zlib"])
    rc = cli_main([
        "--debug", "--experiment_id", "e2epack", "--nb-classes", "4",
        "--epochs", "1", "--crop-size", "32", "--experiment-types", "0",
        "--pack", "packs",
    ])
    assert rc == 0
    sub = pd.read_csv("submission_e2epack.csv")
    assert len(sub) == len(manifest["test"])
    pg = manifest["plate_groups"]
    for r in sub.itertuples():
        assert pg[r.sirna, 0] == int(r.id_code.split("_")[1])

def test_cli_pack_only_no_image_tree(e2e_root, monkeypatch):
    """Pack-only deployment: ship ONLY .rxpack files + metadata + stats to a
    host (the format's whole point) and run the full CLI flow — the image
    tree is hidden after packing, so any leftover cv2.imread probe would
    crash (src geometry must come from the pack metadata)."""
    import shutil

    root, manifest = e2e_root
    monkeypatch.chdir(root)
    from rxtpu.tools import main as tools_main

    if not os.path.exists("packs_only"):
        tools_main(["pack", "--data", "data", "--out", "packs_only"])
    if not os.path.exists("stats_experiments.json"):
        tools_main(["stats", "--data", "data", "--out", "stats_experiments.json"])
    for split in ("train", "test"):
        shutil.move(os.path.join("data", split), os.path.join("data", f".{split}_hidden"))
    try:
        rc = cli_main([
            "--debug", "--experiment_id", "packonly", "--nb-classes", "4",
            "--epochs", "1", "--crop-size", "32", "--experiment-types", "0",
            "--pack", "packs_only",
        ])
        assert rc == 0
        sub = pd.read_csv("submission_packonly.csv")
        assert len(sub) == len(manifest["test"])
    finally:
        for split in ("train", "test"):
            shutil.move(os.path.join("data", f".{split}_hidden"), os.path.join("data", split))
