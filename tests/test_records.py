"""Metadata index / splits / plate-group tests (reference parity)."""

import os
import random

import numpy as np
import pandas as pd
import pytest

from rxtpu.data.records import (
    MetadataIndex,
    NEG_CONTROL_WELL,
    build_plate_groups,
    get_celltype,
    image_path,
    load_metadata,
    read_metadata_csvs,
    split_by_experiment,
    stratified_split,
)
from rxtpu.data.synthetic import make_plate_balanced_train_df


def test_image_path_template_parity():
    # dataloader.py:72-73 template
    p = image_path("data", "train", "HUVEC-01", 3, "B05", 2, 4)
    assert p == "data/train/HUVEC-01/Plate3/B05_s2_w4.jpeg"
    p = image_path("data", "test", "U2OS-04", 1, "K21", 1, 6, ext="png")
    assert p == "data/test/U2OS-04/Plate1/K21_s1_w6.png"


def test_get_celltype():
    assert get_celltype("HUVEC-13") == "HUVEC"
    assert get_celltype("RPE-04") == "RPE"


def test_load_metadata_controls(synthetic_root):
    root, manifest = synthetic_root
    df, df_controls = read_metadata_csvs(os.path.join(root, "metadata"), "train")
    idx = load_metadata(df, df_controls, split="train")
    assert len(idx) == len(df)
    # every (experiment, plate) has a B02 negative control and >=1 positive
    for r in idx.records:
        key = (r.experiment, r.plate)
        assert idx.neg_controls[key].well == NEG_CONTROL_WELL
        assert len(idx.pos_controls[key]) >= 1
    # control draw: neg is always B02, pos is a positive-control well of the plate
    rng = random.Random(0)
    r = idx.records[0]
    neg, pos = idx.control_views(r.experiment, r.plate, rng)
    assert neg.well == NEG_CONTROL_WELL
    assert pos.well.startswith("B2")
    # files referenced actually exist on disk
    assert os.path.exists(
        image_path(root, "train", r.experiment, r.plate, r.well, 1, 1)
    )


def test_for_experiment_subsets(synthetic_root):
    root, manifest = synthetic_root
    df, df_controls = read_metadata_csvs(os.path.join(root, "metadata"), "test")
    idx = load_metadata(df, df_controls, split="test")
    exps = idx.experiments
    assert len(exps) == 2
    sub = idx.for_experiment(exps[0])
    assert all(r.experiment == exps[0] for r in sub.records)
    assert len(sub) + len(idx.for_experiment(exps[1])) == len(idx)


def test_stratified_split_parity():
    # Must reproduce sklearn's seeded stratified split exactly (main.py:108-113).
    df = pd.DataFrame(
        {
            "id_code": [f"id{i}" for i in range(100)],
            "sirna": [i % 5 for i in range(100)],
        }
    )
    a_train, a_val = stratified_split(df, 0.1, 42)
    b_train, b_val = stratified_split(df, 0.1, 42)
    assert list(a_val.id_code) == list(b_val.id_code)
    assert len(a_val) == 10
    # stratification: each class appears in val 10% of the time
    assert sorted(a_val.sirna.value_counts().values) == [2, 2, 2, 2, 2]


def test_split_by_experiment_fixed():
    # The reference version is dead code with a KeyError bug (SURVEY §2 quirk 1);
    # ours must actually work and hold out 1/3 of experiments per celltype.
    rows = []
    for ct, n_exp in (("HUVEC", 6), ("RPE", 3)):
        for e in range(n_exp):
            exp = f"{ct}-{e+1:02d}"
            for i in range(4):
                rows.append(dict(id_code=f"{exp}_{i}", experiment=exp, sirna=i, plate=1, well="B03"))
    df = pd.DataFrame(rows)
    df_train, df_val = split_by_experiment(df, random_state=42)
    assert len(df_train) + len(df_val) == len(df)
    val_exps = set(df_val.experiment.unique())
    train_exps = set(df_train.experiment.unique())
    assert not (val_exps & train_exps)
    # 6//3=2 HUVEC experiments and 3//3=1 RPE experiment held out
    assert sum(e.startswith("HUVEC") for e in val_exps) == 2
    assert sum(e.startswith("RPE") for e in val_exps) == 1
    # deterministic under the same seed
    df_train2, df_val2 = split_by_experiment(df, random_state=42)
    assert list(df_val2.id_code) == list(df_val.id_code)


def test_build_plate_groups():
    nb = 16
    df = make_plate_balanced_train_df(nb_classes=nb, seed=3)
    pg = build_plate_groups(df, nb_classes=nb)
    assert pg.shape == (nb, 4)
    # each row: the 3 observed plates + inferred 4th; together a permutation of 1..4
    for row in pg:
        assert sorted(row.tolist()) == [1, 2, 3, 4]
    # inferred plate = 10 - sum of observed (main.py:166)
    for sirna in range(nb):
        observed = set(df[df.sirna == sirna].plate.unique())
        missing = (set([1, 2, 3, 4]) - observed).pop()
        assert pg[sirna, 3] == missing


def test_build_plate_groups_asserts_on_bad_data():
    df = pd.DataFrame(
        dict(id_code=["a", "b"], experiment=["E-1"] * 2, plate=[1, 2], well=["B03"] * 2, sirna=[0, 0])
    )
    with pytest.raises(AssertionError):
        build_plate_groups(df, nb_classes=1)


def test_for_experiment_filters_controls(synthetic_root):
    root, _ = synthetic_root
    df, df_controls = read_metadata_csvs(os.path.join(root, "metadata"), "test")
    idx = load_metadata(df, df_controls, split="test")
    exp = idx.experiments[0]
    sub = idx.for_experiment(exp)
    assert all(k[0] == exp for k in sub.neg_controls)
    assert all(k[0] == exp for k in sub.pos_controls)
    assert len(sub.neg_controls) < len(idx.neg_controls)
