"""Analysis module tests (data_exploration notebook parity)."""

import os

import pandas as pd

from rxtpu.analysis import (
    celltype_summary,
    check_control_invariants,
    control_summary,
    parse_id_code,
    sirna_plate_structure,
)
from rxtpu.data.records import read_metadata_csvs


def test_parse_id_code():
    p = parse_id_code("HUVEC-01_3_B05")
    assert p == {"experiment": "HUVEC-01", "celltype": "HUVEC", "plate": 3, "well": "B05"}


def test_summaries_on_synthetic(synthetic_root):
    root, manifest = synthetic_root
    df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "train")
    ct = celltype_summary(df)
    assert set(ct.index) == {"HUVEC", "U2OS"}
    assert ct["wells"].sum() == len(df)
    cs = control_summary(dfc)
    assert (cs["negative_control"] >= 1).all()
    inv = check_control_invariants(dfc)
    assert all(inv.values()), inv


def test_invariant_violation_detected():
    dfc = pd.DataFrame([
        dict(id_code="E-1_1_B05", experiment="E-1", plate=1, well="B05",
             sirna=1138, well_type="negative_control"),  # not at B02!
        dict(id_code="E-1_1_B20", experiment="E-1", plate=1, well="B20",
             sirna=1108, well_type="positive_control"),
    ])
    inv = check_control_invariants(dfc)
    assert inv["every_plate_has_negative_control"]
    assert not inv["negative_control_at_B02"]


def test_sirna_plate_structure():
    from rxtpu.data.synthetic import make_plate_balanced_train_df

    df = make_plate_balanced_train_df(nb_classes=12, seed=1)
    desc = sirna_plate_structure(df)
    assert desc.loc["min", "plates"] == 3.0
    assert desc.loc["max", "plates"] == 3.0
