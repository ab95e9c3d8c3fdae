"""Dataset exploration utilities (reference notebook parity).

The reference ships ``notebooks/data_exploration.ipynb`` — a pandas
walkthrough establishing the facts the pipeline relies on:
id_code format ``{celltype}-{batch}_{plate}_{well}``, 4 celltypes with
different train/test proportions, exactly one negative control per plate
at well B02, ~30 positive-control wells per plate. This module provides
those analyses as testable functions plus a CLI report
(``python -m rxtpu.analysis --metadata data/metadata``).
"""

from __future__ import annotations

import argparse
from typing import Dict

import pandas as pd

from rxtpu.data.records import NEG_CONTROL_WELL, get_celltype


def parse_id_code(id_code: str) -> Dict[str, str]:
    """``HUVEC-01_3_B05`` -> experiment/plate/well components."""
    experiment, plate, well = id_code.split("_")
    return {
        "experiment": experiment,
        "celltype": get_celltype(experiment),
        "plate": int(plate),
        "well": well,
    }


def celltype_summary(df: pd.DataFrame) -> pd.DataFrame:
    """Wells / experiments / sirna coverage per celltype."""
    df = df.assign(celltype=df["experiment"].map(get_celltype))
    # plate ids repeat 1..4 per experiment — count physical plates as
    # distinct (experiment, plate) pairs, not distinct plate numbers
    df = df.assign(phys_plate=df["experiment"] + "/" + df["plate"].astype(str))
    agg = {"id_code": "count", "experiment": "nunique", "phys_plate": "nunique"}
    if "sirna" in df.columns:
        agg["sirna"] = "nunique"
    out = df.groupby("celltype").agg(agg)
    return out.rename(columns={"id_code": "wells", "experiment": "experiments",
                               "phys_plate": "plates", "sirna": "sirnas"})


def control_summary(df_controls: pd.DataFrame) -> pd.DataFrame:
    """Per (experiment, plate): negative/positive control well counts."""
    g = df_controls.groupby(["experiment", "plate", "well_type"])["well"].nunique()
    return g.unstack("well_type", fill_value=0)


def check_control_invariants(df_controls: pd.DataFrame) -> Dict[str, bool]:
    """The notebook's key facts: one neg control per plate, at well B02.

    Checked against the FULL set of (experiment, plate) pairs in the
    controls table — grouping only the filtered control-type subset would
    vacuously pass for a plate missing that control type entirely.
    """
    all_plates = set(map(tuple, df_controls[["experiment", "plate"]]
                         .drop_duplicates().itertuples(index=False)))
    neg = df_controls[df_controls["well_type"] == "negative_control"]
    per_plate = neg.groupby(["experiment", "plate"])["well"].agg(list)
    one_neg = set(per_plate.index) == all_plates and bool(
        (per_plate.map(len) >= 1).all())
    neg_at_b02 = one_neg and bool(
        per_plate.map(lambda ws: NEG_CONTROL_WELL in ws).all())
    pos = df_controls[df_controls["well_type"] == "positive_control"]
    pos_counts = pos.groupby(["experiment", "plate"])["well"].nunique()
    has_pos = set(pos_counts.index) == all_plates and bool(
        (pos_counts >= 1).all())
    return {
        "every_plate_has_negative_control": one_neg,
        "negative_control_at_B02": neg_at_b02,
        "every_plate_has_positive_controls": has_pos,
    }


def sirna_plate_structure(df_train: pd.DataFrame) -> pd.DataFrame:
    """Per sirna: number of distinct plates it appears on (should be 3)."""
    return df_train.groupby("sirna")["plate"].nunique().describe().to_frame("plates")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="rxtpu.analysis")
    ap.add_argument("--metadata", default="data/metadata")
    args = ap.parse_args(argv)
    import os

    for split in ("train", "test"):
        path = os.path.join(args.metadata, f"{split}.csv")
        if not os.path.exists(path):
            continue
        df = pd.read_csv(path)
        print(f"== {split} ({len(df)} wells) ==")
        print(celltype_summary(df).to_string(), "\n")
        cpath = os.path.join(args.metadata, f"{split}_controls.csv")
        if os.path.exists(cpath):
            dfc = pd.read_csv(cpath)
            inv = check_control_invariants(dfc)
            for k, v in inv.items():
                print(f"  {k}: {v}")
            print()
        if split == "train" and "sirna" in df.columns:
            print("sirna plate coverage:")
            print(sirna_plate_structure(df).to_string(), "\n")


if __name__ == "__main__":
    main()
