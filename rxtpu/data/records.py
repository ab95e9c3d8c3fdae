"""Metadata index: experiments / plates / wells / sites / channels + controls.

Rebuilds the sample-assembly *logic* of the reference dataset
(``cell_classifier/dataloader.py:16-109``) as a plain-data index that the
TPU input pipeline consumes:

- path template parity with ``dataloader.py:72-73``:
  ``{img_dir}/{train|test}/{experiment}/Plate{plate}/{well}_s{site}_w{channel}.{ext}``
- negative control = fixed well ``B02`` of the same (experiment, plate)
  (``dataloader.py:29-31,162-163``)
- positive controls = every ``positive_control`` well of the same
  (experiment, plate); one is drawn at random per sample
  (``dataloader.py:33-35,167-171``)
- stratified-by-sirna 90/10 split with seed 42 (``main.py:108-113``)
- experiment-wise split (``dataloader.py:215-239``) — reimplemented
  *without* the reference's dead-code bug (it reads a nonexistent ``exp``
  column; see SURVEY.md §2 quirk 1).

Unlike the reference, nothing here owns file bytes: byte caching / decode
live in ``rxtpu.data.pipeline`` / ``rxtpu.data.decode`` so that the index
stays cheap to build, pickle and ship to every host of a multi-host mesh.
"""

from __future__ import annotations

import dataclasses
import os
import random
from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd

NEG_CONTROL_WELL = "B02"  # dataloader.py:29-31: every plate's neg control well


def get_celltype(experiment: str) -> str:
    """main.py:79-80: celltype prefix of the experiment name."""
    return experiment.split("-")[0]


def image_path(
    img_dir: str,
    split: str,
    experiment: str,
    plate: int,
    well: str,
    site: int,
    channel: int,
    ext: str = "jpeg",
) -> str:
    """Path template parity with dataloader.py:72-73."""
    return "/".join(
        [img_dir, split, experiment, f"Plate{plate}", f"{well}_s{site}_w{channel}.{ext}"]
    )


@dataclasses.dataclass(frozen=True)
class WellRecord:
    """One well = one classification sample (2 sites x 6 channels on disk)."""

    id_code: str
    experiment: str
    plate: int
    well: str
    sirna: int  # -1 for unlabeled test wells
    celltype: str


@dataclasses.dataclass
class MetadataIndex:
    """Index over one split's wells plus its control wells.

    ``records`` are the classification samples; ``neg_controls`` maps
    (experiment, plate) -> the B02 well record; ``pos_controls`` maps
    (experiment, plate) -> list of positive-control well records.
    """

    records: List[WellRecord]
    neg_controls: Dict[Tuple[str, int], WellRecord]
    pos_controls: Dict[Tuple[str, int], List[WellRecord]]
    split: str  # "train" or "test" — the on-disk directory (dataloader.py:68-71)

    def __len__(self) -> int:
        return len(self.records)

    @property
    def experiments(self) -> List[str]:
        seen: Dict[str, None] = {}
        for r in self.records:
            seen.setdefault(r.experiment, None)
        return list(seen)

    def control_views(self, experiment: str, plate: int, rng: random.Random):
        """Draw the (neg, pos) control wells for a sample.

        Negative control is always B02; positive control is a uniformly
        random positive-control well of the same (experiment, plate)
        (dataloader.py:162-171).
        """
        key = (experiment, plate)
        neg = self.neg_controls[key]
        pos_wells = self.pos_controls[key]
        pos = pos_wells[rng.randrange(len(pos_wells))]
        return neg, pos

    def subset(self, indices: Sequence[int]) -> "MetadataIndex":
        return MetadataIndex(
            records=[self.records[i] for i in indices],
            neg_controls=self.neg_controls,
            pos_controls=self.pos_controls,
            split=self.split,
        )

    def for_experiment(self, experiment: str) -> "MetadataIndex":
        """Per-experiment view used by the test loop (main.py:174-181).

        Controls are filtered too, so a ByteStore over this view preloads
        only one experiment's bytes (reference per-experiment ImagesDS
        memory behavior).
        """
        idx = [i for i, r in enumerate(self.records) if r.experiment == experiment]
        return MetadataIndex(
            records=[self.records[i] for i in idx],
            neg_controls={k: v for k, v in self.neg_controls.items() if k[0] == experiment},
            pos_controls={k: v for k, v in self.pos_controls.items() if k[0] == experiment},
            split=self.split,
        )


def all_records(index: "MetadataIndex") -> List[WellRecord]:
    """Every distinct well of an index: samples + neg/pos controls.

    Deduped by well identity — controls repeat across positive-control
    lists. The single source of truth for 'all records' (pack writing,
    ByteStore preloading, stats passes).
    """
    records = list(index.records)
    records += list(index.neg_controls.values())
    for lst in index.pos_controls.values():
        records += lst
    seen, out = set(), []
    for r in records:
        k = (r.experiment, r.plate, r.well)
        if k not in seen:
            seen.add(k)
            out.append(r)
    return out


def _records_from_df(df: pd.DataFrame) -> List[WellRecord]:
    has_sirna = "sirna" in df.columns
    out = []
    for row in df.itertuples(index=False):
        sirna = int(getattr(row, "sirna")) if has_sirna else -1
        out.append(
            WellRecord(
                id_code=str(row.id_code),
                experiment=str(row.experiment),
                plate=int(row.plate),
                well=str(row.well),
                sirna=sirna,
                celltype=get_celltype(str(row.experiment)),
            )
        )
    return out


def load_metadata(
    df: pd.DataFrame,
    df_controls: pd.DataFrame,
    split: str,
) -> MetadataIndex:
    """Build the index from Kaggle metadata frames.

    Mirrors the control masking of dataloader.py:28-35: negative controls
    are filtered to well B02; positive controls keep every well.
    """
    records = _records_from_df(df)

    neg_mask = (df_controls["well_type"] == "negative_control") & (
        df_controls["well"] == NEG_CONTROL_WELL
    )
    neg_records = _records_from_df(df_controls[neg_mask])
    pos_records = _records_from_df(df_controls[df_controls["well_type"] == "positive_control"])

    neg_controls: Dict[Tuple[str, int], WellRecord] = {}
    for r in neg_records:
        neg_controls[(r.experiment, r.plate)] = r

    pos_controls: Dict[Tuple[str, int], List[WellRecord]] = {}
    for r in pos_records:
        pos_controls.setdefault((r.experiment, r.plate), []).append(r)

    return MetadataIndex(
        records=records,
        neg_controls=neg_controls,
        pos_controls=pos_controls,
        split=split,
    )


def read_metadata_csvs(path_metadata: str, split: str):
    """Load ({split}.csv, {split}_controls.csv) as in main.py:100,118,151-152."""
    df = pd.read_csv(os.path.join(path_metadata, f"{split}.csv"))
    df_controls = pd.read_csv(os.path.join(path_metadata, f"{split}_controls.csv"))
    return df, df_controls


def stratified_split(
    df: pd.DataFrame,
    val_fraction: float = 0.1,
    seed: int = 42,
    stratify_by_sirna: bool = True,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Reference split parity: sklearn stratified 90/10, seed 42 (main.py:108-113)."""
    from sklearn.model_selection import train_test_split as _sk_split

    stratify = df[["sirna"]] if stratify_by_sirna else None
    return _sk_split(df, test_size=val_fraction, random_state=seed, stratify=stratify)


def split_by_experiment(
    df: pd.DataFrame, random_state: int
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Experiment-wise holdout: 1/3 of each celltype's experiments -> val.

    Functional reimplementation of dataloader.py:215-239 with the reference's
    bug fixed: it indexes a nonexistent ``exp`` column (the metadata column is
    ``experiment``), making the original a dead-code KeyError behind
    ``train_split_by_experiment=False`` (main.py:43). Semantics preserved:
    per celltype, shuffle experiments, hold out floor(n/3) as validation,
    then shuffle both frames.
    """
    rng = random.Random(random_state)
    if "celltype" not in df.columns:
        df = df.assign(celltype=df["experiment"].map(get_celltype))
    train_parts, val_parts = [], []
    for celltype in df["celltype"].unique():
        df_ct = df[df["celltype"] == celltype]
        exps = list(df_ct["experiment"].unique())
        rng.shuffle(exps)
        exps_val = set(exps[: len(exps) // 3])
        mask_val = df_ct["experiment"].isin(exps_val)
        train_parts.append(df_ct[~mask_val])
        val_parts.append(df_ct[mask_val])
    df_train = (
        pd.concat(train_parts).sample(frac=1, random_state=random_state).reset_index(drop=True)
    )
    df_val = (
        pd.concat(val_parts).sample(frac=1, random_state=random_state).reset_index(drop=True)
    )
    return df_train, df_val


def build_plate_groups(df_train: pd.DataFrame, nb_classes: int = 1108) -> np.ndarray:
    """Plate-leak structure: for each sirna, the 4 plates it can appear on.

    Parity with main.py:157-167: each sirna appears on exactly 3 of the 4
    plates in train; the missing 4th plate is ``10 - sum(observed)``.
    Returns int array [nb_classes, 4].
    """
    plate_groups = np.zeros((nb_classes, 4), dtype=np.int64)
    for sirna in range(nb_classes):
        grp = df_train.loc[df_train.sirna == sirna, :].plate.value_counts().index.values
        assert len(grp) == 3, f"sirna {sirna}: expected 3 plates, got {len(grp)}"
        plate_groups[sirna, 0:3] = grp
        plate_groups[sirna, 3] = 10 - grp.sum()
    return plate_groups
