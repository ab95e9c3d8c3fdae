"""Synthetic fixture dataset generator.

The reference has no test suite (SURVEY.md §4); its only harness is the
``--debug`` one-batch mode. This module manufactures a miniature on-disk
dataset with the exact layout the real pipeline reads (path template of
``dataloader.py:72-73``, metadata CSV schemas of the Kaggle release) so the
framework is testable end-to-end without the 45GB Kaggle download.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import pandas as pd

from rxtpu.data.records import NEG_CONTROL_WELL, image_path

_WELL_ROWS = "BCDEFGH"


def _well_name(i: int) -> str:
    return f"{_WELL_ROWS[1 + i // 12]}{3 + (i % 12):02d}"  # skip row B col 02 (controls)


def cells_image(
    rng: np.random.Generator, size: int, sirna: int, channel: int
) -> np.ndarray:
    """Fluorescence-microscopy-like plane: dark field + sparse Gaussian
    cell blobs + low-amplitude sensor noise.

    The default ``content="uniform"`` planes are 60-level i.i.d. noise —
    ~5.9 bits/pixel of irreducible entropy, which no codec can compress
    past ~1.35x and which is nothing like the RxRx1 content the reference
    trains on (spatially smooth cellular structure over a near-black
    background). Storage/compression measurements (the bench's pack-ratio
    and stall projections) use this mode so they reflect the real
    workload's compressibility; the class/channel signal the models fit
    (mean level keyed by sirna+channel) is preserved.
    """
    base = 4.0 + (sirna * 23 + channel * 11) % 20
    img = np.full((size, size), base, np.float32)
    n = max(3, int(40 * (size / 512.0) ** 2))
    for _ in range(n):
        cy, cx = rng.uniform(0, size, 2)
        sigma = rng.uniform(size / 64.0, size / 24.0)
        amp = rng.uniform(30.0, 160.0)
        r = int(3 * sigma)
        y0, y1 = max(0, int(cy) - r), min(size, int(cy) + r + 1)
        x0, x1 = max(0, int(cx) - r), min(size, int(cx) + r + 1)
        if y0 >= y1 or x0 >= x1:
            continue
        ys = np.arange(y0, y1, dtype=np.float32) - cy
        xs = np.arange(x0, x1, dtype=np.float32) - cx
        g = np.exp(-(ys[:, None] ** 2 + xs[None, :] ** 2) / (2 * sigma**2))
        img[y0:y1, x0:x1] += amp * g
    img += rng.normal(0.0, 2.0, img.shape).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_synthetic_dataset(
    root: str,
    experiments: Sequence[str] = ("HUVEC-01", "U2OS-01"),
    plates: Sequence[int] = (1, 2),
    wells_per_plate: int = 3,
    pos_controls_per_plate: int = 2,
    nb_classes: int = 8,
    img_size: int = 64,
    seed: int = 0,
    splits: Sequence[str] = ("train", "test"),
    ext: str = "jpeg",
    content: str = "uniform",
) -> dict:
    """Write a miniature dataset under ``root``.

    Layout: ``{root}/{split}/{exp}/Plate{p}/{well}_s{site}_w{ch}.{ext}`` plus
    ``{root}/metadata/{train,test}.csv`` and ``..._controls.csv``.

    Each (split, experiment) gets ``wells_per_plate`` sample wells per plate
    with sirna labels cycling through ``nb_classes`` classes, one negative
    control at B02 and ``pos_controls_per_plate`` positive-control wells.

    Returns a manifest dict with the written dataframes.
    """
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)

    if content not in ("uniform", "cells"):
        raise ValueError(f"unknown synthetic content {content!r}")

    def write_image(path: str, sirna: int, channel: int):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # Deterministic-ish content keyed by label+channel so stats differ
        # per experiment/channel and models have signal to fit.
        if content == "cells":
            img = cells_image(rng, img_size, sirna, channel)
        else:
            base = (sirna * 23 + channel * 11) % 180
            img = rng.integers(0, 60, size=(img_size, img_size), dtype=np.uint8) + base
        if ext == "jpeg":
            cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        else:
            cv2.imwrite(path, img)

    manifest = {}
    sirna_counter = 0
    for split in splits:
        rows, ctrl_rows = [], []
        for exp in experiments:
            for plate in plates:
                # sample wells
                for w in range(wells_per_plate):
                    well = _well_name(w)
                    sirna = sirna_counter % nb_classes
                    sirna_counter += 1
                    id_code = f"{exp}_{plate}_{well}"
                    row = dict(id_code=id_code, experiment=exp, plate=plate, well=well)
                    if split == "train":
                        row["sirna"] = sirna
                    rows.append(row)
                    for site in (1, 2):
                        for ch in range(1, 7):
                            write_image(
                                image_path(root, split, exp, plate, well, site, ch, ext),
                                sirna, ch,
                            )
                # negative control at B02 (dataloader.py:29-31)
                ctrl_rows.append(
                    dict(
                        id_code=f"{exp}_{plate}_{NEG_CONTROL_WELL}",
                        experiment=exp, plate=plate, well=NEG_CONTROL_WELL,
                        sirna=1138, well_type="negative_control",
                    )
                )
                for site in (1, 2):
                    for ch in range(1, 7):
                        write_image(
                            image_path(root, split, exp, plate, NEG_CONTROL_WELL, site, ch, ext),
                            0, ch,
                        )
                # positive controls
                for p in range(pos_controls_per_plate):
                    well = f"B{20 + p:02d}"
                    ctrl_rows.append(
                        dict(
                            id_code=f"{exp}_{plate}_{well}",
                            experiment=exp, plate=plate, well=well,
                            sirna=1108 + p, well_type="positive_control",
                        )
                    )
                    for site in (1, 2):
                        for ch in range(1, 7):
                            write_image(
                                image_path(root, split, exp, plate, well, site, ch, ext),
                                p + 1, ch,
                            )
        df = pd.DataFrame(rows)
        df_controls = pd.DataFrame(ctrl_rows)
        df.to_csv(os.path.join(root, "metadata", f"{split}.csv"), index=False)
        df_controls.to_csv(
            os.path.join(root, "metadata", f"{split}_controls.csv"), index=False
        )
        manifest[split] = df
        manifest[f"{split}_controls"] = df_controls
    return manifest


def make_plate_balanced_synthetic_dataset(
    root: str,
    nb_classes: int = 8,
    n_train_experiments: int = 3,
    n_test_experiments: int = 2,
    test_types: Sequence[int] = (0, 1),
    img_size: int = 64,
    seed: int = 0,
    ext: str = "jpeg",
) -> dict:
    """Synthetic dataset honoring the Kaggle plate-leak structure.

    Mirrors the real layout the reference exploits (main.py:157-167):
    each sirna appears exactly ONCE per experiment; across the train
    experiments a sirna lands on 3 distinct plates of 1..4 (the 4th is
    systematically missing); each test experiment places sirna k on
    ``plate_groups[k, type]`` for that experiment's type. So
    ``build_plate_groups`` succeeds and greedy/Hungarian assignment has a
    consistent one-to-one solution per experiment.
    """
    import cv2

    from rxtpu.data.records import build_plate_groups

    assert nb_classes >= 4 and len(test_types) == n_test_experiments
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)

    def write_image(path: str, sirna: int, channel: int):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        base = (sirna * 23 + channel * 11) % 180
        img = rng.integers(0, 60, size=(img_size, img_size), dtype=np.uint8) + base
        cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 95] if ext == "jpeg" else [])

    # sirna k's 3 allowed plates: {1..4} minus ((k % 4) + 1)
    allowed = {
        k: [p for p in (1, 2, 3, 4) if p != (k % 4) + 1] for k in range(nb_classes)
    }

    def emit_controls(split, exp, plate, ctrl_rows):
        ctrl_rows.append(
            dict(id_code=f"{exp}_{plate}_{NEG_CONTROL_WELL}", experiment=exp,
                 plate=plate, well=NEG_CONTROL_WELL, sirna=1138,
                 well_type="negative_control")
        )
        ctrl_rows.append(
            dict(id_code=f"{exp}_{plate}_B20", experiment=exp, plate=plate,
                 well="B20", sirna=1108, well_type="positive_control")
        )
        for well, s in ((NEG_CONTROL_WELL, 0), ("B20", 1)):
            for site in (1, 2):
                for ch in range(1, 7):
                    write_image(image_path(root, split, exp, plate, well, site, ch, ext), s, ch)

    manifest = {}
    # ---- train: experiment e places sirna k on allowed[k][e % 3] ----------
    rows, ctrl_rows = [], []
    for e in range(n_train_experiments):
        exp = f"HUVEC-{e+1:02d}"
        used_wells = {p: 0 for p in (1, 2, 3, 4)}
        for k in range(nb_classes):
            plate = allowed[k][e % 3]
            well = _well_name(used_wells[plate])
            used_wells[plate] += 1
            rows.append(dict(id_code=f"{exp}_{plate}_{well}", experiment=exp,
                             plate=plate, well=well, sirna=k))
            for site in (1, 2):
                for ch in range(1, 7):
                    write_image(image_path(root, "train", exp, plate, well, site, ch, ext), k, ch)
        for plate in (1, 2, 3, 4):
            emit_controls("train", exp, plate, ctrl_rows)
    df_train = pd.DataFrame(rows)
    pd.DataFrame(ctrl_rows).to_csv(
        os.path.join(root, "metadata", "train_controls.csv"), index=False
    )
    df_train.to_csv(os.path.join(root, "metadata", "train.csv"), index=False)
    manifest["train"] = df_train

    # ---- test: sirna k at plate_groups[k, type] ---------------------------
    plate_groups = build_plate_groups(df_train, nb_classes=nb_classes)
    rows, ctrl_rows = [], []
    for e in range(n_test_experiments):
        exp = f"U2OS-{e+1:02d}"
        etype = test_types[e]
        used_wells = {p: 0 for p in (1, 2, 3, 4)}
        for k in range(nb_classes):
            plate = int(plate_groups[k, etype])
            well = _well_name(used_wells[plate])
            used_wells[plate] += 1
            rows.append(dict(id_code=f"{exp}_{plate}_{well}", experiment=exp,
                             plate=plate, well=well, _sirna_true=k))
            for site in (1, 2):
                for ch in range(1, 7):
                    write_image(image_path(root, "test", exp, plate, well, site, ch, ext), k, ch)
        for plate in (1, 2, 3, 4):
            emit_controls("test", exp, plate, ctrl_rows)
    df_test = pd.DataFrame(rows)
    # ground truth kept in the manifest, not the public csv (Kaggle parity)
    df_test_public = df_test.drop(columns=["_sirna_true"])
    df_test_public.to_csv(os.path.join(root, "metadata", "test.csv"), index=False)
    pd.DataFrame(ctrl_rows).to_csv(
        os.path.join(root, "metadata", "test_controls.csv"), index=False
    )
    manifest["test"] = df_test
    manifest["plate_groups"] = plate_groups
    manifest["test_types"] = list(test_types)
    return manifest


def make_plate_balanced_train_df(
    nb_classes: int,
    experiments: Sequence[str] = ("HUVEC-01",),
    seed: int = 0,
) -> pd.DataFrame:
    """Metadata-only frame where each sirna appears on exactly 3 of plates 1-4.

    Used to test the plate-group builder (main.py:157-167) without images.
    """
    rng = np.random.default_rng(seed)
    rows = []
    for sirna in range(nb_classes):
        missing = rng.integers(1, 5)
        plates = [p for p in (1, 2, 3, 4) if p != missing]
        for exp in experiments:
            for plate in plates:
                rows.append(
                    dict(
                        id_code=f"{exp}_{plate}_X{sirna:04d}",
                        experiment=exp, plate=plate,
                        well=f"X{sirna:04d}", sirna=sirna,
                    )
                )
    return pd.DataFrame(rows)
