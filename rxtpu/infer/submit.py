"""Submission writer: byte-format parity with main.py:198-201.

Columns ``id_code,sirna`` (int sirna), no index, written as
``submission_{experiment_id}.csv``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def write_submission(
    df_test: pd.DataFrame,
    preds: np.ndarray,
    experiment_id: str,
    out_dir: str = ".",
) -> str:
    import os

    df = df_test.copy()
    df["sirna"] = preds.astype(int)
    path = os.path.join(out_dir, f"submission_{experiment_id}.csv")
    df.to_csv(path, index=False, columns=["id_code", "sirna"])
    return path
