"""Results-table writer + model evaluation entry point.

Parity with reference ``lib/utils.py:20-56``: run the model at test time with
128 MC samples, un-scale, compute NLL + CDC skill at the 1-4 week horizons,
and upsert a row (matched on the config variables) into
``results_table*.csv`` under a file lock.  Column naming preserved:
``"{season} {day_index}"`` for NLL and ``"skill {season} {weeks}"``.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import pandas as pd
from filelock import FileLock

from fiude_tpu.utils import metrics as Metrics


def atomic_to_csv(df: pd.DataFrame, csv_path: str) -> None:
    """Write ``df`` to ``csv_path`` via a same-directory temp file +
    ``os.replace`` so a SIGKILL/timeout mid-write can never leave a
    truncated table behind (readers see either the old or the new file,
    never a partial one).  The reference's bare ``df.to_csv`` inside the
    lock (tuning/tune_node.py:247,258) has this hazard; our sweep chains
    run every worker under ``timeout`` so it actually fires."""
    tmp_path = csv_path + f".tmp.{os.getpid()}"
    df.to_csv(tmp_path)
    os.replace(tmp_path, csv_path)


def evaluate_forecast(y_pred: np.ndarray, y_test: np.ndarray,
                      scaler: np.ndarray, *, window_size: int,
                      test_season: int) -> Dict[str, float]:
    """Horizon metrics from an MC forecast ensemble.

    y_pred: (B, S, T, R); y_test: (B, T, R); scaler: (R,).
    Returns {"{season} {g}": nll, "skill {season} {w}": skill} for the four
    weekly horizons (lib/utils.py:52-54).
    """
    scaler = np.asarray(scaler).reshape(1, 1, 1, -1)
    y_pr = np.asarray(y_pred) * scaler
    y_te = np.asarray(y_test) * scaler[0]
    pred_mean = y_pr.mean(1)
    pred_std = y_pr.std(1)

    out = {}
    for col, g in zip([7, 14, 21, 28],
                      [window_size + 6, window_size + 13,
                       window_size + 20, window_size + 27]):
        out[f"{test_season} {g}"] = Metrics.nll(
            y_te[:, g, :], pred_mean[:, g, :], pred_std[:, g, :])
        out[f"skill {test_season} {col}"] = Metrics.skill(
            y_te[:, g, :], pred_mean[:, g, :], pred_std[:, g, :])
    return out


def upsert_results_row(file_name: str, variables: Dict, values: Dict) -> None:
    """File-locked upsert into ``{file_name}.csv`` matched on ``variables``
    (lib/utils.py:28-56).  Creates the table if missing."""
    lock_path = file_name + ".lock"
    csv_path = file_name + ".csv"
    with FileLock(lock_path):
        if os.path.exists(csv_path):
            df = pd.read_csv(csv_path, index_col=0)
        else:
            df = pd.DataFrame()

        common = None
        for key, value in variables.items():
            if key not in df.columns:
                common = np.asarray([], dtype=int)
                break
            idx = np.where(df[key] == value)[0]
            common = idx if common is None else np.intersect1d(common, idx)

        if common is not None and len(common) > 0:
            row = df.index[int(np.min(common))]
        else:
            row = (int(np.max(df.index)) + 1) if len(df) else 0

        for key, value in {**variables, **values}.items():
            df.loc[row, key] = value
        atomic_to_csv(df, csv_path)


def test_and_record(trainer, scaler, x_test, y_test, t, *, test_season: int,
                    window_size: int = 1, variables: Optional[Dict] = None,
                    n_samples: int = 128, file_name: str = "results_table"):
    """Reference ``utils.test``: forecast at 128 samples, metrics, upsert."""
    variables = variables or {"ode_name": "CONN"}
    y_pred = trainer.forecast(x_test, t, n_samples=n_samples)
    values = evaluate_forecast(np.asarray(y_pred), np.asarray(y_test),
                               np.asarray(scaler), window_size=window_size,
                               test_season=test_season)
    upsert_results_row(file_name, variables, values)
    return values
