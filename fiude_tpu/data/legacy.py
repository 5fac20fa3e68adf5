"""Legacy national (single-region) data pipeline — England + US.

Re-design of the reference's ``lib/Old/data.py:15-114`` (the only England
end-to-end path in the reference; its file locations are hardcoded personal
absolute paths, here parameterized under ``root``):

* ``load_legacy_queries`` (``:15-40``): clean a national query table
  (dedupe index, strip punctuation from phrases, word-sort + dedupe
  columns, drop all-NaN rows and zero-max columns), rank queries by the
  L2 norm of (max-normalized Pearson correlation to ILI, max-normalized
  similarity score), descending.
* ``legacy_national_data`` (``:43-114``): weekly sliding windows anchored
  on per-season date ranges (``test_dates``, ``:45-60``); England weekly
  ILI is subsampled from a daily cubic-interpolated table (every 7th row,
  ``:73-74``), the US table is read from ``national_flu.csv``; indices are
  shifted +3 days; non-England windows drop their last row (``:93-95``);
  outputs are numpy (the reference returns torch tensors).

Returns plain arrays — feed them to
:class:`~fiude_tpu.data.loader.ArrayLoader` for batching (the reference's
list-of-batches is replaced by the loader, which is what the trainer
consumes).
"""

from __future__ import annotations

import datetime as dt
import os
from typing import Optional, Tuple

import numpy as np
import pandas as pd

#: per-season window anchors (reference lib/Old/data.py:45-60):
#: [train_start, train_end, test_start, test_end]
LEGACY_TEST_DATES = {
    2004: [dt.date(2004, 3, 24), dt.date(2004, 8, 12), dt.date(2004, 10, 19), dt.date(2005, 5, 14)],
    2005: [dt.date(2004, 3, 24), dt.date(2005, 8, 11), dt.date(2005, 10, 19), dt.date(2006, 5, 14)],
    2006: [dt.date(2004, 3, 24), dt.date(2006, 8, 16), dt.date(2006, 10, 19), dt.date(2007, 5, 14)],
    2007: [dt.date(2004, 3, 24), dt.date(2007, 8, 15), dt.date(2007, 10, 19), dt.date(2008, 5, 14)],
    2008: [dt.date(2004, 3, 24), dt.date(2008, 8, 14), dt.date(2008, 10, 19), dt.date(2009, 5, 14)],
    2009: [dt.date(2004, 3, 24), dt.date(2009, 8, 13), dt.date(2009, 10, 19), dt.date(2010, 5, 14)],
    2010: [dt.date(2004, 3, 24), dt.date(2010, 8, 12), dt.date(2010, 10, 19), dt.date(2011, 5, 14)],
    2011: [dt.date(2004, 3, 24), dt.date(2011, 8, 11), dt.date(2011, 10, 19), dt.date(2012, 5, 14)],
    2012: [dt.date(2004, 3, 24), dt.date(2012, 8, 16), dt.date(2012, 10, 19), dt.date(2013, 5, 14)],
    2013: [dt.date(2004, 3, 24), dt.date(2013, 8, 15), dt.date(2013, 10, 19), dt.date(2014, 5, 14)],
    2014: [dt.date(2004, 3, 24), dt.date(2014, 8, 14), dt.date(2014, 10, 19), dt.date(2015, 5, 14)],
    2015: [dt.date(2004, 3, 24), dt.date(2015, 8, 13), dt.date(2015, 11, 1),  dt.date(2016, 4, 17)],
    2016: [dt.date(2004, 3, 24), dt.date(2016, 8, 11), dt.date(2016, 10, 29), dt.date(2017, 4, 16)],
    2017: [dt.date(2004, 3, 24), dt.date(2017, 8, 10), dt.date(2017, 10, 28), dt.date(2018, 4, 15)],
    2018: [dt.date(2004, 3, 24), dt.date(2018, 8, 9),  dt.date(2018, 10, 27), dt.date(2019, 4, 14)],
}


def _country_code(country: str) -> str:
    return "UK" if country == "England" else "US"


def load_legacy_queries(root: str, data_season: int, country: str = "England",
                        n_queries: int = 100) -> pd.DataFrame:
    """Clean + rank the national query table (reference lib/Old/data.py:15-40).

    Expects under ``root``:
      ``ILI_rates_{code}_thursday_cubic_interpolation.csv`` (daily, 'wILI'),
      ``{code}_Qs_small_7day_avg.csv`` (daily query columns),
      ``{code}_Similarity_Scores.csv`` (per-query similarity; produce one
      with :func:`fiude_tpu.data.embedding.build_similarity_scores`).
    """
    code = _country_code(country)
    ili = pd.read_csv(
        os.path.join(root, f"ILI_rates_{code}_thursday_cubic_interpolation.csv"),
        index_col=0, parse_dates=True)
    qs = pd.read_csv(os.path.join(root, f"{code}_Qs_small_7day_avg.csv"),
                     index_col=0, parse_dates=True)
    qs = qs[~qs.index.duplicated(keep="first")].sort_index()
    qs = qs.rename(columns={q: q.replace("+", " ").replace(",", " ")
                            for q in qs.columns})
    qs = qs.rename(columns={q: " ".join(sorted(q.split(" ")))
                            for q in qs.columns})
    qs = qs.loc[:, ~qs.columns.duplicated()]
    qs = qs[~qs.isna().all(axis=1)]
    qs = qs.loc[:, qs.max(axis=0) != 0]

    comparison = pd.date_range(dt.date(data_season - 3, 1, 1),
                               dt.date(data_season, 1, 1))
    comparison = comparison.intersection(qs.index).intersection(ili.index)
    corr = qs.loc[comparison].corrwith(ili.loc[comparison, "wILI"])
    sim = pd.read_csv(os.path.join(root, f"{code}_Similarity_Scores.csv"),
                      index_col=0)
    corr = corr / corr.max()
    sim = sim / sim.max()
    rating = np.sqrt(np.square(corr)
                     + np.square(sim.loc[corr.index].iloc[:, 0]))
    selected = rating.sort_values(ascending=False).index

    common = np.sort(list(set(ili.index).intersection(qs.index)))
    return qs.loc[common, selected[:n_queries]]


def legacy_national_data(
    root: str = "Data/",
    *,
    country: str = "England",
    window: int = 12,
    gamma: int = 6,
    year: int = 2016,
    data_season: int = 2015,
    n_queries: int = 0,
    lag: int = 14,
    rescale: Optional[bool] = None,
) -> Tuple:
    """Weekly national windows (reference lib/Old/data.py:43-114).

    Returns ``(x_train, y_train, x_test, y_test, ili_max)`` — with
    ``n_queries > 0``, ``(x_train, y_train, x_test, y_test, q_train,
    q_test, ili_max)`` — all float32 numpy.  Window rows are weekly; x
    spans ``window`` lookback weeks, y additionally spans ``gamma``
    forecast weeks.
    """
    if year not in LEGACY_TEST_DATES:
        raise ValueError(f"no legacy season anchors for year {year}; "
                         f"options: {sorted(LEGACY_TEST_DATES)}")
    anchors = LEGACY_TEST_DATES[year]

    if country == "England":
        daily = pd.read_csv(
            os.path.join(root, "ILI_rates_UK_thursday_cubic_interpolation.csv"),
            index_col=0, parse_dates=True)
        n_days = len(daily) // 7 * 7
        ili = pd.DataFrame(
            index=daily.index.values[:n_days].reshape(-1, 7)[:, 0],
            columns=["weighted_ili"],
            data=daily.values[:n_days].reshape(-1, 7)[:, 0])
    else:
        raw = pd.read_csv(os.path.join(root, "national_flu.csv"),
                          index_col=-1, parse_dates=True)["weighted_ili"].iloc[300:]
        ili = pd.DataFrame(index=raw.index, columns=["weighted_ili"],
                           data=raw.values)
    ili.index = ili.index + dt.timedelta(days=3)
    ili_max = float(ili.values.max())
    if rescale:
        ili = ili / ili_max

    def windows(start, end, extra_weeks=0):
        out = []
        for date in pd.date_range(start, end, freq=dt.timedelta(weeks=1)):
            lo = pd.Timestamp(date - dt.timedelta(weeks=window))
            hi = pd.Timestamp(date + dt.timedelta(weeks=extra_weeks))
            out.append(ili.loc[lo:hi].values)
        return np.asarray(out, np.float32)

    x_tr = windows(anchors[0], anchors[1])
    x_te = windows(anchors[2], anchors[3])
    y_tr = windows(anchors[0], anchors[1], extra_weeks=gamma)
    y_te = windows(anchors[2], anchors[3], extra_weeks=gamma)
    if country != "England":
        # reference :93-95 trims the inclusive-slice extra row off the
        # training arrays (the US weekly index aligns with the anchors)
        x_tr = x_tr[:, :-1, :]
        y_tr = y_tr[:, :-1, :]

    if n_queries == 0:
        return x_tr, y_tr, x_te, y_te, ili_max

    qs = load_legacy_queries(root, data_season, country, n_queries=n_queries)
    qs = qs / np.tile(np.asarray(qs.max(axis=0)), (qs.shape[0], 1))
    qs = qs.loc[ili.index[0]: ili.index[-1]]

    def q_windows(start, end):
        out = []
        for date in pd.date_range(start, end, freq=dt.timedelta(weeks=1)):
            lo = pd.Timestamp(date - dt.timedelta(weeks=window))
            hi = pd.Timestamp(date + dt.timedelta(days=lag))
            out.append(qs.loc[lo:hi].values)
        return np.asarray(out, np.float32)

    q_tr = q_windows(anchors[0], anchors[1])
    q_te = q_windows(anchors[2], anchors[3])
    return x_tr, y_tr, x_te, y_te, q_tr, q_te, ili_max
