"""ILI + search-query data pipeline (reference ``lib/regional_data_builder.py``).

Host-side pandas/scipy feature engineering — runs once per experiment, so it
stays on CPU by design; everything after :func:`DataConstructor.__call__` is
device arrays.  Full behavioral parity with the reference:

* weekly ILI -> daily via cubic interpolation (``:149-160``);
* per-state Google-query CSVs population-weighted into HHS regions
  (``:33-75``) with 7-day smoothing (``:15-19``);
* top-``n_queries`` selection per region by a combined Pearson-correlation +
  semantic-similarity distance score over the three seasons before the test
  season (``:83-120``);
* min-max normalization of queries and ILI; ``scaler = ili.max() * 13``
  (``:204,213-214``);
* sliding windows: inputs are ``window_size + lag`` days of
  [per-region queries | all-region ILI] with the trailing ``lag`` (=14) days
  of ILI masked to -1 (reporting delay), outputs are the ILI horizon, with
  ``run_backward`` including the lookback window (``:219-251``);
* train/test splits keyed by per-season dates from ``Dates.csv``
  (``:253-272``);
* ``fill_1`` mode: weekly-only targets, gaps filled with -1 so the masked
  NLL skips them (``testing_no_interpolation.py``).
"""

from __future__ import annotations

import datetime as dt
import os
from typing import Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from scipy import interpolate
from scipy.stats import pearsonr

from fiude_tpu.data.regions import (
    HHS_REGION_STATES, STATE_CODES, STATE_CODE_TO_NAME, STATE_NAMES,
)


def smooth(df: pd.DataFrame, n: int = 7) -> pd.DataFrame:
    """Trailing n-day moving average (reference :15-19)."""
    data = np.mean(np.asarray([df[i: -(n - i)] for i in range(n)]), 0)
    return pd.DataFrame(index=df.index[n:], columns=df.columns, data=data)


def get_state_query_data(num: int, root: str = "Data/",
                         append: str = "Queries/state_queries",
                         smooth_after: bool = False) -> pd.DataFrame:
    code = STATE_CODES[num - 1]
    df = pd.read_csv(os.path.join(root, append, f"{code}_query_data.csv"),
                     index_col=0, parse_dates=True)
    return smooth(df) if smooth_after else df


def get_hhs_query_data(num: int, root: str = "Data/",
                       append: str = "Queries/state_queries",
                       ignore: Sequence[str] = (),
                       smooth_after: bool = False) -> pd.DataFrame:
    """Population-weighted sum of member-state query series (reference :33-75)."""
    state_pop = pd.read_csv(
        os.path.join(root, "state_population_data_2019.csv"), index_col=0)
    members = HHS_REGION_STATES[num]
    total_pop = sum(state_pop[state_pop["CODE"] == c]["POP"].values[0]
                    for c in members)
    dfs = []
    for code in members:
        if code in ignore:
            continue
        w = state_pop[state_pop["CODE"] == code]["POP"].values[0] / total_pop
        df = w * pd.read_csv(os.path.join(root, append, f"{code}_query_data.csv"),
                             index_col=0, parse_dates=True)
        dfs.append(df)

    common_cols = dfs[0].columns
    for d in dfs[1:]:
        common_cols = common_cols.intersection(d.columns)
    common_idx = dfs[0].index
    for d in dfs[1:]:
        common_idx = common_idx.intersection(d.index)

    out = pd.DataFrame(index=common_idx, columns=common_cols, data=0.0)
    for d in dfs:
        out = out + d.loc[out.index, out.columns]
    return smooth(out) if smooth_after else out


def get_nat_query_data(num: int, root: str = "Data/",
                       smooth_after: bool = False) -> pd.DataFrame:
    return pd.read_csv(
        os.path.join(root, "Queries", "US_query_data_all_smoothed.csv"),
        index_col=0, parse_dates=True)


def choose_qs(qs_data_dict, daily_ili: pd.DataFrame, region_num: int,
              season: int, n_qs: int, region: str = "hhs",
              root: str = "Data/") -> pd.Index:
    """Top-n query selection by correlation+similarity distance (reference :83-120)."""
    queries = qs_data_dict[region_num]
    if region == "US":
        ili = daily_ili["weighted_ili"]
    elif region == "hhs":
        ili = daily_ili["Region " + str(region_num)]
    else:
        ili = daily_ili[STATE_NAMES[region_num - 1]]

    index = daily_ili.index.intersection(queries.index)
    queries = queries.loc[index]
    ili = ili.loc[index]

    dates = pd.date_range(dt.date(season - 3, 10, 3), dt.date(season, 10, 1))
    dates = dates.intersection(queries.index)

    q_sub = queries.loc[dates].std()
    queries = queries.iloc[:, np.where(q_sub != 0)[0]]

    corr = pd.DataFrame(
        index=queries.columns, columns=["correlation"],
        data=[pearsonr(ili.loc[dates].squeeze(), q)[0]
              for q in queries.loc[dates].values.T])
    scores = pd.read_csv(os.path.join(root, "Similarity_Scores.csv"),
                         index_col=0)
    scores["correlation"] = corr
    scores = scores.dropna()
    for col in scores.columns:
        scores[col] = scores[col] - scores[col].min()
        denom = scores[col].max()
        scores[col] = scores[col] / (denom if denom != 0 else 1.0)
        scores[col] = 1 - scores[col]
    scores["score"] = np.sqrt(np.square(scores).sum(axis=1))
    scores = scores.sort_values("score")
    return scores[:n_qs].index


def load_ili(location: str, root: str = "Data/") -> pd.DataFrame:
    """Load weekly ILI tables (reference :122-147)."""
    paths = {"US": "national_flu.csv", "England": "England_ILIrates.csv",
             "state": "state_flu.csv", "hhs": "hhs_flu.csv"}
    ili = pd.read_csv(os.path.join(root, paths[location]), index_col=-1,
                      parse_dates=True)
    if location in ("state", "hhs"):
        wide = pd.DataFrame()
        for region in ili["region"].unique():
            wide[region] = ili[ili["region"] == region]["unweighted_ili"]
        ili = wide / 13.0
        ili = ili.fillna(0)
    elif location == "US":
        ili = ili[["weighted_ili"]] / 13.0
    elif location == "England":
        ili["Date"] = [dt.datetime.strptime(d, "%d/%m/%Y") + dt.timedelta(days=3)
                       for d in ili["ISOWeekStartDate"].values]
        ili = ili[["Date", "RatePer100000"]].set_index("Date")
        ili = ili.rename(columns={"RatePer100000": "National"})
    return ili


def interpolate_ili(ili: pd.DataFrame, fill_1: bool = False) -> pd.DataFrame:
    """Weekly -> daily cubic interpolation; ``fill_1`` keeps weekly values on
    a daily index leaving gaps as-is (reference :149-160)."""
    dates = np.asarray([ili.index[0] + dt.timedelta(days=i)
                        for i in range((ili.index[-1] - ili.index[0]).days + 1)])
    if fill_1:
        out = pd.DataFrame(index=dates, columns=ili.columns, dtype=float)
        out.loc[ili.index] = ili.values
        return out
    x = np.linspace(0, 1, ili.shape[0])
    x2 = np.linspace(0, 1, dates.shape[0])
    f = interpolate.interp1d(x, ili.values, axis=0, kind="cubic")
    return pd.DataFrame(index=dates, columns=ili.columns, data=f(x2))


class DataConstructor:
    """End-to-end dataset builder (reference :162-274).

    ``__call__(run_backward, no_qs_in_output)`` returns
    ``(x_train, y_train, x_test, y_test, scaler)`` as numpy arrays/Series.
    """

    def __init__(self, test_season: int, region: str = "hhs",
                 n_queries: int = 10, gamma: int = 28, window_size: int = 28,
                 lag: int = 14, fill_1: bool = False, root: str = "Data/",
                 ignore: Sequence[str] = ("VI", "PR")):
        if region == "England":
            # the reference's regional DataConstructor has no England path
            # either; its England pipeline is lib/Old/data.py:43-114
            raise ValueError(
                "region='England' is not a regional pipeline; use "
                "fiude_tpu.data.legacy.legacy_national_data(country='England')")
        self.test_season = test_season
        self.region = region
        self.n_queries = n_queries
        self.gamma = gamma
        self.window_size = window_size
        self.lag = lag
        self.fill_1 = fill_1
        self.root = root
        self.ignore = list(ignore)
        self.n_regions = {"hhs": 10, "state": 49}.get(region, 1)

    def __call__(self, run_backward: bool = False,
                 no_qs_in_output: bool = False):
        root = self.root
        ili = interpolate_ili(load_ili(self.region, root), fill_1=False)

        qs_data = {}
        for i in range(1, 1 + self.n_regions):
            if self.region == "US":
                qs_data[i] = get_nat_query_data(i, root)
            elif self.region == "hhs":
                qs_data[i] = get_hhs_query_data(i, root, ignore=self.ignore,
                                                smooth_after=True)
            else:
                qs_data[i] = get_state_query_data(i, root, smooth_after=True)
            names = choose_qs(qs_data, ili, i, self.test_season - 1,
                              self.n_queries, region=self.region, root=root)
            qs_data[i] = qs_data[i].loc[:, list(names)]
            qs_data[i] = qs_data[i].div(qs_data[i].max())

        ili = interpolate_ili(load_ili(self.region, root), fill_1=self.fill_1)
        ili = ili.loc[qs_data[i].index[0]: qs_data[i].index[-1]]
        if self.region == "state":
            ili = ili[[STATE_CODE_TO_NAME[c] for c in STATE_CODES]]

        scaler = ili.max() * 13.0
        ili = ili.div(np.nanmax(ili, axis=0))
        if self.fill_1:
            ili = ili.fillna(-1)

        inputs, outputs, dates = [], [], []
        for b in range(self.window_size + 1, ili.shape[0] - self.gamma):
            w_lo, w_hi = b - self.window_size - 1, b + self.lag - 1
            batch_in = [qs_data[i].iloc[w_lo:w_hi]
                        for i in range(1, 1 + self.n_regions)]
            t_ili = ili.iloc[w_lo:w_hi].copy()
            t_ili.iloc[-self.lag:, :] = -1
            batch_in.append(t_ili)
            batch_in = np.concatenate(batch_in, -1)

            batch_out = []
            for i in range(1, 1 + self.n_regions):
                if run_backward:
                    batch_out.append(qs_data[i].iloc[w_lo: b + self.gamma])
                    t_ili = ili.iloc[w_lo: b + self.gamma].copy()
                else:
                    batch_out.append(qs_data[i].iloc[b: b + self.gamma])
                    t_ili = ili.iloc[b: b + self.gamma].copy()
            batch_out.append(t_ili)
            batch_out = np.concatenate(batch_out, -1)
            if no_qs_in_output:
                batch_out = batch_out[..., -self.n_regions:]

            dates.append((t_ili.index[0] - dt.timedelta(days=1)).to_pydatetime())
            inputs.append(batch_in)
            outputs.append(batch_out)

        split = pd.read_csv(os.path.join(root, "Dates.csv"),
                            index_col=0).loc[self.test_season]
        parse = lambda s: dt.datetime.strptime(s, "%Y-%m-%d")
        try:
            train_start = np.where([parse(split["train_start"]) == d
                                    for d in dates])[0][0]
        except IndexError:
            train_start = 0
        train_end = np.where([parse(split["train_end"]) == d for d in dates])[0][0]
        test_start = np.where([parse(split["test_start"]) == d for d in dates])[0][0]
        test_end = np.where([parse(split["test_end"]) == d for d in dates])[0][0]

        x_train = np.asarray(inputs[train_start:train_end], np.float32)
        y_train = np.asarray(outputs[train_start:train_end], np.float32)
        x_test = np.asarray(inputs[test_start:test_end], np.float32)
        y_test = np.asarray(outputs[test_start:test_end], np.float32)
        return x_train, y_train, x_test, y_test, scaler
