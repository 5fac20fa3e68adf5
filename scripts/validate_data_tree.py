#!/usr/bin/env python
"""Validate a real ``Data/`` tree against the exact schemas the pipeline
reads, with actionable errors.

The reference gitignores its ``Data/`` directory, so the loader contract
(reference ``lib/regional_data_builder.py:21-147``; mirrored by
:mod:`fiude_tpu.data.builder`) exists only in code.  This CLI checks an
arbitrary tree BEFORE a multi-hour sweep consumes it: file set, columns,
index dtypes, date parseability, region completeness, and the
cross-file joins (query columns vs ``Similarity_Scores.csv``, Dates.csv
splits vs the ILI span) that otherwise fail deep inside pandas with an
inscrutable KeyError.

Usage:
    python scripts/validate_data_tree.py /path/to/Data \
        [--regions US hhs state] [--seasons 2016 2017] [--deep]

``--deep`` additionally runs :class:`fiude_tpu.data.builder.DataConstructor`
end-to-end per (region, season) and reports output shapes.

Exit status: 0 iff every check passes.
"""
from __future__ import annotations

import argparse
import datetime as dt
import os
import sys
from typing import Callable, List, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from fiude_tpu.data.regions import (  # noqa: E402
    HHS_REGION_STATES, STATE_CODE_TO_NAME, STATE_CODES, STATE_NAMES,
)

IGNORE = ("VI", "PR")  # territories the HHS weighting skips (builder.py:182)

Check = Tuple[str, bool, str]  # (name, ok, message)


def _read_csv(root: str, rel: str, errors: List[str], **kw):
    path = os.path.join(root, rel)
    if not os.path.exists(path):
        errors.append(f"{rel}: MISSING (expected at {path})")
        return None
    try:
        return pd.read_csv(path, **kw)
    except Exception as e:
        errors.append(f"{rel}: unreadable as CSV ({type(e).__name__}: {e})")
        return None


def check_dates(root: str, seasons=None) -> List[str]:
    """``Dates.csv``: season-indexed train/test split dates
    (reference :253-267 reads ``.loc[test_season]`` and strptime
    ``%Y-%m-%d`` on four columns)."""
    errors: List[str] = []
    df = _read_csv(root, "Dates.csv", errors, index_col=0)
    if df is None:
        return errors
    required = ["train_start", "train_end", "test_start", "test_end"]
    missing = [c for c in required if c not in df.columns]
    if missing:
        errors.append(f"Dates.csv: missing columns {missing} "
                      f"(has {list(df.columns)})")
        return errors
    if not np.issubdtype(df.index.dtype, np.integer):
        errors.append(f"Dates.csv: index (season) must be integral years, "
                      f"got dtype {df.index.dtype}")
    rows = df.loc[list(seasons)] if seasons else df
    if seasons:
        absent = [s for s in seasons if s not in df.index]
        if absent:
            return errors + [f"Dates.csv: requested seasons {absent} not in "
                             f"index {list(df.index)}"]
    for season, row in rows.iterrows():
        parsed = {}
        for col in required:
            try:
                parsed[col] = dt.datetime.strptime(str(row[col]), "%Y-%m-%d")
            except ValueError as e:
                errors.append(f"Dates.csv season {season}: {col}="
                              f"{row[col]!r} does not parse as %Y-%m-%d ({e})")
        if len(parsed) == len(required):
            if not (parsed["train_start"] < parsed["train_end"]
                    <= parsed["test_start"] < parsed["test_end"]):
                errors.append(
                    f"Dates.csv season {season}: dates must be ordered "
                    "train_start < train_end <= test_start < test_end, got "
                    + ", ".join(f"{c}={row[c]}" for c in required))
    return errors


def _check_weekly_index(rel: str, idx, errors: List[str]):
    if not isinstance(idx, pd.DatetimeIndex):
        errors.append(f"{rel}: date index did not parse as datetimes "
                      f"(dtype {idx.dtype}) — dates must be ISO-like in the "
                      "last column")
        return
    if not idx.is_monotonic_increasing:
        errors.append(f"{rel}: date index is not sorted ascending")
    gaps = np.diff(idx.values).astype("timedelta64[D]").astype(int)
    if len(gaps) and not np.all(gaps == 7):
        bad = int(np.sum(gaps != 7))
        errors.append(f"{rel}: expected weekly (7-day) spacing; {bad} of "
                      f"{len(gaps)} gaps differ (first bad gap "
                      f"{gaps[gaps != 7][0]}d) — the cubic weekly->daily "
                      "interpolation assumes an even weekly grid")


def check_national_flu(root: str) -> List[str]:
    """``national_flu.csv``: weekly US ILI with ``weighted_ili``
    (reference :128, :147-148 reads index_col=-1, parse_dates)."""
    errors: List[str] = []
    df = _read_csv(root, "national_flu.csv", errors, index_col=-1,
                   parse_dates=True)
    if df is None:
        return errors
    if "weighted_ili" not in df.columns:
        errors.append(f"national_flu.csv: missing 'weighted_ili' column "
                      f"(has {list(df.columns)})")
        return errors
    if not np.issubdtype(df["weighted_ili"].dtype, np.number):
        errors.append("national_flu.csv: 'weighted_ili' is not numeric "
                      f"(dtype {df['weighted_ili'].dtype})")
    _check_weekly_index("national_flu.csv", df.index, errors)
    return errors


def check_long_flu(root: str, region: str) -> List[str]:
    """``hhs_flu.csv`` / ``state_flu.csv``: long format
    (region, unweighted_ili, date-as-last-column) — reference :129-135
    pivots on ``region`` and reads ``unweighted_ili``."""
    rel = f"{region}_flu.csv"
    errors: List[str] = []
    df = _read_csv(root, rel, errors, index_col=-1, parse_dates=True)
    if df is None:
        return errors
    for col in ("region", "unweighted_ili"):
        if col not in df.columns:
            errors.append(f"{rel}: missing '{col}' column "
                          f"(has {list(df.columns)})")
    if errors:
        return errors
    if not np.issubdtype(df["unweighted_ili"].dtype, np.number):
        errors.append(f"{rel}: 'unweighted_ili' is not numeric "
                      f"(dtype {df['unweighted_ili'].dtype})")
    have = set(df["region"].unique())
    want = ({f"Region {i}" for i in range(1, 11)} if region == "hhs"
            else set(STATE_NAMES))
    missing = sorted(want - have)
    if missing:
        errors.append(f"{rel}: missing region series {missing[:5]}"
                      f"{' …' if len(missing) > 5 else ''} "
                      f"({len(missing)} of {len(want)})")
    for r in sorted(have & want)[:3]:  # spot-check weekly spacing
        _check_weekly_index(f"{rel}[{r}]", df[df['region'] == r].index,
                            errors)
    return errors


def check_population(root: str, needed_codes) -> List[str]:
    """``state_population_data_2019.csv``: CODE/POP (reference :34,49-53)."""
    errors: List[str] = []
    df = _read_csv(root, "state_population_data_2019.csv", errors,
                   index_col=0)
    if df is None:
        return errors
    for col in ("CODE", "POP"):
        if col not in df.columns:
            errors.append(f"state_population_data_2019.csv: missing '{col}' "
                          f"column (has {list(df.columns)})")
    if errors:
        return errors
    if not np.issubdtype(df["POP"].dtype, np.number):
        errors.append("state_population_data_2019.csv: 'POP' is not numeric")
    elif (df["POP"] <= 0).any():
        errors.append("state_population_data_2019.csv: non-positive POP "
                      "values — population weights would divide by zero")
    have = set(df["CODE"])
    missing = sorted(set(needed_codes) - have)
    if missing:
        errors.append(f"state_population_data_2019.csv: missing CODE rows "
                      f"for {missing} — HHS population weighting needs every "
                      "member state")
    return errors


def _check_query_file(root: str, rel: str, errors: List[str]):
    df = _read_csv(root, rel, errors, index_col=0, parse_dates=True)
    if df is None:
        return None
    if not isinstance(df.index, pd.DatetimeIndex):
        errors.append(f"{rel}: index did not parse as dates "
                      f"(dtype {df.index.dtype})")
        return df
    if df.shape[1] == 0:
        errors.append(f"{rel}: no query columns")
    non_num = [c for c in df.columns
               if not np.issubdtype(df[c].dtype, np.number)]
    if non_num:
        errors.append(f"{rel}: non-numeric query columns {non_num[:5]}")
    if len(df) < 8:
        errors.append(f"{rel}: only {len(df)} rows — the 7-day smoother "
                      "(builder.smooth) consumes the first 7")
    return df


def check_queries(root: str, regions) -> List[str]:
    """Query CSVs + the ``Similarity_Scores.csv`` join (reference
    :33-75,83-120): every member-state file must exist, parse with a date
    index, and share column names with the similarity table."""
    errors: List[str] = []
    scores = _read_csv(root, "Similarity_Scores.csv", errors, index_col=0)

    all_query_cols: set = set()
    if "US" in regions:
        df = _check_query_file(
            root, os.path.join("Queries", "US_query_data_all_smoothed.csv"),
            errors)
        if df is not None:
            all_query_cols |= set(df.columns)
    state_codes_needed = set()
    if "hhs" in regions:
        for codes in HHS_REGION_STATES.values():
            state_codes_needed |= {c for c in codes if c not in IGNORE}
    if "state" in regions:
        state_codes_needed |= set(STATE_CODES)
    per_region_cols = {}
    for code in sorted(state_codes_needed):
        df = _check_query_file(
            root,
            os.path.join("Queries", "state_queries",
                         f"{code}_query_data.csv"),
            errors)
        if df is not None:
            per_region_cols[code] = set(df.columns)
            all_query_cols |= set(df.columns)

    # HHS aggregation intersects member columns (builder.py:75-81)
    if "hhs" in regions and per_region_cols:
        for num, codes in HHS_REGION_STATES.items():
            cols = [per_region_cols[c] for c in codes
                    if c in per_region_cols]
            if cols and not set.intersection(*cols):
                errors.append(
                    f"Queries: HHS Region {num} member states share NO "
                    "common query columns — the population-weighted "
                    "aggregate would be empty")

    if scores is not None and all_query_cols:
        overlap = all_query_cols & set(scores.index)
        if not overlap:
            errors.append(
                "Similarity_Scores.csv: its index shares no names with any "
                "query column — choose_qs would drop every query (scores "
                f"index head: {list(scores.index[:3])}, query cols head: "
                f"{sorted(all_query_cols)[:3]})")
        num_cols = [c for c in (scores.columns if scores is not None else [])
                    if not np.issubdtype(scores[c].dtype, np.number)]
        if num_cols:
            errors.append(f"Similarity_Scores.csv: non-numeric score "
                          f"columns {num_cols}")
    return errors


def check_span(root: str, regions, seasons=None) -> List[str]:
    """Cross-file: every requested season's split dates must fall inside
    both the ILI span and the query span (otherwise the windowing loop
    produces no matching date and the np.where split lookup IndexErrors,
    reference :253-267)."""
    errors: List[str] = []
    try:
        dates = pd.read_csv(os.path.join(root, "Dates.csv"), index_col=0)
    except Exception:
        return []  # already reported by check_dates
    spans = {}
    for region in regions:
        rel = {"US": "national_flu.csv", "hhs": "hhs_flu.csv",
               "state": "state_flu.csv"}[region]
        try:
            df = pd.read_csv(os.path.join(root, rel), index_col=-1,
                             parse_dates=True)
            spans[region] = (df.index.min(), df.index.max())
        except Exception:
            continue
    rows = dates.loc[list(seasons)] if seasons else dates
    for season, row in rows.iterrows():
        try:
            lo = dt.datetime.strptime(str(row["train_start"]), "%Y-%m-%d")
            hi = dt.datetime.strptime(str(row["test_end"]), "%Y-%m-%d")
        except Exception:
            continue  # already reported by check_dates
        for region, (smin, smax) in spans.items():
            if lo < smin or hi > smax:
                errors.append(
                    f"Dates.csv season {season} [{row['train_start']} … "
                    f"{row['test_end']}] falls outside the {region} ILI "
                    f"span [{smin.date()} … {smax.date()}] — the split "
                    "lookup would IndexError")
    return errors


def check_deep(root: str, regions, seasons) -> List[str]:
    """End-to-end: run the real DataConstructor on a small window."""
    from fiude_tpu.data.builder import DataConstructor
    errors: List[str] = []
    for region in regions:
        for season in seasons:
            try:
                dc = DataConstructor(
                    test_season=season, region=region, n_queries=3,
                    gamma=14, window_size=7,
                    root=root if root.endswith(os.sep) else root + os.sep)
                x_tr, y_tr, x_te, y_te, scaler = dc(run_backward=True,
                                                    no_qs_in_output=True)
                if 0 in (*x_tr.shape, *x_te.shape):
                    errors.append(f"deep {region}/{season}: empty split "
                                  f"(x_train {x_tr.shape}, x_test "
                                  f"{x_te.shape})")
                else:
                    print(f"  deep {region}/{season}: x_train {x_tr.shape} "
                          f"x_test {x_te.shape} OK")
            except Exception as e:
                errors.append(f"deep {region}/{season}: DataConstructor "
                              f"raised {type(e).__name__}: {e}")
    return errors


def validate_tree(root: str, regions=("US", "hhs", "state"), seasons=None,
                  deep: bool = False) -> List[Check]:
    """Run every applicable check; returns (name, ok, message) rows."""
    regions = list(regions)
    needed_codes = set()
    if "hhs" in regions:
        for codes in HHS_REGION_STATES.values():
            needed_codes |= {c for c in codes if c not in IGNORE}
    checks: List[Tuple[str, Callable[[], List[str]]]] = [
        ("Dates.csv", lambda: check_dates(root, seasons)),
    ]
    if "US" in regions:
        checks.append(("national_flu.csv", lambda: check_national_flu(root)))
    if "hhs" in regions:
        checks.append(("hhs_flu.csv", lambda: check_long_flu(root, "hhs")))
        checks.append(("population",
                       lambda: check_population(root, needed_codes)))
    if "state" in regions:
        checks.append(("state_flu.csv",
                       lambda: check_long_flu(root, "state")))
    checks.append(("queries+similarity", lambda: check_queries(root, regions)))
    checks.append(("season spans", lambda: check_span(root, regions, seasons)))
    if deep:
        deep_seasons = seasons
        if not deep_seasons:
            try:
                deep_seasons = [int(pd.read_csv(
                    os.path.join(root, "Dates.csv"), index_col=0).index[0])]
            except Exception:
                deep_seasons = []
        checks.append(("deep (DataConstructor)",
                       lambda: check_deep(root, regions, deep_seasons or [])))

    results: List[Check] = []
    for name, fn in checks:
        try:
            errs = fn()
        except Exception as e:  # a check itself must never crash the CLI
            errs = [f"{name}: check crashed: {type(e).__name__}: {e}"]
        if errs:
            results.extend((name, False, e) for e in errs)
        else:
            results.append((name, True, "OK"))
    return results


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("root", help="path to the Data/ directory")
    ap.add_argument("--regions", nargs="+", default=["US", "hhs", "state"],
                    choices=["US", "hhs", "state"])
    ap.add_argument("--seasons", nargs="+", type=int, default=None,
                    help="restrict Dates.csv/span checks to these seasons")
    ap.add_argument("--deep", action="store_true",
                    help="also run DataConstructor end-to-end per "
                         "(region, season)")
    args = ap.parse_args()

    if not os.path.isdir(args.root):
        print(f"FAIL: {args.root} is not a directory")
        return 1
    results = validate_tree(args.root, regions=args.regions,
                            seasons=args.seasons, deep=args.deep)
    n_fail = 0
    for name, ok, msg in results:
        if ok:
            print(f"  OK  {name}")
        else:
            n_fail += 1
            print(f"FAIL  {name}: {msg}")
    print(f"{len(results) - n_fail}/{len(results)} checks passed"
          + (f", {n_fail} FAILED" if n_fail else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
