#!/usr/bin/env python
"""Summarize a results table into the reference's headline comparison:
mean test NLL / skill per region x model, averaged over seasons, horizons
and replicates (the SURVEY §6 / README table shape, computed the same way
the reference's committed ``results_table.csv`` was aggregated).

    python scripts/summarize_results.py results_table_server.csv
"""
import argparse
import os
import re
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NLL_COL = re.compile(r"^(\d{4}) (\d+)$")
SKILL_COL = re.compile(r"^skill (\d{4}) (\d+)$")


def summarize(df: pd.DataFrame) -> pd.DataFrame:
    nll_cols = [c for c in df.columns if NLL_COL.match(str(c))]
    skill_cols = [c for c in df.columns if SKILL_COL.match(str(c))]
    rows = []
    for (region, model), g in df.groupby(["region", "ode_name"]):
        rows.append({
            "region": region,
            "model": model,
            "runs": len(g),
            "mean_nll": float(np.nanmean(g[nll_cols].to_numpy(float))),
            "mean_skill": float(np.nanmean(g[skill_cols].to_numpy(float)))
            if skill_cols else float("nan"),
        })
    out = pd.DataFrame(rows).sort_values(["region", "mean_nll"])
    return out.reset_index(drop=True)


# Reference family orderings by committed mean test NLL over seasons and
# horizons, computed from /root/reference/results_table.csv (589 rows; the
# aggregation in BASELINE.md).  Used by --ordering to show, side by side,
# which families the reference ranks where at each region scale.
REFERENCE_MEAN_NLL = {
    "US":    {"CONN": 7.083, "UONN": 4.833, "SONN": 1.953, "CONNb": 9.799,
              "UONNb": 6.618, "SONNb": 1.293, "UONN_pre": 1.186},
    "hhs":   {"CONN": 1.348, "UONN": 1.702, "SONN": 1.401, "CONNb": 1.304,
              "UONNb": 1.687, "SONNb": 1.379},
    "state": {"CONN": 2.071, "UONN": 2.035, "SONN": 2.007, "CONNb": 2.210,
              "UONNb": 2.196, "SONNb": 2.105},
}


def family_ordering(df: pd.DataFrame) -> None:
    """Per-region family ordering by median season-mean NLL over runs,
    next to the reference's committed ordering (results_table.csv)."""
    nll_cols = [c for c in df.columns if NLL_COL.match(str(c))]
    print("| region | family | runs | median NLL | rank here | ref mean "
          "| rank upstream |")
    print("|---|---|---|---|---|---|---|")
    for region, g in df.groupby("region"):
        med = {}
        for model, gg in g.groupby("ode_name"):
            per_run = np.nanmean(gg[nll_cols].to_numpy(float), axis=1)
            med[model] = (float(np.nanmedian(per_run)), len(gg))
        here_rank = {m: i + 1 for i, m in
                     enumerate(sorted(med, key=lambda m: med[m][0]))}
        ref = REFERENCE_MEAN_NLL.get(str(region), {})
        ref_rank = {m: i + 1 for i, m in
                    enumerate(sorted((m for m in med if m in ref),
                                     key=lambda m: ref[m]))}
        for m in sorted(med, key=lambda m: med[m][0]):
            rv = f"{ref[m]:.2f}" if m in ref else "—"
            rr = str(ref_rank[m]) if m in ref_rank else "—"
            print(f"| {region} | {m} | {med[m][1]} | {med[m][0]:.2f} "
                  f"| {here_rank[m]} | {rv} | {rr} |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("--markdown", action="store_true",
                    help="print a GitHub markdown table")
    ap.add_argument("--ordering", action="store_true",
                    help="per-region family ordering (median NLL) vs the "
                         "reference's committed results_table.csv ordering")
    ap.add_argument("--windows", nargs="+", type=float, default=None,
                    help="restrict to these window_size values")
    ap.add_argument("--epochs", nargs="+", type=float, default=None,
                    help="restrict to these epoch budgets")
    args = ap.parse_args()
    df = pd.read_csv(args.csv, index_col=0)
    if args.windows is not None and "window_size" in df:
        df = df[df["window_size"].isin(args.windows)]
    if args.epochs is not None and "epochs" in df:
        df = df[df["epochs"].isin(args.epochs)]
    if args.ordering:
        family_ordering(df)
        return
    out = summarize(df)
    if args.markdown:
        print("| region | model | runs | mean NLL | mean skill |")
        print("|---|---|---|---|---|")
        for _, r in out.iterrows():
            print(f"| {r.region} | {r.model} | {int(r.runs)} "
                  f"| {r.mean_nll:.3f} | {r.mean_skill:.3f} |")
    else:
        print(out.to_string(index=False))


if __name__ == "__main__":
    main()
