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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("--markdown", action="store_true",
                    help="print a GitHub markdown table")
    args = ap.parse_args()
    df = pd.read_csv(args.csv, index_col=0)
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
