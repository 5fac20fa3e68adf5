"""Render docs/head_to_head.csv as a torch-vs-fiude comparison table.

One output row per (region, ode_name, season, num) cell with both
frameworks' per-horizon NLL, mean skill, and wall-clock, plus a verdict
column (which framework wins mean NLL).  Markdown to stdout — paste into
docs/RESULTS_SYNTH.md.

Usage: python scripts/summarize_h2h.py [docs/head_to_head] [--agg]
  --agg also prints a per-(region, ode) aggregate over seeds.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd

# deltas below this are seed noise, not a mechanics difference: call them a
# tie in both per-cell verdicts and aggregates rather than crediting a side
TIE_EPS = 0.05


def load(path: str) -> tuple[pd.DataFrame, list[str]]:
    if path.endswith(".csv"):        # accept both the prefix and the file
        path = path[: -len(".csv")]
    df = pd.read_csv(path + ".csv", index_col=0)
    nll_cols = [c for c in df.columns
                if c.split()[0].isdigit() and not c.startswith("skill")]
    skill_cols = [c for c in df.columns if c.startswith("skill")]
    df["mean_nll"] = df[nll_cols].mean(axis=1)
    df["mean_skill"] = df[skill_cols].mean(axis=1)
    return df, nll_cols


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "docs/head_to_head"
    df, nll_cols = load(path)
    keys = ["region", "ode_name", "test_season", "num"]

    # NLL columns are named "<season> <window+g-1>"; the matching skill
    # columns carry the true horizon in days ("skill <season> <g>")
    skill_cols = [c for c in df.columns if c.startswith("skill")]
    horizons = [c.split()[2] for c in skill_cols] or \
        [c.split()[1] for c in nll_cols]
    print("| region | model | num | side | NLL @" +
          "d / @".join(horizons) + "d | mean NLL | mean skill | train s "
          "| steady s |")
    print("|" + "---|" * 9)
    for key, cell in df.groupby(keys, sort=True):
        region, ode, season, num = key
        for _, row in cell.sort_values("framework").iterrows():
            nlls = " / ".join(f"{row[c]:.2f}" for c in nll_cols)
            steady = row.get("train_seconds_steady", np.nan)
            steady_s = (f"{steady:.0f} ({row.get('steady_platform', '')})"
                        if np.isfinite(steady) else "")
            print(f"| {region} | {ode} | {int(num)} | {row['framework']} | "
                  f"{nlls} | {row['mean_nll']:.2f} | "
                  f"{row['mean_skill']:.3f} | {row['train_seconds']:.0f} "
                  f"| {steady_s} |")
        if set(cell["framework"]) == {"torch", "fiude"}:
            t = cell[cell.framework == "torch"]["mean_nll"].iloc[0]
            f = cell[cell.framework == "fiude"]["mean_nll"].iloc[0]
            if abs(t - f) < TIE_EPS:
                print(f"| | | | **-> tie** (ΔNLL {t - f:+.2f}) "
                      f"| | | | | |")
            else:
                win = "fiude" if f < t else "torch"
                print(f"| | | | **-> {win} wins** (ΔNLL {t - f:+.2f}) "
                      f"| | | | | |")

    if "--agg" in sys.argv:
        # diverged replicates (e.g. the torch US CONN num=2 row with NLL in
        # the hundreds) would dominate a mean ± std and distort the verdict;
        # aggregate with the median and flag how many cells were diverged
        DIVERGED_NLL = 50.0
        print("\n### Aggregate over seeds (median of per-seed mean NLL; "
              f"cells with mean NLL > {DIVERGED_NLL:.0f} counted as "
              "diverged)\n")
        print("| region | model | torch | fiude | verdict (median NLL) |")
        print("|---|---|---|---|---|")
        for (region, ode), cell in df.groupby(["region", "ode_name"]):
            vals, meds = {}, {}
            for side in ("torch", "fiude"):
                v = cell[cell.framework == side]["mean_nll"]
                v = v[np.isfinite(v)]
                bad = int((v > DIVERGED_NLL).sum())
                ok = v[v <= DIVERGED_NLL]
                meds[side] = ok.median() if len(ok) else np.nan
                tag = f" + {bad} diverged" if bad else ""
                vals[side] = (f"{meds[side]:.2f} (n={len(ok)}{tag})"
                              if len(ok) else
                              (f"all {bad} diverged" if bad else "—"))
            t, f = meds["torch"], meds["fiude"]
            verdict = ("—" if np.isnan(t) or np.isnan(f)
                       else ("tie" if abs(t - f) < TIE_EPS
                             else ("fiude" if f < t else "torch")))
            print(f"| {region} | {ode} | {vals['torch']} | {vals['fiude']} |"
                  f" {verdict} |")

        # the filtered median can be asymmetric (a diverged torch seed is
        # dropped while a bad-but-convergent fiude seed still counts), so
        # also report the paired per-seed record: for every seed both stacks
        # ran, which side's mean NLL was lower (ties below TIE_EPS)
        print("\n### Paired per-seed record (same seed, both stacks; "
              f"tie when |Δ| < {TIE_EPS})\n")
        print("| region | model | fiude wins | ties | torch wins |")
        print("|---|---|---|---|---|")
        for (region, ode), cell in df.groupby(["region", "ode_name"]):
            w = {"fiude": 0, "tie": 0, "torch": 0}
            for _, seed_cell in cell.groupby("num"):
                sides = seed_cell.set_index("framework")["mean_nll"]
                if {"torch", "fiude"} <= set(sides.index):
                    d = sides["torch"] - sides["fiude"]
                    w["tie" if abs(d) < TIE_EPS
                      else ("fiude" if d > 0 else "torch")] += 1
            print(f"| {region} | {ode} | {w['fiude']} | {w['tie']} "
                  f"| {w['torch']} |")


if __name__ == "__main__":
    main()
