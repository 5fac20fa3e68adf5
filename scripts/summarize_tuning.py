"""Summarize a tuning-sweep CSV (the ``validation_scores``-shaped artifact,
reference ``tuning/validation_scores.csv``): progress, score distribution,
top-N configs, and per-hyperparameter marginals (median score by value).

Markdown to stdout — paste into docs/TUNING.md.

Usage: python scripts/summarize_tuning.py [docs/validation_scores_synth.csv]
       [--top 10] [--fail-score 10]
"""
from __future__ import annotations

import argparse

import numpy as np
import pandas as pd

BOOK_COLS = ("started", "score")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("csv", nargs="?", default="docs/validation_scores_synth.csv")
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--fail-score", type=float, default=10.0,
                    help="sentinel written for crashed rows "
                         "(reference tune_node.py:255)")
    args = ap.parse_args()

    df = pd.read_csv(args.csv, index_col=0)
    hp_cols = [c for c in df.columns if c not in BOOK_COLS]
    scored = df[(df["started"] == 1) & (df["score"] != args.fail_score)]
    crashed = df[(df["started"] == 1) & (df["score"] == args.fail_score)]
    pending = df[df["started"] == 0]

    print(f"## Tuning sweep: {args.csv}\n")
    print(f"- grid: **{len(df)}** rows over {hp_cols}")
    print(f"- scored: **{len(scored)}**, crashed/sentinel: {len(crashed)}, "
          f"pending: {len(pending)}")
    if len(scored) == 0:
        return
    q = scored["score"].quantile([0.0, 0.25, 0.5, 0.75, 1.0])
    print(f"- validation NLL: best {q[0.0]:.3f} / q25 {q[0.25]:.3f} / "
          f"median {q[0.5]:.3f} / q75 {q[0.75]:.3f} / worst {q[1.0]:.3f}\n")

    print(f"### Top {args.top} configs (validation NLL)\n")
    top = scored.sort_values("score").head(args.top)
    print("| rank | " + " | ".join(hp_cols) + " | score |")
    print("|" + "---|" * (len(hp_cols) + 2))
    def _fmt(v):
        try:
            f = float(v)
        except (TypeError, ValueError):
            return str(v)  # non-numeric provenance columns (e.g. platform)
        return str(int(f)) if f.is_integer() else str(v)

    for rank, (_, row) in enumerate(top.iterrows(), 1):
        vals = " | ".join(_fmt(row[c]) for c in hp_cols)
        print(f"| {rank} | {vals} | {row['score']:.3f} |")

    print("\n### Marginals (median score by hyperparameter value)\n")
    for col in hp_cols:
        if scored[col].nunique() < 2:
            continue
        med = scored.groupby(col)["score"].agg(["median", "count"])
        parts = [f"{v}: {m:.2f} (n={int(n)})"
                 for v, (m, n) in med.iterrows()]
        print(f"- **{col}** — " + "; ".join(parts))


if __name__ == "__main__":
    main()
