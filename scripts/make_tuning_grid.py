#!/usr/bin/env python
"""Generate a tuning-grid CSV (reference ``tuning/tuning_file_maker.ipynb``):
cartesian product of hyperparameters with ``started``/``score`` bookkeeping
columns, consumed row-wise by scripts/tune_worker.py."""
import argparse
import itertools
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="validation_scores.csv")
    ap.add_argument("--latent-dims", nargs="+", type=int, default=[6, 8])
    ap.add_argument("--hidden-sizes", nargs="+", type=int, default=[32, 64, 128])
    ap.add_argument("--window-sizes", nargs="+", type=int, default=[14, 28, 42])
    ap.add_argument("--batch-sizes", nargs="+", type=int, default=[32])
    ap.add_argument("--n-samples", nargs="+", type=int, default=[32])
    ap.add_argument("--epochs", nargs="+", type=int, default=[50])
    args = ap.parse_args()

    rows = [
        dict(latent_dim=ld, hidden_size=h, window_size=w, batch_size=b,
             n_samples=s, epochs=e, started=0, score=10.0)
        for ld, h, w, b, s, e in itertools.product(
            args.latent_dims, args.hidden_sizes, args.window_sizes,
            args.batch_sizes, args.n_samples, args.epochs)
    ]
    pd.DataFrame(rows).to_csv(args.out)
    print(f"wrote {len(rows)} rows to {args.out}")


if __name__ == "__main__":
    main()
