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
    ap.add_argument("--extend", action="store_true",
                    help="append only combos not already in --out, keeping "
                         "existing rows (and their started/score) intact; "
                         "takes the same file lock the workers use")
    args = ap.parse_args()

    keys = ["latent_dim", "hidden_size", "window_size", "batch_size",
            "n_samples", "epochs"]
    rows = [
        dict(latent_dim=ld, hidden_size=h, window_size=w, batch_size=b,
             n_samples=s, epochs=e, started=0, score=10.0)
        for ld, h, w, b, s, e in itertools.product(
            args.latent_dims, args.hidden_sizes, args.window_sizes,
            args.batch_sizes, args.n_samples, args.epochs)
    ]
    if args.extend and os.path.exists(args.out):
        from filelock import FileLock
        with FileLock(args.out + ".lock"):
            old = pd.read_csv(args.out, index_col=0)
            have = set(map(tuple, old[keys].astype(int).values.tolist()))
            new = [r for r in rows
                   if tuple(int(r[k]) for k in keys) not in have]
            df = pd.concat([old, pd.DataFrame(new)], ignore_index=True)
            from fiude_tpu.utils.results import atomic_to_csv
            atomic_to_csv(df, args.out)
        print(f"extended {args.out}: {len(old)} existing + {len(new)} new "
              f"= {len(df)} rows")
        return
    pd.DataFrame(rows).to_csv(args.out)
    print(f"wrote {len(rows)} rows to {args.out}")


if __name__ == "__main__":
    main()
