#!/usr/bin/env python
"""Main sweep driver (reference ``run_ode.py`` re-designed).

Runs the region x epochs x window x gamma x num x season x model grid with
the growing-horizon curriculum, a crash-resumable ledger and file-locked
results tables.  Works against a real ``Data/`` tree or ``--synthetic``.

Examples:
    python scripts/run_sweep.py --synthetic --regions US --nums 1 2 \
        --seasons 2016 --epochs 24 --windows 7 --gammas 28
    python scripts/run_sweep.py --data-root Data/ --out results_table_server
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fiude_tpu.train.experiment import run_experiment
from fiude_tpu.parallel.sweep import run_work_queue
from fiude_tpu.utils.config import grid
from fiude_tpu.utils.ledger import Ledger


def filter_done(configs, csv_path):
    """Drop configs whose (row, season) NLL cell is already filled.

    A config's row identity is the ``variables`` dict used by
    ``run_experiment`` (epochs/gamma/ode_name/region/latent_dim/window_size/
    num); its season lands in column ``"{test_season} {window_size+6}"``
    (``fiude_tpu/utils/results.py:38-44``, mirroring reference
    ``lib/utils.py:52-54``).
    """
    if not os.path.exists(csv_path):
        return list(configs)
    import pandas as pd
    df = pd.read_csv(csv_path, index_col=0)
    keep = []
    for cfg in configs:
        col = f"{cfg.test_season} {cfg.window_size + 6}"
        done = False
        if col in df.columns:
            m = pd.Series(True, index=df.index)
            for key in ("epochs", "gamma", "ode_name", "region",
                        "latent_dim", "window_size", "num"):
                if key not in df.columns:
                    m &= False
                    break
                m &= df[key] == getattr(cfg, key)
            done = bool(df.loc[m, col].notna().any()) if m.any() else False
        if not done:
            keep.append(cfg)
    return keep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--fill-1", action="store_true",
                    help="no-interpolation mode: weekly-only -1-masked targets")
    ap.add_argument("--fused-train", action="store_true",
                    help="backprop through the fused Pallas trajectory "
                    "kernels (~2x steps on the daily fill-1 grid; rk4 only "
                    "— Bayes families use the variational fused kernels, "
                    "non-rk4 methods fall back to the XLA scan)")
    ap.add_argument("--regions", nargs="+", default=["US", "hhs", "state"])
    ap.add_argument("--models", nargs="+", default=["CONN", "UONN"])
    ap.add_argument("--seasons", nargs="+", type=int,
                    default=[2015, 2016, 2017, 2018])
    ap.add_argument("--epochs", nargs="+", type=int, default=[140, 200, 260])
    ap.add_argument("--windows", nargs="+", type=int,
                    default=[1, 8, 15, 22, 29])
    ap.add_argument("--gammas", nargs="+", type=int, default=[35, 42, 49, 56])
    ap.add_argument("--nums", nargs="+", type=int, default=[15, 16, 17, 18, 19])
    ap.add_argument("--out", default="results_table_server")
    ap.add_argument("--work-dir", default=".")
    ap.add_argument("--ledger", default="started.txt")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--padded", action="store_true",
                    help="masked single-compilation curriculum (one trace "
                         "for the whole horizon schedule; same gradients)")
    ap.add_argument("--summary", action="store_true",
                    help="print the aggregated region x model table "
                         "(scripts/summarize_results.py) after the sweep")
    ap.add_argument("--population", action="store_true",
                    help="train same-shape config groups (the `nums` axis) "
                         "as device-parallel populations over a config mesh")
    ap.add_argument("--chip-lock", action="store_true",
                    help="serialize against other TPU jobs (bench, "
                         "head-to-head) via the advisory chip lock; use "
                         "whenever the sweep runs on the shared axon chip")
    ap.add_argument("--skip-done", action="store_true",
                    help="drop configs whose (config, season) cell already "
                         "has a non-NaN NLL in the output CSV — makes the "
                         "sweep resumable from the results table itself "
                         "when the work-dir ledger is gone (e.g. /tmp wipe)")
    args = ap.parse_args()

    if args.chip_lock:
        import contextlib

        from fiude_tpu.utils.chiplock import chip_lock
        stack = contextlib.ExitStack()
        stack.enter_context(chip_lock())

    # persistent compilation cache: repeated shapes (and crash-resumed
    # sweeps) skip the multi-minute remote Mosaic compiles entirely
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    configs = grid(region=args.regions, epochs=args.epochs,
                   window_size=args.windows, gamma=args.gammas,
                   latent_dim=[8], num=args.nums, test_season=args.seasons,
                   ode_name=args.models)
    if args.skip_done:
        n0 = len(configs)
        configs = filter_done(configs,
                              os.path.join(args.work_dir, args.out) + ".csv")
        print(f"--skip-done: {n0 - len(configs)}/{n0} cells already in the "
              "results table; {0} to run".format(len(configs)), flush=True)
    ledger = Ledger(os.path.join(args.work_dir, args.ledger))

    if args.population:
        import jax
        from fiude_tpu.parallel.mesh import config_mesh
        from fiude_tpu.parallel.sweep import (
            group_configs_for_population, run_population_experiment,
        )
        groups = group_configs_for_population(configs)
        mesh = None
        results_file = os.path.join(args.work_dir, args.out)

        def pop_worker(group):
            g = group
            m = (config_mesh(len(g))
                 if len(jax.devices()) >= len(g) > 1 else None)
            print("population:", [c.key for c in g], flush=True)
            return run_population_experiment(
                g, data_root=args.data_root, synthetic=args.synthetic,
                weights_root=args.work_dir, results_file=results_file,
                mesh=m, fused_train=args.fused_train)

        done = 0
        for g in groups:
            if not ledger.claim(g[0].key + f"_pop{len(g)}"):
                continue
            try:
                pop_worker(g)
                ledger.mark(g[0].key + f"_pop{len(g)}", "finished")
                done += len(g)
            except Exception as e:
                print("population failed:", e, flush=True)
                ledger.mark(g[0].key + f"_pop{len(g)}", "failed")
        print(f"processed {done}/{len(configs)} configs (population mode)")
        _maybe_summary(args)
        return

    def worker(cfg):
        print(cfg.region, cfg.ode_name, cfg.test_season, cfg.epochs, cfg.num,
              flush=True)
        out = run_experiment(
            cfg, data_root=args.data_root, synthetic=args.synthetic,
            fill_1=args.fill_1, weights_root=args.work_dir,
            results_file=os.path.join(args.work_dir, args.out),
            validate_each_epoch=True, verbose=args.verbose,
            padded_curriculum=args.padded, fused_train=args.fused_train)
        return out["metrics"]

    results = run_work_queue(configs, worker, ledger=ledger)
    done = sum(1 for r in results if r is not None)
    print(f"processed {done}/{len(configs)} configs")
    _maybe_summary(args)


def _maybe_summary(args):
    if not args.summary:
        return
    csv = os.path.join(args.work_dir, args.out) + ".csv"
    if not os.path.exists(csv):
        print(f"--summary: no results at {csv}")
        return
    import pandas as pd

    from scripts.summarize_results import summarize

    print(summarize(pd.read_csv(csv, index_col=0)).to_string(index=False))


if __name__ == "__main__":
    main()
