"""Steady-state (warm-cache) training wall-clock for the head-to-head table.

The h2h ``train_seconds`` column is END-TO-END wall-clock including jit /
remote-Mosaic compilation (and, for CPU-platform fiude rows, a single-core
XLA-CPU run) — an honest deployment number for a one-off config, but NOT
the steady-state cost that dominates a sweep, where the persistent compile
cache makes every config after the first compile-free.  This script measures
the warm per-step cost of the EXACT training step each fiude cell runs
(same data tree, same padded-curriculum / transfer step shapes, same batch)
and upserts per-cell steady-state columns:

    steady_ms_per_step   — amortized ms per optimizer step (best-of-3,
                           dispatches chained, one host sync; the tunnel's
                           ~30 ms per-dispatch overhead is amortized exactly
                           like Trainer.train does)
    train_seconds_steady — steady_ms_per_step x the recipe's total step
                           count (epochs x batches; 115 epochs for the
                           UONN_pre transfer recipe)
    steady_platform      — where the steady numbers were measured

The torch side has no compilation, so its steady cost IS its wall-clock
column (modulo data building, a few seconds).

Usage:
    python scripts/h2h_steady_timing.py [--out docs/head_to_head]
        [--tree /tmp/h2h] [--regions US hhs] [--models CONN UONN SONN UONN_pre]
        [--steps 30] [--platform ambient|cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure_cell(tree: str, region: str, family: str, *, epochs: int,
                 window: int, gamma: int, steps: int, fused: bool,
                 n_samples: int = 64):
    """Warm ms/step + recipe step count for one (region, family) cell."""
    import jax
    import jax.numpy as jnp

    from fiude_tpu.data.builder import DataConstructor
    from fiude_tpu.data.loader import ArrayLoader
    from fiude_tpu.train.experiment import build_trainer
    from fiude_tpu.utils.config import ExperimentConfig

    ode_name = "UONN" if family == "UONN_pre" else family
    cfg = ExperimentConfig(region=region, ode_name=ode_name,
                           test_season=2016, epochs=epochs,
                           window_size=window, gamma=gamma, num=1)
    dc = DataConstructor(test_season=2016, region=region, n_queries=cfg.n_qs,
                         gamma=gamma, window_size=window,
                         root=os.path.join(tree, "Data") + os.sep)
    x_tr, y_tr, *_ = dc(run_backward=True, no_qs_in_output=True)
    loader = ArrayLoader(x_tr, y_tr, batch_size=cfg.batch_size, seed=0)
    n_batches = len(loader)

    trainer = build_trainer(cfg, weights_root="/tmp/steady_timing",
                            seed=0, fused_train=fused)
    trainer.setup_training(lr=cfg.lr)

    t = jnp.arange(window + gamma + 1, dtype=jnp.float32) / 7.0
    if family == "UONN_pre":
        # transfer recipe step (run_transfer): forward on t[::7], all pts live
        eval_pts = np.arange(0, t.shape[-1], 7)
        t_eval = t[eval_pts]
        time_mask = eval_mask = None
        total_steps = (5 + 10 + 100) * n_batches
    else:
        # padded-curriculum step: weekly grid + stage masks (final stage)
        eval_all = np.linspace(0, gamma, int(gamma / 7) + 1, dtype=int)
        eval_pts = eval_all
        t_eval = t[eval_all]
        K = len(eval_all)
        eval_mask = jnp.ones((K,), jnp.float32)
        time_mask = jnp.ones((K - 1,), jnp.float32)
        total_steps = epochs * n_batches

    x_b, y_b = next(iter(loader))
    x_b = jnp.asarray(x_b)
    y_b = jnp.asarray(y_b)[:, eval_pts, :]
    fa_arr = jnp.asarray(1.0, jnp.float32)
    ep_arr = jnp.asarray(9, jnp.int32)
    lim_arr = jnp.asarray(cfg.grad_lim, jnp.float32)

    def run(n):
        state = trainer.state
        metrics = None
        keys = trainer.next_keys(n)
        for i in range(n):
            state, metrics = trainer._step_fn(
                state, x_b, y_b, t_eval, None, fa_arr, ep_arr, lim_arr,
                time_mask=time_mask, eval_mask=eval_mask,
                eps_key=keys[i], n_samples=n_samples)
        return float(metrics["loss"])  # host fetch = sync

    run(2)  # compile + warmup
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        run(steps)
        best = min(best, (time.perf_counter() - start) / steps)
    return best * 1000.0, total_steps, n_batches


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tree", default="/tmp/h2h")
    ap.add_argument("--out", default="docs/head_to_head")
    ap.add_argument("--regions", nargs="+", default=["US", "hhs"])
    ap.add_argument("--models", nargs="+",
                    default=["CONN", "UONN", "SONN", "UONN_pre"])
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--window", type=int, default=15)
    ap.add_argument("--gamma", type=int, default=28)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--platform", default="ambient",
                    choices=["ambient", "cpu"])
    ap.add_argument("--cache", default="/tmp/h2h_steady_cache.json",
                    help="sidecar of measured (region, family) -> numbers; "
                         "lets --apply-only stamp rows that land after the "
                         "measurement pass without re-touching the chip")
    ap.add_argument("--apply-only", action="store_true",
                    help="no measurement: re-apply the cached numbers to "
                         "whatever rows are in the CSV now")
    args = ap.parse_args()

    import json

    cache = {}
    if os.path.exists(args.cache):
        with open(args.cache) as fh:
            cache = json.load(fh)

    def apply_cell(region: str, family: str, entry: dict):
        import pandas as pd

        from fiude_tpu.utils.results import upsert_results_row
        csv = os.path.abspath(args.out) + ".csv"
        if not os.path.exists(csv):
            return
        df = pd.read_csv(csv, index_col=0)
        hit = df[(df.framework == "fiude") & (df.region == region)
                 & (df.ode_name == family)]
        for _, row in hit.iterrows():
            upsert_results_row(
                os.path.abspath(args.out),
                {"framework": "fiude", "region": region,
                 "ode_name": family, "test_season": row["test_season"],
                 "num": row["num"]},
                {"steady_ms_per_step": entry["ms"],
                 "train_seconds_steady": entry["steady_s"],
                 "steady_platform": entry["platform"]})

    if args.apply_only:
        for key, entry in cache.items():
            region, family = key.split("/")
            apply_cell(region, family, entry)
            print(f"[steady] re-applied {key}: {entry}", flush=True)
        return

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import contextlib

    from fiude_tpu.utils.chiplock import chip_lock

    lock = (chip_lock() if args.platform == "ambient"
            else contextlib.nullcontext())
    with lock:
        platform = jax.devices()[0].platform
        fused = platform == "tpu"
        for region in args.regions:
            for family in args.models:
                ms, total_steps, n_batches = measure_cell(
                    args.tree, region, family, epochs=args.epochs,
                    window=args.window, gamma=args.gamma, steps=args.steps,
                    fused=fused)
                steady_s = ms * total_steps / 1000.0
                print(f"[steady] {region} {family}: {ms:.2f} ms/step "
                      f"({platform}, fused={fused}), {total_steps} steps "
                      f"({n_batches} batches/epoch) -> {steady_s:.1f}s",
                      flush=True)
                entry = {"ms": round(ms, 2), "steady_s": round(steady_s, 1),
                         "platform": platform, "total_steps": total_steps}
                cache[f"{region}/{family}"] = entry
                with open(args.cache, "w") as fh:
                    json.dump(cache, fh, indent=1)
                apply_cell(region, family, entry)


if __name__ == "__main__":
    main()
