#!/usr/bin/env python
"""Recipe ablation on the head-to-head families torch still wins.

At n=2 seeds, torch led US SONN, hhs CONN, and hhs SONN
(docs/HEAD_TO_HEAD.md aggregate).  The builder's own finding is that these
families are seed lotteries on BOTH stacks, so before concluding a
mechanics gap this harness ablates one recipe knob at a time on the fiude
side — same shared ``Data/`` tree, same reference budget — and records each
variant to ``docs/h2h_ablation.csv`` (a SEPARATE table: the main
head-to-head stays reference-recipe on both stacks).

Knobs (VERDICT r4 item 1): learning rate, warm-up LR schedule
(reference ``lib/VAE.py:13-18``), grad_lim (the skip-not-clip threshold,
``lib/VAE.py:208-212``), KL-anneal split (``lib/train_functions.py:17-44``),
encoder pre-training (``testing.py:135``), MC ensemble width.

Usage:
    python scripts/ablate_h2h.py --tree /tmp/h2h --nums 1 2 \
        --families US:SONN hhs:CONN hhs:SONN --deadline <epoch-s>
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# knob sets; "base" replicates the reference recipe for a same-process anchor
VARIANTS = {
    "base": {},
    "lr5e-4": {"lr": 5e-4},
    "lr2e-3": {"lr": 2e-3},
    "warmup": {"warmup": True},
    "gradlim1500": {"grad_lim": 1500.0},
    "anneal25": {"anneal_split": 0.25},
    "pre3": {"pre_train_epochs": 3},
    "mc128": {"n_samples": 128},
}


def run_variant(tree: str, region: str, ode_name: str, season: int,
                num: int, variant: str, *, weights_root: str,
                fused: bool = True, epochs: int | None = None) -> tuple:
    """Train one fiude cell with the variant's knob overrides; returns
    (metrics, train_seconds)."""
    import dataclasses

    import jax.numpy as jnp

    from fiude_tpu.data.builder import DataConstructor
    from fiude_tpu.data.loader import ArrayLoader
    from fiude_tpu.train.experiment import build_trainer
    from fiude_tpu.train.losses import AnnealConfig
    from fiude_tpu.utils.config import REGION_INFO, ExperimentConfig
    from fiude_tpu.utils.results import evaluate_forecast

    kn = dict(VARIANTS[variant])
    cfg = ExperimentConfig(
        region=region, ode_name=ode_name, test_season=season,
        epochs=epochs or REGION_INFO[region]["epochs"], window_size=15,
        gamma=28, num=num, lr=kn.pop("lr", 1e-3),
        grad_lim=kn.pop("grad_lim", 5000.0))
    warmup = kn.pop("warmup", False)
    anneal_split = kn.pop("anneal_split", None)
    pre_train_epochs = kn.pop("pre_train_epochs", 0)
    n_samples = kn.pop("n_samples", cfg.n_samples)
    assert not kn, f"unknown knobs {kn}"

    data_root = os.path.join(tree, "Data") + os.sep
    dc = DataConstructor(test_season=season, region=region,
                         n_queries=cfg.n_qs, gamma=cfg.gamma,
                         window_size=cfg.window_size, root=data_root)
    x_tr, y_tr, x_te, y_te, scaler = dc(run_backward=True,
                                        no_qs_in_output=True)
    loader = ArrayLoader(x_tr, y_tr, batch_size=cfg.batch_size, seed=num)
    t = jnp.arange(cfg.window_size + cfg.gamma + 1, dtype=jnp.float32) / 7.0

    trainer = build_trainer(cfg, weights_root=weights_root, seed=num,
                            fused_train=fused)
    if anneal_split is not None:
        trainer.anneal = AnnealConfig(split=anneal_split)
    trainer.setup_training(lr=cfg.lr)
    start = time.monotonic()
    if pre_train_epochs:
        trainer.pre_train(loader, epochs=pre_train_epochs, lr=cfg.lr)
        trainer.state = trainer.state._replace(params=trainer.params)

    eval_all = np.asarray(
        np.linspace(0, cfg.gamma, int(cfg.gamma / 7) + 1, dtype=int))
    epochs_per_cycle = max(int(cfg.epochs / (len(eval_all) - 1)), 1)
    if warmup:
        # warm-up needs the per-epoch LR schedule -> exact staged curriculum
        # (the padded path drives all stages through one compiled loop)
        for i in range(2, len(eval_all) + 1):
            eval_pts = eval_all[:i]
            trainer.train(loader, t[: eval_pts[-1] + 1], epochs_per_cycle,
                          eval_pts, n_samples=n_samples,
                          grad_lim=cfg.grad_lim, checkpoint=True,
                          warmup=True)
    else:
        trainer.train_curriculum_padded(
            loader, t, eval_all, epochs_per_cycle, n_samples=n_samples,
            grad_lim=cfg.grad_lim, checkpoint=True)
    secs = time.monotonic() - start

    y_pred = trainer.forecast(x_te, t, n_samples=128)
    metrics = evaluate_forecast(
        np.asarray(y_pred), np.asarray(y_te)[:, : len(t)],
        np.asarray(scaler), window_size=cfg.window_size, test_season=season)
    return metrics, secs


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tree", default="/tmp/h2h")
    ap.add_argument("--out", default="docs/h2h_ablation")
    ap.add_argument("--families", nargs="+",
                    default=["US:SONN", "hhs:CONN", "hhs:SONN"])
    ap.add_argument("--variants", nargs="+", default=list(VARIANTS),
                    choices=list(VARIANTS))
    ap.add_argument("--nums", nargs="+", type=int, default=[1, 2])
    ap.add_argument("--seasons", nargs="+", type=int, default=[2016])
    ap.add_argument("--weights-root", default="/tmp/h2h_ablation_runs")
    ap.add_argument("--deadline", type=float, default=None,
                    help="epoch seconds; no NEW run starts past this")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--platform", default="ambient",
                    choices=["ambient", "cpu"])
    ap.add_argument("--epochs", type=int, default=None,
                    help="override the per-region reference budget "
                         "(smoke-testing only)")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from fiude_tpu.utils.results import upsert_results_row

    from scripts.head_to_head import ensure_tree
    tree = ensure_tree(os.path.abspath(args.tree))
    out = os.path.abspath(args.out)

    import contextlib

    def maybe_chip_lock():
        if args.platform == "ambient":
            from fiude_tpu.utils.chiplock import chip_lock
            return chip_lock(timeout=1800)
        return contextlib.nullcontext()

    def have_row(region, ode, season, num, variant) -> bool:
        if not (args.resume and os.path.exists(out + ".csv")):
            return False
        import pandas as pd
        df = pd.read_csv(out + ".csv", index_col=0)
        if df.empty:
            return False
        hit = df[(df["region"] == region) & (df["ode_name"] == ode)
                 & (df["test_season"] == season) & (df["num"] == num)
                 & (df["variant"] == variant)]
        return len(hit) > 0

    # variant-major order: every family gets its 'base' anchor and first
    # knobs before any family gets the long tail
    for variant in args.variants:
        for fam in args.families:
            region, ode = fam.split(":")
            for season in args.seasons:
                for num in args.nums:
                    if args.deadline and time.time() >= args.deadline:
                        print("[ablate] deadline passed; stopping",
                              flush=True)
                        return
                    if have_row(region, ode, season, num, variant):
                        print(f"[skip] {region} {ode} {season} num={num} "
                              f"{variant}", flush=True)
                        continue
                    with maybe_chip_lock():
                        m, secs = run_variant(
                            tree, region, ode, season, num, variant,
                            weights_root=args.weights_root,
                            fused=args.platform != "cpu",
                            epochs=args.epochs)
                    upsert_results_row(
                        out,
                        {"region": region, "ode_name": ode,
                         "test_season": season, "num": num,
                         "variant": variant},
                        {**m, "train_seconds": round(secs, 1),
                         "platform": ("cpu" if args.platform == "cpu"
                                      else "tpu")})
                    nlls = [v for k, v in m.items()
                            if not k.startswith("skill")]
                    print(f"[ablate] {region} {ode} num={num} {variant}: "
                          f"mean NLL {np.mean(nlls):.3f}, {secs:.0f}s",
                          flush=True)


if __name__ == "__main__":
    main()
