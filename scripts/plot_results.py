#!/usr/bin/env python
"""Analysis plots (replaces the reference notebooks ``plot_norms.ipynb`` and
``run_ode.ipynb`` cells 9/11): grad-norm traces vs the skip threshold,
loss curves, and forecast fan charts."""
import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plot_norms(norm_glob: str, grad_lim: float, out: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    files = sorted(glob.glob(norm_glob))
    fig, ax = plt.subplots(figsize=(10, 4))
    for f in files:
        with open(f) as fh:
            vals = [float(v) for line in fh for v in line.strip().split(",")
                    if v]
        ax.plot(vals, lw=0.6, alpha=0.7, label=os.path.basename(os.path.dirname(f)))
    ax.axhline(grad_lim, color="red", ls="--", label=f"grad_lim={grad_lim}")
    ax.set_yscale("log")
    ax.set_xlabel("batch")
    ax.set_ylabel("global grad norm")
    if len(files) <= 8:
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out)


def plot_fan_chart(weights_prefix: str, out: str, *, region="US",
                   synthetic=True, n_samples=128):
    """Forecast fan chart: predictive mean +- std vs truth."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    from fiude_tpu.data.synthetic import synthetic_dataset
    from fiude_tpu.models import UDEForecaster
    from fiude_tpu.train import TRAINING_INFO, Trainer
    from fiude_tpu.utils.config import ExperimentConfig

    cfg = ExperimentConfig(region=region, ode_name="UONN")
    model = UDEForecaster.build(**cfg.model_kwargs())
    trainer = Trainer(model, loss_cfg=TRAINING_INFO["UONN"],
                      file_prefix=weights_prefix)
    trainer.init_params()
    trainer.load()

    x_tr, y_tr, x_te, y_te, scaler = synthetic_dataset(
        n_regions=cfg.n_regions, n_qs=cfg.n_qs, window_size=cfg.window_size,
        gamma=cfg.gamma)
    t = jnp.arange(cfg.window_size + cfg.gamma + 1, dtype=jnp.float32) / 7.0
    y_pred = np.asarray(trainer.forecast(x_te[:16], t, n_samples=n_samples))

    mu = y_pred.mean(1)
    sd = y_pred.std(1)
    fig, axes = plt.subplots(4, 4, figsize=(14, 10), sharex=True)
    for i, ax in enumerate(axes.flat):
        ax.plot(mu[i, :, 0], color="green", lw=0.8)
        ax.fill_between(np.arange(mu.shape[1]), mu[i, :, 0] - sd[i, :, 0],
                        mu[i, :, 0] + sd[i, :, 0], color="green", alpha=0.3)
        ax.plot(y_te[i, : mu.shape[1], 0], color="black", lw=0.8)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out)


def plot_history(history_json: str, out: str):
    """Loss-curve plot (reference run_ode.ipynb cell 9)."""
    import json

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(history_json) as fh:
        hist = json.load(fh)
    keys = [k for k in hist[0] if k not in ("kl_w",)]
    fig, ax = plt.subplots(figsize=(9, 5))
    for k in keys:
        ax.plot([h.get(k) for h in hist], label=k, lw=1.0)
    ax.set_xlabel("epoch")
    ax.set_yscale("symlog")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("norms")
    p1.add_argument("--glob", default="norms/**/norms.txt")
    p1.add_argument("--grad-lim", type=float, default=5000.0)
    p1.add_argument("--out", default="norms.png")
    p2 = sub.add_parser("fan")
    p2.add_argument("--weights-prefix", required=True)
    p2.add_argument("--out", default="fan_chart.png")
    p3 = sub.add_parser("history")
    p3.add_argument("--json", required=True)
    p3.add_argument("--out", default="history.png")
    args = ap.parse_args()

    if args.cmd == "norms":
        plot_norms(args.glob, args.grad_lim, args.out)
    elif args.cmd == "history":
        plot_history(args.json, args.out)
    else:
        plot_fan_chart(args.weights_prefix, args.out)


if __name__ == "__main__":
    main()
