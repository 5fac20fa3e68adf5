#!/usr/bin/env python
"""Bayes-UDE development workflow (script form of the reference's
``run_ode.ipynb`` cells 0-11): build data, train a variational-weight
``Bayes_FaFp`` (UONNb) with a custom loss gate set, mutate the weight-prior
std mid-run (cell 8 / ``lib/VAE.py:103-110``), then emit the notebook's
diagnostics — loss/metric curves (cell 9) and per-horizon fan charts of the
MC predictive ensemble vs truth (cell 11), plus the empirical (beta, gamma)
rate posterior vs the fixed prior.

    python scripts/bayes_workflow.py --epochs 30 --out-dir bayes_out
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="bayes_out")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n-samples", type=int, default=16)
    ap.add_argument("--window", type=int, default=14)
    ap.add_argument("--gamma", type=int, default=28)
    ap.add_argument("--prior-std", type=float, default=0.05)
    ap.add_argument("--new-prior-std", type=float, default=0.1,
                    help="prior std applied mid-run (notebook cell 8)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax.numpy as jnp

    from fiude_tpu.data.loader import ArrayLoader
    from fiude_tpu.data.synthetic import synthetic_dataset
    from fiude_tpu.models import UDEForecaster
    from fiude_tpu.train.losses import LossConfig
    from fiude_tpu.train.trainer import Trainer

    # data (notebook cell 5; synthetic tree in place of the gitignored Data/)
    x_tr, y_tr, x_te, y_te, scaler = synthetic_dataset(
        n_regions=1, n_qs=5, window_size=args.window, gamma=args.gamma,
        seed=args.seed)
    loader = ArrayLoader(x_tr, y_tr, batch_size=32, seed=args.seed)
    t = jnp.arange(args.window + args.gamma + 1, dtype=jnp.float32) / 7.0
    eval_pts = np.arange(0, t.shape[-1], 7)

    # model (cells 4/6): Bayes_FaFp with tight initial weight prior
    model = UDEForecaster.build(
        n_regions=1, latent_dim=8, n_qs=5, ode_name="Bayes_FaFp",
        enc_params={"q_sizes": (64, 32), "ff_sizes": (32, 32),
                    "SIR_scaler": [0.1, 0.05, 1.0]},
        ode_params={"net_sizes": (32, 32, 16), "aug_net_sizes": (32, 32),
                    "prior_std": args.prior_std})
    # custom loss gates (cell 7: nll/kl_z/Fa_norm/reg_loss, no kl_p)
    loss_cfg = LossConfig(nll=True, mse=False, kl_z=True, kl_p=False,
                          fa_norm=0.1, reg_loss=True, anneal=True)
    trainer = Trainer(model, loss_cfg=loss_cfg, len_tr=len(x_tr),
                      ode_kl_w=1 / 153, seed=args.seed,
                      file_prefix=os.path.join(args.out_dir, "bayes_"))
    trainer.setup_training(lr=1e-3)

    half = max(args.epochs // 2, 1)
    trainer.train(loader, t, half, eval_pts, n_samples=args.n_samples,
                  grad_lim=1e5, verbose=True)
    # cell 8: widen the weight prior mid-run and keep training
    trainer.update_priors(args.new_prior_std)
    trainer.train(loader, t, args.epochs - half, eval_pts,
                  n_samples=args.n_samples, grad_lim=1e5, verbose=True)
    trainer.save()

    # cell 9: loss / metric curves
    hist = trainer.history.epoch_history
    fig, ax = plt.subplots(figsize=(7, 4))
    for key in ("loss", "nll", "ode_kl"):
        if key in hist[0]:
            ax.plot([h[key] for h in hist], label=key)
    ax.axvline(half - 0.5, color="gray", ls=":",
               label=f"prior_std -> {args.new_prior_std}")
    ax.set_xlabel("epoch")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(args.out_dir, "loss_curves.png"), dpi=120)

    # cells 10-11: MC fan charts per horizon
    y_pred = np.asarray(trainer.forecast(x_te, t, n_samples=64))
    mean, std = y_pred.mean(1), y_pred.std(1)
    y_true = np.asarray(y_te)
    fig, axes = plt.subplots(len(eval_pts), 1,
                             figsize=(8, 2.2 * len(eval_pts)), sharex=True)
    for ax, g in zip(np.atleast_1d(axes), eval_pts):
        idx = np.arange(mean.shape[0])
        ax.plot(idx, mean[:, g, 0], color="red", lw=1, label="pred mean")
        ax.fill_between(idx, (mean - std)[:, g, 0], (mean + std)[:, g, 0],
                        color="red", alpha=0.3, lw=0)
        ax.plot(idx, y_true[:, g, 0], color="C0", lw=1, label="truth")
        ax.set_ylabel(f"t+{g}d")
    np.atleast_1d(axes)[0].legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(args.out_dir, "fan_charts.png"), dpi=120)

    # empirical (beta, gamma) posterior vs the rate prior
    import jax

    eps = model.sample_eps(jax.random.PRNGKey(1), int(x_te.shape[0]), 32)
    _, extras = jax.jit(model.apply)(trainer.state.params,
                                     jnp.asarray(x_te), t, eps,
                                     rng=jax.random.PRNGKey(2))
    rates = np.asarray(extras.aux["rates"]).reshape(-1, 2)
    fig, axes = plt.subplots(1, 2, figsize=(9, 3.2))
    from scipy.stats import norm as norm_dist
    for ax, k, name, prior in zip(axes, (0, 1), ("beta", "gamma"),
                                  ((0.8, 0.2), (0.55, 0.2))):
        ax.hist(rates[:, k], bins=60, density=True, alpha=0.6,
                label="empirical posterior")
        grid = np.linspace(rates[:, k].min(), max(rates[:, k].max(), 1.5), 200)
        ax.plot(grid, norm_dist.pdf(grid, *prior), "r--",
                label=f"prior N{prior}")
        ax.set_title(name)
        ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(args.out_dir, "rate_posterior.png"), dpi=120)

    print("wrote", args.out_dir, ":", sorted(os.listdir(args.out_dir)))


if __name__ == "__main__":
    main()
