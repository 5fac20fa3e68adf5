#!/usr/bin/env python
"""Re-run the top-N tuning configs (reference ``lib/Old/test_odes.py:268-358``
best-config re-testing): sort the validation-score table, re-run each of the
top ``--run-best`` configs ``--run-each`` times with fresh seeds, dump
per-run JSON forecasts, and write a ``test_scores.csv`` summary.

Usage:
    python scripts/rerun_best_tuning.py --csv docs/validation_scores_synth.csv \
        --out docs/best_runs --run-best 10 --run-each 3 [--chip-lock]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate(params: dict, rep: int) -> dict:
    """One re-run: same protocol as scripts/tune_worker.py but seeded by the
    replicate index and returning the forecast dump the reference's best-N
    re-runs write as JSON (truth / predictive mean / std / score)."""
    import jax.numpy as jnp

    from fiude_tpu.data.loader import ArrayLoader
    from fiude_tpu.data.synthetic import synthetic_dataset
    from fiude_tpu.models import UDEForecaster
    from fiude_tpu.train import TRAINING_INFO, Trainer
    from fiude_tpu.train.experiment import adaptive_curriculum_train
    from fiude_tpu.train.losses import nll_loss

    latent_dim = int(params["latent_dim"])
    n_qs = int(params.get("n_qs", 10) or 10)
    window_size = int(params["window_size"])
    batch_size = int(params["batch_size"])
    n_samples = int(params["n_samples"])
    epochs = int(params["epochs"])
    hidden = int(params.get("hidden_size", 64))
    gamma = 56

    x_tr, y_tr, x_te, y_te, scaler = synthetic_dataset(
        n_regions=1, n_qs=n_qs, window_size=window_size, gamma=gamma,
        run_backward=False, seed=0)

    model = UDEForecaster.build(
        n_regions=1, latent_dim=latent_dim, n_qs=n_qs, ode_name="Fp",
        enc_params={"q_sizes": (hidden,), "ff_sizes": (hidden // 2,)},
        ode_params={"net_sizes": (32, 32)})
    trainer = Trainer(model, loss_cfg=TRAINING_INFO["CONN"],
                      len_tr=max(len(x_tr) // batch_size, 1), seed=rep)
    trainer.setup_training(lr=1e-3)
    loader = ArrayLoader(x_tr, y_tr, batch_size=batch_size, seed=rep)
    trainer.pre_train(loader, epochs=30)
    tmax = adaptive_curriculum_train(trainer, loader, gamma=gamma,
                                     epochs=epochs, tmax0=min(gamma, 10),
                                     tmax_cap=28, n_samples=n_samples)

    t = jnp.linspace(1.0, tmax, tmax) / 7.0
    y_pred = trainer.forecast(x_te, t, n_samples=n_samples)
    truth = np.asarray(y_te[:, :tmax, :]) * 7.7151
    pred = np.asarray(y_pred) * 7.7151
    score = float(nll_loss(jnp.asarray(pred), jnp.asarray(truth)))
    return {
        "score": score,
        "tmax": int(tmax),
        "truth": truth[:, :, 0],
        "pred_mean": pred.mean(axis=1)[:, :, 0],
        "pred_std": pred.std(axis=1)[:, :, 0],
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--csv", default="docs/validation_scores_synth.csv")
    ap.add_argument("--out", default="docs/best_runs")
    ap.add_argument("--run-best", type=int, default=10)
    ap.add_argument("--run-each", type=int, default=3)
    ap.add_argument("--chip-lock", action="store_true")
    args = ap.parse_args()

    import contextlib

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    stack = contextlib.ExitStack()
    if args.chip_lock:
        from fiude_tpu.utils.chiplock import chip_lock
        stack.enter_context(chip_lock())

    from fiude_tpu.train.experiment import rerun_best
    with stack:
        out_csv = rerun_best(args.csv, evaluate, run_best=args.run_best,
                             run_each=args.run_each, out_dir=args.out)
    print(f"wrote {out_csv}")


if __name__ == "__main__":
    main()
