#!/usr/bin/env python
"""Hyperparameter-tuning work-queue worker (reference ``tuning/tune_node.py``).

Claims rows from a ``validation_scores.csv`` grid (columns = hyperparameters
+ ``started`` + ``score``), trains a model with the adaptive curriculum, and
writes the validation NLL back.  Launch many instances (or many hosts) —
coordination is the file-locked CSV, exactly like the reference's 36-worker
fan-out (``tuning/run_tuning.sh``).

Create a grid first with scripts/make_tuning_grid.py.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate(params: dict) -> float:
    """One tuning evaluation (reference tune_node.py:123-232): encoder
    pre-train, adaptive-curriculum training, test-set NLL as the score."""
    import jax.numpy as jnp

    from fiude_tpu.data.loader import ArrayLoader
    from fiude_tpu.data.synthetic import synthetic_dataset
    from fiude_tpu.models import UDEForecaster
    from fiude_tpu.train import TRAINING_INFO, Trainer
    from fiude_tpu.train.experiment import adaptive_curriculum_train
    from fiude_tpu.train.losses import nll_loss

    latent_dim = int(params["latent_dim"])
    n_qs = int(params.get("n_qs", params.get("input_size", 10)) or 10)
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
                      len_tr=max(len(x_tr) // batch_size, 1))
    trainer.setup_training(lr=1e-3)
    loader = ArrayLoader(x_tr, y_tr, batch_size=batch_size, seed=0)
    trainer.pre_train(loader, epochs=30)

    tmax = adaptive_curriculum_train(trainer, loader, gamma=gamma,
                                     epochs=epochs, tmax0=min(gamma, 10),
                                     tmax_cap=28, n_samples=n_samples)

    t = jnp.linspace(1.0, tmax, tmax) / 7.0
    y_pred = trainer.forecast(x_te, t, n_samples=n_samples)
    score = float(nll_loss(y_pred * 7.7151,
                           jnp.asarray(y_te[:, :tmax, :]) * 7.7151))
    return score


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("worker_id", type=int, nargs="?", default=0)
    ap.add_argument("--csv", default="validation_scores.csv")
    ap.add_argument("--max-rows", type=int, default=256)
    ap.add_argument("--chip-lock", action="store_true",
                    help="serialize against other TPU jobs (bench, sweeps) "
                         "via the advisory chip lock")
    ap.add_argument("--platform", choices=["ambient", "cpu"],
                    default="ambient",
                    help="'cpu' pins jax to the host CPU before backend "
                         "init — off-chip workers run in parallel with "
                         "on-chip sweeps (reference protocol is CPU "
                         "workers too, tuning/run_tuning.sh). Rows are "
                         "stamped with a 'platform' provenance column.")
    args = ap.parse_args()

    import contextlib

    import jax
    if args.platform == "cpu":
        # sitecustomize pins JAX_PLATFORMS=axon; only a pre-init config
        # update can steer the backend (see CLAUDE.md / verify skill)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    stack = contextlib.ExitStack()
    if args.chip_lock:
        from fiude_tpu.utils.chiplock import chip_lock
        stack.enter_context(chip_lock())

    from fiude_tpu.train.experiment import run_tuning_worker
    platform = jax.devices()[0].platform
    with stack:
        n = run_tuning_worker(args.csv, evaluate, max_rows=args.max_rows,
                              extra_cols={"platform": platform})
    print(f"worker {args.worker_id}: processed {n} rows")


if __name__ == "__main__":
    main()
