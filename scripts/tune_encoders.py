#!/usr/bin/env python
"""Encoder-architecture comparison workers (reference ``tuning/tune_encoders.py``,
which compared Encoder_BiDirectionalGRU / Encoder_MISO_GRU / Encoder_Back_GRU
over a file-locked CSV queue — and is broken upstream against stale imports).

Grid CSV columns: encoder (back_gru|bigru|bilstm), latent_dim, hidden_size,
window_size, batch_size, n_samples, epochs, started, score.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate(params: dict) -> float:
    import jax.numpy as jnp

    from fiude_tpu.data.loader import ArrayLoader
    from fiude_tpu.data.synthetic import synthetic_dataset
    from fiude_tpu.models import UDEForecaster
    from fiude_tpu.train import TRAINING_INFO, Trainer
    from fiude_tpu.train.losses import nll_loss

    encoder = str(params.get("encoder", "back_gru"))
    latent_dim = int(params["latent_dim"])
    hidden = int(params.get("hidden_size", 64))
    window_size = int(params["window_size"])
    batch_size = int(params["batch_size"])
    n_samples = int(params["n_samples"])
    epochs = int(params["epochs"])
    n_qs, gamma = 8, 28

    x_tr, y_tr, x_te, y_te, scaler = synthetic_dataset(
        n_regions=1, n_qs=n_qs, window_size=window_size, gamma=gamma,
        run_backward=False, seed=0)

    enc_params = {
        "back_gru": {"q_sizes": (hidden,), "ff_sizes": (hidden // 2,)},
        "bigru": {"q_sizes": (hidden,), "ili_sizes": (hidden // 2,),
                  "ff_sizes": (hidden // 2,)},
        "bilstm": {"hidden_size": hidden},
    }[encoder]

    model = UDEForecaster.build(
        n_regions=1, latent_dim=latent_dim, n_qs=n_qs, ode_name="Fp",
        encoder_name=encoder, enc_params=enc_params,
        ode_params={"net_sizes": (32, 32)})
    trainer = Trainer(model, loss_cfg=TRAINING_INFO["CONN"],
                      len_tr=max(len(x_tr) // batch_size, 1))
    trainer.setup_training(lr=1e-3)
    loader = ArrayLoader(x_tr, y_tr, batch_size=batch_size, seed=0)
    if encoder == "back_gru":  # the live encoder supports KL pre-training
        trainer.pre_train(loader, epochs=5)

    t = jnp.arange(0, gamma + 1, dtype=jnp.float32)[1:] / 7.0
    eval_pts = np.arange(gamma)
    trainer.train(loader, jnp.linspace(1.0, gamma, gamma) / 7.0,
                  epochs, eval_pts, n_samples=n_samples, grad_lim=5000)

    y_pred = trainer.forecast(x_te, jnp.linspace(1.0, gamma, gamma) / 7.0,
                              n_samples=n_samples)
    return float(nll_loss(y_pred, jnp.asarray(y_te[:, :gamma, :])))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("worker_id", type=int, nargs="?", default=0)
    ap.add_argument("--csv", default="encoder_scores.csv")
    ap.add_argument("--make-grid", action="store_true")
    ap.add_argument("--max-rows", type=int, default=256)
    args = ap.parse_args()

    if args.make_grid:
        import itertools
        import pandas as pd
        rows = [dict(encoder=e, latent_dim=6, hidden_size=h, window_size=28,
                     batch_size=32, n_samples=16, epochs=20,
                     started=0, score=10.0)
                for e, h in itertools.product(
                    ["back_gru", "bigru", "bilstm"], [32, 64, 128])]
        pd.DataFrame(rows).to_csv(args.csv)
        print(f"wrote {len(rows)} rows to {args.csv}")
        return

    from fiude_tpu.train.experiment import run_tuning_worker
    n = run_tuning_worker(args.csv, evaluate, max_rows=args.max_rows)
    print(f"worker {args.worker_id}: processed {n} rows")


if __name__ == "__main__":
    main()
