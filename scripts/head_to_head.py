"""Same-data accuracy head-to-head: the ACTUAL reference torch stack vs fiude.

Both frameworks train on the SAME synthetic ``Data/`` tree with the SAME
recipe — the reference's own ``run_ode.py:140-166`` weekly-curriculum sweep
unit (batch 32, lr 1e-3, 64 MC samples, grad_lim 5000, ode_kl_w 1/153) — and
are scored through the SAME metric code
(:func:`fiude_tpu.utils.results.evaluate_forecast`, itself oracle-tested
against ``lib/Metrics.py``).  The torch side runs the reference's own modules
(``lib/VAE.py``, ``lib/models.py``, ``lib/regional_data_builder.py``) with
``torchdiffeq`` provided by the faithful 3/8-RK4 shim; one CPU thread, as the
reference deploys (``run_ode.py:28``).

Rows land in ``{out}.csv`` with a ``framework`` column ({torch, fiude}) plus
``train_seconds`` so accuracy AND runtime are comparable cell by cell.

Usage (full head-to-head, hours on the torch side):
    python scripts/head_to_head.py --tree /tmp/h2h --out docs/head_to_head \
        --regions US hhs --models CONN UONN SONN --seasons 2016 \
        --sides torch fiude --transfer
"""

from __future__ import annotations

import argparse
import glob as _glob
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_ROOT = "/root/reference"

from fiude_tpu.utils.config import REGION_INFO, ExperimentConfig  # noqa: E402
from fiude_tpu.utils.results import (  # noqa: E402
    evaluate_forecast,
    upsert_results_row,
)

# reference run_ode.py:71-78 loss gating (torch-side dicts)
TORCH_TRAINING_INFO = {
    "UONN": {"nll": True, "mse": False, "kl_z": True, "kl_p": True,
             "Fa_norm": 1e-1, "reg_loss": True, "anneal": True},
    "CONN": {"nll": True, "mse": False, "kl_z": True, "kl_p": True,
             "Fa_norm": False, "reg_loss": True, "anneal": True},
    "SONN": {"nll": True, "mse": False, "kl_z": True, "kl_p": False,
             "Fa_norm": False, "reg_loss": False, "anneal": True},
}


def ensure_tree(root: str, *, n_qs: int = 96, n_weeks: int = 470,
                seed: int = 0) -> str:
    """Build the shared synthetic Data/ tree once (idempotent)."""
    from fiude_tpu.data.synthetic import write_reference_data_tree
    marker = os.path.join(root, "Data", "Dates.csv")
    if not os.path.exists(marker):
        print(f"[tree] writing synthetic Data/ tree at {root} "
              f"(n_qs={n_qs}, n_weeks={n_weeks})", flush=True)
        write_reference_data_tree(os.path.join(root, "Data"), n_qs=n_qs,
                                  seed=seed, n_weeks=n_weeks)
    return root


def _torch_modules():
    from fiude_tpu.utils import torchdiffeq_shim
    torchdiffeq_shim.install()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from lib.models import Decoder, Encoder_Back_GRU, Fa, FaFp, Fp
    from lib.regional_data_builder import DataConstructor, convert_to_torch
    from lib.VAE import VAE
    return VAE, Encoder_Back_GRU, Decoder, {"CONN": Fp, "UONN": FaFp,
                                            "SONN": Fa}, \
        DataConstructor, convert_to_torch


def train_torch_config(tree: str, cfg: ExperimentConfig, *,
                       weights_root: str, transfer_from: str | None = None,
                       threads: int = 1):
    """One reference sweep unit, exactly as run_ode.py:120-166 (or the
    testing_pre_train.py:132-146 transfer recipe when ``transfer_from``)."""
    import torch
    torch.set_num_threads(threads)
    VAE, Enc, Dec, odes, DataConstructor, convert_to_torch = _torch_modules()

    info = REGION_INFO[cfg.region]
    old_cwd = os.getcwd()
    os.chdir(tree)  # the reference reads hardcoded 'Data/...' relative paths
    try:
        torch.manual_seed(cfg.num)
        _data = DataConstructor(test_season=cfg.test_season,
                                region=cfg.region,
                                window_size=cfg.window_size,
                                n_queries=info["n_qs"], gamma=cfg.gamma)
        x_train, y_train, x_test, y_test, scaler = _data(
            run_backward=True, no_qs_in_output=True)
        train_loader, x_test_t, y_test_t = convert_to_torch(
            x_train, y_train, x_test, y_test, batch_size=cfg.batch_size,
            shuffle=True, dtype=torch.float32)

        prefix = os.path.join(weights_root, "torch", cfg.key)
        os.makedirs(os.path.dirname(prefix), exist_ok=True)
        model = VAE(Enc, odes[cfg.ode_name], Dec, info["n_qs"],
                    cfg.latent_dim, info["n_regions"], file_prefix=prefix,
                    chkpt_prefix=prefix,
                    ode_params={k: (list(v) if isinstance(v, tuple) else v)
                                for k, v in info["ode_params"].items()},
                    enc_params={k: (list(v) if isinstance(v, tuple) else v)
                                for k, v in info["enc_params"].items()},
                    dec_params=dict(info["dec_params"]),
                    uncertainty=True, ode_kl_w=1 / 153)
        model.setup_training(lr=cfg.lr)
        losses = TORCH_TRAINING_INFO[cfg.ode_name]
        t = torch.arange(cfg.window_size + cfg.gamma + 1,
                         dtype=torch.float32) / 7
        norm_file = prefix + "norms.txt"

        start = time.monotonic()
        if transfer_from is None:
            # weekly growing-horizon curriculum (run_ode.py:147-164)
            eval_all = list(np.linspace(0, cfg.gamma,
                                        int(cfg.gamma / 7) + 1, dtype=int))
            epochs_per_cycle = int(cfg.epochs / (len(eval_all) - 1))
            for i in range(2, len(eval_all) + 1):
                eval_pts = eval_all[:i]
                model.train(train_loader, t[: eval_pts[-1] + 1],
                            epochs_per_cycle, losses, eval_pts,
                            n_samples=cfg.n_samples, grad_lim=cfg.grad_lim,
                            checkpoint=True, disable=True,
                            norm_file=norm_file)
        else:
            # CONN -> UONN transfer (testing_pre_train.py:132-146), incl. the
            # reference's strict=False load quirk
            eval_pts = list(np.arange(0, t.shape[-1], 7))
            model.load(file_prefix=transfer_from)
            model.ode.Fa_w = 0
            for _ in range(5):
                model.train(train_loader, t, 1, losses, eval_pts,
                            n_samples=cfg.n_samples, grad_lim=1500,
                            checkpoint=True, disable=True,
                            norm_file=norm_file)
            for _ in range(10):
                model.ode.Fa_w += 0.1
                model.train(train_loader, t, 1, losses, eval_pts,
                            n_samples=cfg.n_samples, grad_lim=1500,
                            checkpoint=True, disable=True,
                            norm_file=norm_file)
            model.train(train_loader, t, 100, losses, eval_pts,
                        n_samples=cfg.n_samples, grad_lim=1500,
                        checkpoint=True, disable=True, norm_file=norm_file)
        train_seconds = time.monotonic() - start
        model.save()

        with torch.no_grad():
            y_pred = model(x_test_t, t, n_samples=128)
        metrics = evaluate_forecast(
            y_pred.detach().numpy(), y_test_t.detach().numpy(),
            np.asarray(scaler), window_size=cfg.window_size,
            test_season=cfg.test_season)
        return metrics, train_seconds
    finally:
        os.chdir(old_cwd)


def train_fiude_config(tree: str, cfg: ExperimentConfig, *,
                       weights_root: str, transfer_from: str | None = None,
                       fused: bool = True, pre_train_epochs: int = 0,
                       padded: bool = True, seed: int = 0):
    """The fiude trainer on the SAME tree with the SAME recipe.

    ``padded=True`` uses the masked single-compilation curriculum
    (gradient-identical to the exact staged mode, tested in
    test_padded_curriculum.py) so the wall-clock column measures training,
    not four rounds of remote Mosaic kernel compilation."""
    import jax.numpy as jnp

    from fiude_tpu.data.builder import DataConstructor
    from fiude_tpu.train.experiment import run_experiment, run_transfer

    data_root = os.path.join(tree, "Data") + os.sep
    start = time.monotonic()
    if transfer_from is None:
        res = run_experiment(cfg, data_root=data_root, synthetic=False,
                             weights_root=weights_root, results_file=None,
                             fused_train=fused, seed=seed,
                             padded_curriculum=padded,
                             pre_train_epochs=pre_train_epochs)
        trainer = res["trainer"]
    else:
        trainer = run_transfer(cfg, load_prefix=transfer_from,
                               data_root=data_root, synthetic=False,
                               weights_root=weights_root, fused_train=fused,
                               seed=seed)
    train_seconds = time.monotonic() - start

    dc = DataConstructor(test_season=cfg.test_season, region=cfg.region,
                         n_queries=cfg.n_qs, gamma=cfg.gamma,
                         window_size=cfg.window_size, root=data_root)
    _, _, x_te, y_te, scaler = dc(run_backward=True, no_qs_in_output=True)
    t = jnp.arange(cfg.window_size + cfg.gamma + 1, dtype=jnp.float32) / 7.0
    y_pred = trainer.forecast(x_te, t, n_samples=128)
    metrics = evaluate_forecast(
        np.asarray(y_pred), np.asarray(y_te)[:, : len(t)],
        np.asarray(scaler), window_size=cfg.window_size,
        test_season=cfg.test_season)
    return metrics, train_seconds


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tree", default="/tmp/h2h")
    ap.add_argument("--out", default="docs/head_to_head")
    ap.add_argument("--regions", nargs="+", default=["US", "hhs"])
    ap.add_argument("--models", nargs="+", default=["CONN", "UONN", "SONN"])
    ap.add_argument("--seasons", nargs="+", type=int, default=[2016])
    ap.add_argument("--epochs", type=int, default=None,
                    help="default: the per-region reference budget")
    ap.add_argument("--window", type=int, default=15)
    ap.add_argument("--gamma", type=int, default=28)
    ap.add_argument("--nums", nargs="+", type=int, default=[1],
                    help="replicate seeds (reference 'num' column)")
    ap.add_argument("--sides", nargs="+", default=["torch", "fiude"],
                    choices=["torch", "fiude"])
    ap.add_argument("--resume", action="store_true",
                    help="skip (framework, region, ode, season, num) cells "
                         "already present in the output CSV")
    ap.add_argument("--transfer", action="store_true",
                    help="also run the CONN->UONN_pre transfer recipe "
                         "(requires CONN in --models)")
    ap.add_argument("--torch-threads", type=int, default=1)
    ap.add_argument("--weights-root", default="/tmp/h2h_runs")
    ap.add_argument("--no-fused", action="store_true")
    ap.add_argument("--no-padded", action="store_true",
                    help="exact staged curriculum (one re-trace per stage) "
                         "instead of the masked single-compilation one")
    ap.add_argument("--platform", default="ambient",
                    choices=["ambient", "cpu"],
                    help="JAX platform for the fiude side. 'cpu' makes the "
                         "accuracy cells immune to axon tunnel outages "
                         "(identical recipe/accuracy, XLA scan path; the "
                         "wall-clock column then measures single-host CPU). "
                         "'ambient' uses the machine default (axon TPU here) "
                         "and serializes through the chip lock.")
    args = ap.parse_args()

    # persistent compilation cache: repeated configs (and reruns) skip the
    # multi-minute remote Mosaic compiles entirely
    import jax
    if args.platform == "cpu":
        # env vars alone don't override this machine's sitecustomize pin;
        # the config knob must be set before backend init (see CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    tree = ensure_tree(os.path.abspath(args.tree))
    out = os.path.abspath(args.out)
    fused = not args.no_fused and args.platform != "cpu"

    import contextlib

    def maybe_chip_lock():
        # fiude-on-TPU cells serialize against other chip jobs (bench,
        # sweeps); the CPU platform needs no lock.  Bounded wait: if a
        # long-running sweep holds the chip, raising Timeout fails this
        # invocation so the queue's retry re-probes and falls back to CPU
        # instead of blocking behind a multi-hour holder.
        if args.platform == "ambient":
            from fiude_tpu.utils.chiplock import chip_lock
            return chip_lock(timeout=1800)
        return contextlib.nullcontext()

    def row_exists(framework: str, region: str, ode_label: str, season: int,
                   num: int) -> bool:
        if not os.path.exists(out + ".csv"):
            return False
        import pandas as pd
        df = pd.read_csv(out + ".csv", index_col=0)
        if df.empty:
            return False
        hit = df[(df["framework"] == framework) & (df["region"] == region)
                 & (df["ode_name"] == ode_label)
                 & (df["test_season"] == season) & (df["num"] == num)]
        return len(hit) > 0

    def have_row(framework: str, region: str, ode_label: str, season: int,
                 num: int) -> bool:
        return args.resume and row_exists(framework, region, ode_label,
                                          season, num)

    def have_weights(prefix: str) -> bool:
        # all three state-dict parts, not just any `prefix*` match (the
        # sidecar norms.txt would otherwise mask a partial wipe)
        return all(_glob.glob(prefix + part + ".*")
                   for part in ("enc", "ode", "dec"))

    def record(cfg: ExperimentConfig, framework: str, ode_label: str,
               metrics, secs: float):
        variables = {"framework": framework, "region": cfg.region,
                     "ode_name": ode_label, "test_season": cfg.test_season,
                     "epochs": cfg.epochs, "window_size": cfg.window_size,
                     "gamma": cfg.gamma, "latent_dim": cfg.latent_dim,
                     "num": cfg.num}
        platform = ("cpu-1thread" if framework == "torch" else
                    ("cpu" if args.platform == "cpu" else "tpu"))
        upsert_results_row(out, variables,
                           {**metrics, "train_seconds": round(secs, 1),
                            "platform": platform})
        nlls = [v for k, v in metrics.items() if not k.startswith("skill")]
        print(f"[{framework}] {ode_label} {cfg.region} {cfg.test_season}: "
              f"mean NLL {np.mean(nlls):.3f}, {secs:.0f}s", flush=True)

    for region in args.regions:
        epochs = args.epochs or REGION_INFO[region]["epochs"]
        for season in args.seasons:
            for num in args.nums:
                conn_prefix = {}
                for ode_name in args.models:
                    cfg = ExperimentConfig(
                        region=region, ode_name=ode_name, test_season=season,
                        epochs=epochs, window_size=args.window,
                        gamma=args.gamma, num=num)
                    for side in args.sides:
                        if ode_name == "CONN":
                            conn_prefix[side] = (
                                os.path.join(args.weights_root, "torch",
                                             cfg.key)
                                if side == "torch" else
                                os.path.join(args.weights_root, "weights",
                                             cfg.key))
                        if have_row(side, region, ode_name, season, num):
                            print(f"[skip] {side} {ode_name} {region} "
                                  f"{season} num={num}", flush=True)
                            continue
                        if side == "torch":
                            m, secs = train_torch_config(
                                tree, cfg, weights_root=args.weights_root,
                                threads=args.torch_threads)
                        else:
                            with maybe_chip_lock():
                                m, secs = train_fiude_config(
                                    tree, cfg, weights_root=args.weights_root,
                                    fused=fused,
                                    padded=not args.no_padded,
                                    seed=num)
                        record(cfg, side, ode_name, m, secs)
                if args.transfer and "CONN" in args.models:
                    cfg = ExperimentConfig(
                        region=region, ode_name="UONN", test_season=season,
                        epochs=epochs, window_size=args.window,
                        gamma=args.gamma, num=num)
                    for side in args.sides:
                        if side not in conn_prefix:
                            continue
                        if have_row(side, region, "UONN_pre", season, num):
                            print(f"[skip] {side} UONN_pre {region} "
                                  f"{season} num={num}", flush=True)
                            continue
                        if not have_weights(conn_prefix[side]):
                            # The CONN row can predate a reboot that wiped
                            # the weights under --weights-root; regenerate
                            # the prerequisite.  Only publish the regen
                            # metrics when no row exists yet — a regen on a
                            # different platform/fused setting must never
                            # silently overwrite an already-published cell.
                            conn_cfg = ExperimentConfig(
                                region=region, ode_name="CONN",
                                test_season=season, epochs=epochs,
                                window_size=args.window, gamma=args.gamma,
                                num=num)
                            print(f"[regen] {side} CONN weights for "
                                  f"{region} {season} num={num}", flush=True)
                            if side == "torch":
                                m0, s0 = train_torch_config(
                                    tree, conn_cfg,
                                    weights_root=args.weights_root,
                                    threads=args.torch_threads)
                            else:
                                with maybe_chip_lock():
                                    m0, s0 = train_fiude_config(
                                        tree, conn_cfg,
                                        weights_root=args.weights_root,
                                        fused=fused,
                                        padded=not args.no_padded,
                                        seed=num)
                            if row_exists(side, region, "CONN", season, num):
                                print(f"[regen] weights restored; published "
                                      f"CONN row left untouched", flush=True)
                            else:
                                record(conn_cfg, side, "CONN", m0, s0)
                        if side == "torch":
                            m, secs = train_torch_config(
                                tree, cfg, weights_root=args.weights_root,
                                transfer_from=conn_prefix[side],
                                threads=args.torch_threads)
                        else:
                            with maybe_chip_lock():
                                m, secs = train_fiude_config(
                                    tree, cfg, weights_root=args.weights_root,
                                    transfer_from=conn_prefix[side],
                                    fused=fused, seed=num)
                        record(cfg, side, "UONN_pre", m, secs)


if __name__ == "__main__":
    main()
