"""Experiment recipes: curriculum sweep unit, transfer ramp, tuning worker."""
import os

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from fiude_tpu.data.loader import ArrayLoader
from fiude_tpu.data.synthetic import synthetic_dataset
from fiude_tpu.models import UDEForecaster
from fiude_tpu.train import TRAINING_INFO, Trainer
from fiude_tpu.train.experiment import (
    adaptive_curriculum_train, run_experiment, run_transfer, run_tuning_worker,
)
from fiude_tpu.utils.config import ExperimentConfig, REGION_INFO


SMALL_REGION = {
    "n_regions": 1, "latent_dim": 6, "n_qs": 3,
    "ode_params": {"net_sizes": (10, 10), "aug_net_sizes": (10, 10)},
    "dec_params": {},
    "enc_params": {"q_sizes": (12,), "ff_sizes": (8,)},
    "epochs": 8,
}


@pytest.fixture(autouse=True)
def small_region_preset():
    REGION_INFO["tiny"] = SMALL_REGION
    yield
    REGION_INFO.pop("tiny", None)


def tiny_cfg(**kw):
    base = dict(region="tiny", ode_name="CONN", test_season=2016, epochs=8,
                window_size=7, gamma=28, latent_dim=6, num=1,
                batch_size=16, n_samples=4)
    base.update(kw)
    return ExperimentConfig(**base)


class TestRunExperiment:
    def test_curriculum_sweep_unit(self, tmp_path):
        cfg = tiny_cfg()
        out = run_experiment(
            cfg, synthetic=True, weights_root=str(tmp_path),
            results_file=str(tmp_path / "results_table"))
        # curriculum = 4 stages x 2 epochs
        assert len(out["history"]) == 8
        assert np.isfinite(out["history"][-1]["loss"])
        # weights + norms + results written
        assert os.path.exists(str(tmp_path / "weights" / cfg.key) + "enc.npz")
        assert os.path.exists(
            str(tmp_path / "norms" / cfg.key) + "norms.txt")
        df = pd.read_csv(str(tmp_path / "results_table.csv"), index_col=0)
        assert len(df) == 1
        assert f"{cfg.test_season} {cfg.window_size + 6}" in df.columns
        assert f"skill {cfg.test_season} 7" in df.columns

    def test_padded_curriculum_mode(self, tmp_path):
        """padded_curriculum=True trains the same schedule through ONE
        compiled step (Trainer.train_curriculum_padded) and records the
        same artifact set."""
        cfg = tiny_cfg(num=2)
        out = run_experiment(
            cfg, synthetic=True, weights_root=str(tmp_path),
            results_file=str(tmp_path / "results_table"),
            padded_curriculum=True)
        assert len(out["history"]) == 8  # 4 stages x 2 epochs
        assert np.isfinite(out["history"][-1]["loss"])
        assert os.path.exists(str(tmp_path / "weights" / cfg.key) + "enc.npz")
        df = pd.read_csv(str(tmp_path / "results_table.csv"), index_col=0)
        assert np.isfinite(df[f"{cfg.test_season} {cfg.window_size + 6}"]).all()

    def test_fused_train_mode(self, tmp_path):
        """fused_train=True routes training backprop through the Pallas
        trajectory kernels (interpret mode on CPU) and stays numerically in
        step with the scan path at the experiment level."""
        out_scan = run_experiment(
            tiny_cfg(num=3), synthetic=True, weights_root=str(tmp_path / "a"))
        out_fused = run_experiment(
            tiny_cfg(num=3), synthetic=True, weights_root=str(tmp_path / "b"),
            fused_train=True)
        assert len(out_fused["history"]) == len(out_scan["history"])
        l_scan = out_scan["history"][0]["loss"]
        l_fused = out_fused["history"][0]["loss"]
        # identical seeds; first-epoch losses differ only by kernel-vs-scan
        # float ordering
        assert l_fused == pytest.approx(l_scan, rel=1e-3)
        assert np.isfinite(out_fused["history"][-1]["loss"])

    def test_transfer_recipe(self, tmp_path):
        conn_cfg = tiny_cfg(ode_name="CONN", epochs=4)
        run_experiment(conn_cfg, synthetic=True, weights_root=str(tmp_path))

        uonn_cfg = tiny_cfg(ode_name="UONN", epochs=4, num=1)
        trainer = run_transfer(
            uonn_cfg,
            load_prefix=str(tmp_path / "weights" / conn_cfg.key),
            synthetic=True, weights_root=str(tmp_path),
            warm_epochs=1, ramp_epochs_each=0, final_epochs=1, n_samples=4)
        assert trainer.fa_w == pytest.approx(1.0)
        assert np.isfinite(trainer.history.epoch_history[-1]["loss"])


class TestAdaptiveCurriculum:
    def test_tmax_grows_on_plateau(self):
        x_tr, y_tr, *_ = synthetic_dataset(
            n_regions=1, n_qs=3, window_size=7, gamma=28, lag=5,
            run_backward=False, n_seasons=2, season_len=80, seed=0)
        model = UDEForecaster.build(
            n_regions=1, latent_dim=6, n_qs=3, ode_name="Fp",
            enc_params={"q_sizes": (12,), "ff_sizes": (8,)},
            ode_params={"net_sizes": (8, 8)})
        trainer = Trainer(model, loss_cfg=TRAINING_INFO["CONN"], len_tr=16)
        trainer.setup_training(lr=1e-3)
        loader = ArrayLoader(x_tr[:16], y_tr[:16], batch_size=16, seed=0)
        tmax = adaptive_curriculum_train(
            trainer, loader, gamma=28, epochs=3, tmax0=5, n_samples=4,
            nll_threshold=1e9, patience=1)  # always-plateau -> grows each epoch
        assert tmax == 7  # 5 + 2 growth steps (first epoch has len(hist)<=patience)

    def test_lr_decays(self):
        x_tr, y_tr, *_ = synthetic_dataset(
            n_regions=1, n_qs=3, window_size=7, gamma=14, lag=5,
            run_backward=False, n_seasons=2, season_len=60, seed=0)
        model = UDEForecaster.build(
            n_regions=1, latent_dim=6, n_qs=3, ode_name="Fp",
            enc_params={"q_sizes": (8,), "ff_sizes": (8,)},
            ode_params={"net_sizes": (8,)})
        trainer = Trainer(model, loss_cfg=TRAINING_INFO["CONN"], len_tr=16)
        trainer.setup_training(lr=1e-3)
        loader = ArrayLoader(x_tr[:16], y_tr[:16], batch_size=16, seed=0)
        adaptive_curriculum_train(trainer, loader, gamma=14, epochs=2,
                                  tmax0=3, n_samples=4, lr_decay=0.5,
                                  lr_floor=1e-5)
        lr = float(trainer.state.opt_state.hyperparams["learning_rate"])
        assert lr == pytest.approx(1e-3 * 0.25)


class TestTuningWorker:
    def test_csv_queue(self, tmp_path):
        csv = str(tmp_path / "validation_scores.csv")
        pd.DataFrame([
            {"a": 1, "started": 0, "score": 10.0},
            {"a": 2, "started": 0, "score": 10.0},
            {"a": 3, "started": 1, "score": 10.0},  # already claimed
        ]).to_csv(csv)

        def evaluate(params):
            if params["a"] == 2:
                raise RuntimeError("boom")
            return params["a"] * 0.5

        n = run_tuning_worker(csv, evaluate)
        assert n == 2
        df = pd.read_csv(csv, index_col=0)
        assert df.loc[0, "score"] == pytest.approx(0.5)
        assert df.loc[1, "score"] == pytest.approx(10.0)  # sentinel on crash
        assert df.loc[2, "score"] == pytest.approx(10.0)  # untouched
        assert (df["started"] == 1).all()


class TestAtomicCSV:
    """A timeout/SIGKILL mid-write must never truncate a shared table
    (observed live: a `timeout`-killed tuning unit left a 0-byte
    validation_scores CSV that crashed every other worker)."""

    def test_replace_not_truncate(self, tmp_path, monkeypatch):
        from fiude_tpu.utils.results import atomic_to_csv

        csv = str(tmp_path / "t.csv")
        pd.DataFrame([{"a": 1}]).to_csv(csv)

        def killed_to_csv(self, path, *a, **k):
            # simulate SIGKILL after the tmp file is opened but before
            # any bytes land: the destination must keep the old content
            open(path, "w").close()
            raise KeyboardInterrupt

        monkeypatch.setattr(pd.DataFrame, "to_csv", killed_to_csv)
        with pytest.raises(KeyboardInterrupt):
            atomic_to_csv(pd.DataFrame([{"a": 2}]), csv)
        monkeypatch.undo()
        df = pd.read_csv(csv, index_col=0)
        assert df.loc[0, "a"] == 1  # old table intact, not 0 bytes

    def test_writes_through(self, tmp_path):
        from fiude_tpu.utils.results import atomic_to_csv

        csv = str(tmp_path / "t.csv")
        atomic_to_csv(pd.DataFrame([{"a": 3}]), csv)
        df = pd.read_csv(csv, index_col=0)
        assert df.loc[0, "a"] == 3
        assert list((tmp_path).glob("*.tmp.*")) == []  # no leftovers on success
