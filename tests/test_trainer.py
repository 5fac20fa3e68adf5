"""Trainer semantics: end-to-end training, grad-skip rule, pre-train,
checkpoints, transfer, warm-up."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiude_tpu.data.loader import ArrayLoader
from fiude_tpu.data.synthetic import synthetic_dataset
from fiude_tpu.models import UDEForecaster
from fiude_tpu.models.vae import UDEForecasterParams
from fiude_tpu.models.rhs import SIRRatesParams
from fiude_tpu.train import (
    LossConfig, TRAINING_INFO, Trainer, load_params, save_params,
)


@pytest.fixture(scope="module")
def tiny_data():
    x_tr, y_tr, x_te, y_te, scaler = synthetic_dataset(
        n_regions=1, n_qs=3, window_size=7, gamma=14, lag=5,
        n_seasons=2, season_len=80, seed=0)
    return x_tr[:48], y_tr[:48], x_te[:8], y_te[:8], scaler


def tiny_model(ode_name="Fp"):
    return UDEForecaster.build(
        n_regions=1, latent_dim=6, n_qs=3, ode_name=ode_name,
        enc_params={"q_sizes": (16,), "ff_sizes": (12,)},
        ode_params={"net_sizes": (12, 12), "aug_net_sizes": (12, 12)})


def make_trainer(ode_name="Fp", **kwargs):
    loss_cfg = TRAINING_INFO["CONN" if ode_name == "Fp" else "UONN"]
    return Trainer(tiny_model(ode_name), loss_cfg=loss_cfg, len_tr=48, **kwargs)


class TestKeyChain:
    def test_next_keys_matches_sequential_next_key(self):
        """The batched epoch chain (one compiled scan) must be bit-identical
        to per-batch next_key() — the population-parity and seed-reproduce
        guarantees depend on it."""
        a = make_trainer()
        b = make_trainer()
        batched = a.next_keys(5)
        singles = np.stack([np.asarray(b.next_key()) for _ in range(5)])
        np.testing.assert_array_equal(batched, singles)
        # the carried key advanced identically too
        np.testing.assert_array_equal(np.asarray(a.next_key()),
                                      np.asarray(b.next_key()))


class TestTraining:
    def test_loss_decreases(self, tiny_data):
        x_tr, y_tr, x_te, y_te, scaler = tiny_data
        trainer = make_trainer(seed=0)
        trainer.setup_training(lr=1e-2)
        loader = ArrayLoader(x_tr, y_tr, batch_size=16, seed=0)
        t = jnp.arange(0, 15, dtype=jnp.float32) / 7.0
        eval_pts = np.arange(0, 15, 7)

        trainer.train(loader, t, epochs=8, eval_pts=eval_pts,
                      n_samples=8, grad_lim=5000)
        losses = [h["loss"] for h in trainer.history.epoch_history]
        assert losses[-1] < losses[0]
        assert all(np.isfinite(l) for l in losses)

    def test_metrics_keys(self, tiny_data):
        x_tr, y_tr, *_ = tiny_data
        trainer = make_trainer(ode_name="FaFp", seed=1)
        trainer.setup_training(lr=1e-3)
        loader = ArrayLoader(x_tr, y_tr, batch_size=16, seed=0)
        t = jnp.arange(0, 8, dtype=jnp.float32) / 7.0
        trainer.train(loader, t, epochs=1, eval_pts=np.arange(0, 8, 7),
                      n_samples=4, grad_lim=5000)
        ep = trainer.history.epoch_history[-1]
        assert {"loss", "nll", "kl_latent", "kl_params", "Fa_norm",
                "reg_loss", "grad_norm", "kl_w"} <= set(ep)

    def test_grad_skip_rule(self, tiny_data):
        """grad_lim=0 after epoch 3: steps apply only when skip_count hits 4."""
        x_tr, y_tr, *_ = tiny_data
        trainer = make_trainer(seed=2)
        trainer.setup_training(lr=1e-3)
        loader = ArrayLoader(x_tr[:16], y_tr[:16], batch_size=16, seed=0)
        t = jnp.arange(0, 8, dtype=jnp.float32) / 7.0
        ev = np.arange(0, 8, 7)

        # epochs 0..3 always apply (epoch <= 3)
        trainer.train(loader, t, epochs=4, eval_pts=ev, n_samples=4,
                      grad_lim=0.0)
        assert int(trainer.state.skip_count) == 0
        p_before = trainer.state.params
        # epoch 4: one batch -> skipped (skip_count 1)
        trainer.train(loader, t, epochs=1, eval_pts=ev, n_samples=4,
                      grad_lim=0.0)
        assert int(trainer.state.skip_count) == 1
        unchanged = jax.tree.map(
            lambda a, b: bool(jnp.all(a == b)), p_before, trainer.state.params)
        assert all(jax.tree.leaves(unchanged))
        # each train() call RESETS the counter (reference lib/VAE.py:250):
        # 4 epochs in a fresh call -> 4 skips, no forced apply yet
        trainer.train(loader, t, epochs=4, eval_pts=ev, n_samples=4,
                      grad_lim=0.0)
        assert int(trainer.state.skip_count) == 4
        unchanged = jax.tree.map(
            lambda a, b: bool(jnp.all(a == b)), p_before, trainer.state.params)
        assert all(jax.tree.leaves(unchanged))
        # 5 epochs in ONE call: 4 skips then a forced apply on the 5th
        trainer.train(loader, t, epochs=5, eval_pts=ev, n_samples=4,
                      grad_lim=0.0)
        assert int(trainer.state.skip_count) == 0
        changed = jax.tree.map(
            lambda a, b: bool(jnp.all(a == b)), p_before, trainer.state.params)
        assert not all(jax.tree.leaves(changed))

    def test_pre_train_reduces_klz(self, tiny_data):
        x_tr, y_tr, *_ = tiny_data
        trainer = make_trainer(seed=3)
        trainer.init_params()
        loader = ArrayLoader(x_tr, y_tr, batch_size=16, seed=0)

        from fiude_tpu.train.losses import kl_z_loss

        def measure(params):
            mean, std = trainer.model.encoder.apply(params.enc, jnp.asarray(x_tr))
            return float(kl_z_loss(mean, std, latent_dim=6, len_tr=48))

        before = measure(trainer.params)
        trainer.pre_train(loader, epochs=5, lr=1e-2)
        after = measure(trainer.params)
        assert after < before

    def test_validation_metrics(self, tiny_data):
        x_tr, y_tr, x_te, y_te, scaler = tiny_data
        trainer = make_trainer(seed=4)
        trainer.setup_training(lr=1e-3)
        t_full = jnp.arange(0, 20, dtype=jnp.float32) / 7.0
        loader = ArrayLoader(x_tr[:16], y_tr[:16], batch_size=16, seed=0)
        trainer.train(loader, t_full, epochs=1, eval_pts=np.arange(0, 15, 7),
                      n_samples=4, grad_lim=5000,
                      validate={"x_test": x_te, "y_test": y_te[:, :20],
                                "t": t_full, "scaler": scaler,
                                "n_samples": 8, "tail": 5})
        ep = trainer.history.epoch_history[-1]
        assert np.isfinite(ep["forecast_nll"]) and np.isfinite(ep["all_nll"])

    def test_warmup_lr(self, tiny_data):
        x_tr, y_tr, *_ = tiny_data
        trainer = make_trainer(seed=5)
        trainer.setup_training(lr=1.0)
        loader = ArrayLoader(x_tr[:16], y_tr[:16], batch_size=16, seed=0)
        t = jnp.arange(0, 8, dtype=jnp.float32) / 7.0
        trainer.train(loader, t, epochs=1, eval_pts=np.arange(0, 8, 7),
                      n_samples=4, warmup=True)
        # reference warm_up_lr(0) = 1e-3 * 1/10
        lr = float(trainer.state.opt_state.hyperparams["learning_rate"])
        assert lr == pytest.approx(1e-4)


class TestAdaptiveSolverTraining:
    """VERDICT item 3: adaptive methods must work with aux-requiring loss
    configs (kl_p / fa_norm) instead of crashing on ``aux[\"rates\"]``."""

    def test_dopri5_with_kl_p_and_fa_norm(self, tiny_data):
        x_tr, y_tr, *_ = tiny_data
        model = UDEForecaster.build(
            n_regions=1, latent_dim=6, n_qs=3, ode_name="FaFp",
            enc_params={"q_sizes": (16,), "ff_sizes": (12,)},
            ode_params={"net_sizes": (12, 12), "aug_net_sizes": (12, 12)},
            method="dopri5")
        trainer = Trainer(model, loss_cfg=TRAINING_INFO["UONN"],
                          len_tr=48, seed=11)
        trainer.setup_training(lr=1e-3)
        loader = ArrayLoader(x_tr[:16], y_tr[:16], batch_size=16, seed=0)
        t = jnp.arange(0, 8, dtype=jnp.float32) / 7.0
        trainer.train(loader, t, epochs=1, eval_pts=np.arange(0, 8, 7),
                      n_samples=4, grad_lim=5000)
        ep = trainer.history.epoch_history[-1]
        assert np.isfinite(ep["loss"])
        assert np.isfinite(ep["kl_params"]) and np.isfinite(ep["Fa_norm"])

    def test_adaptive_aux_grid_shape(self, tiny_data):
        """Adaptive aux is evaluated at the accepted output grid: leading
        dim (T-1,) matching the padded-curriculum time_mask."""
        x_tr, *_ = tiny_data
        model = UDEForecaster.build(
            n_regions=1, latent_dim=6, n_qs=3, ode_name="Fp",
            enc_params={"q_sizes": (16,), "ff_sizes": (12,)},
            ode_params={"net_sizes": (12, 12)}, method="tsit5")
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(x_tr[:4])
        t = jnp.arange(0, 5, dtype=jnp.float32) / 7.0
        eps = model.sample_eps(jax.random.PRNGKey(1), 4, 2)
        _, extras = model.apply(params, x, t, eps)
        assert extras.aux["rates"].shape[0] == t.shape[0] - 1

    def test_bayes_adaptive_rejected(self, tiny_data):
        x_tr, *_ = tiny_data
        model = UDEForecaster.build(
            n_regions=1, latent_dim=6, n_qs=3, ode_name="Bayes_Fp",
            enc_params={"q_sizes": (16,), "ff_sizes": (12,)},
            ode_params={"net_sizes": (12, 12)}, method="dopri5")
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(x_tr[:4])
        t = jnp.arange(0, 5, dtype=jnp.float32) / 7.0
        eps = model.sample_eps(jax.random.PRNGKey(1), 4, 2)
        with pytest.raises(ValueError, match="adaptive"):
            model.apply(params, x, t, eps)


class TestCheckpointing:
    def test_roundtrip(self, tmp_path, tiny_data):
        trainer = make_trainer(seed=6)
        trainer.init_params()
        prefix = str(tmp_path / "run_")
        save_params(prefix, trainer.params)
        for part in ("enc", "ode", "dec"):
            assert os.path.exists(f"{prefix}{part}.npz")

        trainer2 = make_trainer(seed=7)
        template = trainer2.init_params()
        loaded = load_params(template, prefix)
        same = jax.tree.map(lambda a, b: bool(jnp.all(a == b)),
                            loaded, trainer.params)
        assert all(jax.tree.leaves(same))

    def test_conn_to_uonn_transfer(self, tmp_path):
        """CONN -> UONN: enc/dec AND the fp_net transfer; aug_net stays fresh."""
        conn = make_trainer("Fp", seed=8)
        conn.init_params()
        prefix = str(tmp_path / "conn_")
        save_params(prefix, conn.params)

        uonn = make_trainer("FaFp", seed=9)
        uonn.init_params()
        aug_before = uonn.params.ode.aug_net
        loaded = load_params(uonn.params, prefix)

        same_enc = jax.tree.map(lambda a, b: bool(jnp.all(a == b)),
                                loaded.enc, conn.params.enc)
        assert all(jax.tree.leaves(same_enc))
        same_fp = jax.tree.map(lambda a, b: bool(jnp.all(a == b)),
                               loaded.ode.fp_net, conn.params.ode.fp_net)
        assert all(jax.tree.leaves(same_fp))
        same_aug = jax.tree.map(lambda a, b: bool(jnp.all(a == b)),
                                loaded.ode.aug_net, aug_before)
        assert all(jax.tree.leaves(same_aug))

    def test_best_loss_checkpoint(self, tmp_path, tiny_data):
        x_tr, y_tr, *_ = tiny_data
        trainer = make_trainer(seed=10, chkpt_prefix=str(tmp_path / "ck_"))
        trainer.setup_training(lr=1e-3)
        loader = ArrayLoader(x_tr[:16], y_tr[:16], batch_size=16, seed=0)
        t = jnp.arange(0, 8, dtype=jnp.float32) / 7.0
        trainer.train(loader, t, epochs=2, eval_pts=np.arange(0, 8, 7),
                      n_samples=4, checkpoint=True)
        assert os.path.exists(str(tmp_path / "ck_chkpt_enc.npz"))
