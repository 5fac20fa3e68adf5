"""Padded curriculum must reproduce the exact-horizon loss/gradients."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiude_tpu.data.synthetic import synthetic_dataset
from fiude_tpu.data.loader import ArrayLoader
from fiude_tpu.models import UDEForecaster
from fiude_tpu.models.vae import ForwardExtras
from fiude_tpu.train import TRAINING_INFO, Trainer
from fiude_tpu.train.losses import compute_loss

RNG = np.random.default_rng(0)


def make_model():
    return UDEForecaster.build(
        n_regions=2, latent_dim=6, n_qs=3, ode_name="FaFp",
        enc_params={"q_sizes": (12,), "ff_sizes": (8,)},
        ode_params={"net_sizes": (10, 10), "aug_net_sizes": (10, 10)})


class TestMaskedLossEquivalence:
    @pytest.mark.parametrize("stage", [2, 3, 5])
    def test_padded_equals_exact(self, stage):
        """Loss on the full grid with masks == loss on the truncated grid."""
        model = make_model()
        params = model.init(jax.random.PRNGKey(0))
        K = 5
        x = jnp.asarray(RNG.uniform(0, 1, (4, 10, 8)).astype(np.float32))
        eps = jnp.asarray(RNG.standard_normal((3, 4, 2, 5)).astype(np.float32))
        t_full = jnp.arange(K, dtype=jnp.float32)
        y_full = jnp.asarray(RNG.uniform(0, 1, (4, K, 2)).astype(np.float32))
        cfg = TRAINING_INFO["UONN"]

        # exact: truncated grid
        y_ex, ex_extras = model.apply(params, x, t_full[:stage], eps)
        loss_ex, m_ex = compute_loss(cfg, y_ex, y_full[:, :stage], ex_extras,
                                     kl_w=0.7, latent_dim=6, len_tr=130)

        # padded: full grid + masks
        y_pd, pd_extras = model.apply(params, x, t_full, eps)
        eval_mask = jnp.asarray((np.arange(K) < stage).astype(np.float32))
        time_mask = jnp.asarray((np.arange(K - 1) < stage - 1).astype(np.float32))
        loss_pd, m_pd = compute_loss(cfg, y_pd, y_full, pd_extras,
                                     kl_w=0.7, latent_dim=6, len_tr=130,
                                     time_mask=time_mask, eval_mask=eval_mask)

        assert float(loss_pd) == pytest.approx(float(loss_ex), rel=1e-4)
        for k in ("nll", "kl_params", "Fa_norm", "reg_loss", "kl_latent"):
            assert float(m_pd[k]) == pytest.approx(float(m_ex[k]), rel=1e-4), k

    def test_padded_gradients_match(self):
        model = make_model()
        params = model.init(jax.random.PRNGKey(1))
        stage, K = 3, 5
        x = jnp.asarray(RNG.uniform(0, 1, (4, 10, 8)).astype(np.float32))
        eps = jnp.asarray(RNG.standard_normal((3, 4, 2, 5)).astype(np.float32))
        t_full = jnp.arange(K, dtype=jnp.float32)
        y_full = jnp.asarray(RNG.uniform(0, 1, (4, K, 2)).astype(np.float32))
        cfg = TRAINING_INFO["UONN"]

        def loss_exact(p):
            y, ex = model.apply(p, x, t_full[:stage], eps)
            return compute_loss(cfg, y, y_full[:, :stage], ex, kl_w=0.7,
                                latent_dim=6, len_tr=130)[0]

        def loss_padded(p):
            y, ex = model.apply(p, x, t_full, eps)
            em = jnp.asarray((np.arange(K) < stage).astype(np.float32))
            tm = jnp.asarray((np.arange(K - 1) < stage - 1).astype(np.float32))
            return compute_loss(cfg, y, y_full, ex, kl_w=0.7, latent_dim=6,
                                len_tr=130, time_mask=tm, eval_mask=em)[0]

        g_ex = jax.grad(loss_exact)(params)
        g_pd = jax.grad(loss_padded)(params)
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))
                               / (jnp.max(jnp.abs(a)) + 1e-8)), g_ex, g_pd)
        assert max(jax.tree.leaves(diffs)) < 1e-3


class TestPaddedTraining:
    def test_runs_and_single_shape(self):
        x_tr, y_tr, *_ = synthetic_dataset(
            n_regions=1, n_qs=3, window_size=7, gamma=28, lag=5,
            n_seasons=2, season_len=100, seed=0)
        model = UDEForecaster.build(
            n_regions=1, latent_dim=6, n_qs=3, ode_name="FaFp",
            enc_params={"q_sizes": (12,), "ff_sizes": (8,)},
            ode_params={"net_sizes": (8, 8), "aug_net_sizes": (8, 8)})
        trainer = Trainer(model, loss_cfg=TRAINING_INFO["UONN"], len_tr=32)
        trainer.setup_training(lr=1e-3)
        loader = ArrayLoader(x_tr[:32], y_tr[:32], batch_size=32, seed=0)
        t = jnp.arange(0, 36, dtype=jnp.float32) / 7.0
        eval_all = np.arange(0, 36, 7)  # 6 weekly points -> 5 stages
        trainer.train_curriculum_padded(loader, t, eval_all,
                                        epochs_per_stage=1, n_samples=4)
        assert len(trainer.history.epoch_history) == 5
        assert all(np.isfinite(h["loss"])
                   for h in trainer.history.epoch_history)
