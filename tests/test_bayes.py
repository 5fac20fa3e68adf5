"""Bayesian variational RHS: layer math, KL, fresh per-eval noise, training."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiude_tpu.models import UDEForecaster
from fiude_tpu.models.bayes import (
    DenseVariationalParams, dense_variational, init_dense_variational,
    variational_kl,
)
from fiude_tpu.data.loader import ArrayLoader
from fiude_tpu.data.synthetic import synthetic_dataset
from fiude_tpu.train import TRAINING_INFO, Trainer

RNG = np.random.default_rng(0)


class TestDenseVariational:
    def test_zero_std_is_deterministic_linear(self):
        p = init_dense_variational(jax.random.PRNGKey(0), 6, 4)
        p = p._replace(w_std=jnp.zeros_like(p.w_std),
                       b_std=jnp.zeros_like(p.b_std))
        x = jnp.asarray(RNG.standard_normal((3, 6)).astype(np.float32))
        y1 = dense_variational(p, x, jax.random.PRNGKey(1))
        y2 = dense_variational(p, x, jax.random.PRNGKey(2))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
        np.testing.assert_allclose(np.asarray(y1),
                                   np.asarray(x @ p.w_mean + p.b_mean),
                                   rtol=1e-6)

    def test_noise_varies_with_key(self):
        p = init_dense_variational(jax.random.PRNGKey(0), 6, 4)
        x = jnp.ones((2, 6))
        y1 = dense_variational(p, x, jax.random.PRNGKey(1))
        y2 = dense_variational(p, x, jax.random.PRNGKey(2))
        assert not np.allclose(np.asarray(y1), np.asarray(y2))

    def test_variational_kl_vs_torch(self):
        torch = pytest.importorskip("torch")
        p = init_dense_variational(jax.random.PRNGKey(0), 5, 3)
        got = float(variational_kl((p,), prior_std=0.1))

        q_w = torch.distributions.Normal(
            torch.tensor(np.asarray(p.w_mean)),
            torch.tensor(np.abs(np.asarray(p.w_std))))
        q_b = torch.distributions.Normal(
            torch.tensor(np.asarray(p.b_mean)),
            torch.tensor(np.abs(np.asarray(p.b_std))))
        pw = torch.distributions.Normal(
            torch.zeros(5, 3), 0.1 * torch.ones(5, 3))
        pb = torch.distributions.Normal(torch.zeros(3), 0.1 * torch.ones(3))
        want = float((torch.distributions.kl_divergence(q_w, pw).mean()
                      + torch.distributions.kl_divergence(q_b, pb).mean()) / 2)
        assert got == pytest.approx(want, rel=1e-5)


class TestBayesForward:
    def test_forward_and_fresh_noise_per_eval(self):
        model = UDEForecaster.build(
            n_regions=1, latent_dim=6, n_qs=3, ode_name="UONNb",
            enc_params={"q_sizes": (8,), "ff_sizes": (8,)},
            ode_params={"net_sizes": (8, 8), "aug_net_sizes": (8, 8),
                        "prior_std": 0.05})
        assert model.is_bayes
        assert model.ode.prior_std == 0.05
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(RNG.uniform(0, 1, (2, 10, 4)).astype(np.float32))
        eps = jnp.asarray(RNG.standard_normal((3, 2, 1, 5)).astype(np.float32))
        t = jnp.arange(4, dtype=jnp.float32)

        y1, _ = model.apply(params, x, t, eps, rng=jax.random.PRNGKey(1))
        y2, _ = model.apply(params, x, t, eps, rng=jax.random.PRNGKey(2))
        y1b, _ = model.apply(params, x, t, eps, rng=jax.random.PRNGKey(1))
        assert not np.allclose(np.asarray(y1), np.asarray(y2))  # noise matters
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y1b))  # reproducible

    def test_training_smoke_with_ode_kl(self):
        x_tr, y_tr, *_ = synthetic_dataset(
            n_regions=1, n_qs=3, window_size=7, gamma=14, lag=5,
            n_seasons=2, season_len=80, seed=0)
        model = UDEForecaster.build(
            n_regions=1, latent_dim=6, n_qs=3, ode_name="UONNb",
            enc_params={"q_sizes": (12,), "ff_sizes": (8,)},
            ode_params={"net_sizes": (8, 8), "aug_net_sizes": (8, 8)})
        trainer = Trainer(model, loss_cfg=TRAINING_INFO["UONNb"], len_tr=32,
                          ode_kl_w=1 / 153, seed=0)
        trainer.setup_training(lr=1e-3)
        loader = ArrayLoader(x_tr[:32], y_tr[:32], batch_size=16, seed=0)
        t = jnp.arange(0, 8, dtype=jnp.float32) / 7.0
        trainer.train(loader, t, epochs=2, eval_pts=np.arange(0, 8, 7),
                      n_samples=4, grad_lim=5000)
        ep = trainer.history.epoch_history[-1]
        assert "ode_kl" in ep and np.isfinite(ep["ode_kl"])
        assert np.isfinite(ep["loss"])
