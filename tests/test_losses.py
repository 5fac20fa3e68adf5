"""Loss-stack semantics: annealing schedule, masking, gating, kl terms."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiude_tpu.train.losses import (
    AnnealConfig, LossConfig, TRAINING_INFO, compute_loss, fa_norm_loss,
    kl_annealing, kl_params_loss, kl_z_loss, latent_init_loss, nll_loss,
)


def ref_kl_annealing(step, reset_pos=10000, split=0.5, lower=0.0, upper=1.0,
                     kind="cosine"):
    """Reference formula re-derived (lib/train_functions.py:17-44)."""
    while step > reset_pos:
        step -= reset_pos
    if step >= int(reset_pos * split):
        return upper
    frac = step / int(reset_pos * split)
    if kind == "linear":
        return frac * (upper - lower) + lower
    if kind == "sigmoid":
        return lower + (upper - lower) / (1 + np.exp(-10 * (frac - 0.5)))
    if kind == "cosine":
        return lower + 0.5 * (1 - np.cos(np.pi * frac)) * (upper - lower)


class TestAnnealing:
    @pytest.mark.parametrize("kind", ["linear", "sigmoid", "cosine"])
    def test_matches_reference_formula(self, kind):
        cfg = AnnealConfig(reset_pos=100, split=0.5, kind=kind)
        for step in [1, 10, 49, 50, 51, 99, 100, 101, 150, 199, 200, 201, 350]:
            got = float(kl_annealing(step, cfg))
            want = ref_kl_annealing(step, reset_pos=100, kind=kind)
            assert got == pytest.approx(want, abs=1e-6), f"step={step}"

    def test_disabled_returns_one(self):
        assert float(kl_annealing(7, AnnealConfig(anneal=False))) == 1.0


class TestNLL:
    def test_masking_and_unbiased_std(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        y_pred = rng.standard_normal((4, 8, 5, 2)).astype(np.float32)
        y = rng.standard_normal((4, 5, 2)).astype(np.float32)
        y[0, 2, 1] = -1.0  # masked entry

        tp = torch.tensor(y_pred)
        ty = torch.tensor(y)
        t_nll = -torch.distributions.Normal(tp.mean(1), tp.std(1)).log_prob(ty)
        t_nll = t_nll * (ty != -1).float()
        want = float(t_nll.mean())

        got = float(nll_loss(jnp.asarray(y_pred), jnp.asarray(y)))
        assert got == pytest.approx(want, rel=1e-5)


class TestTerms:
    def test_latent_init_loss(self):
        x = jnp.asarray([[-0.5, 0.5, 1.25], [0.0, 1.0, 2.0]])
        # |−0.5| + |1−1.25| + |1−2| = 0.5 + 0.25 + 1.0
        assert float(latent_init_loss(x)) == pytest.approx(1.75)

    def test_fa_norm_is_frobenius(self):
        fa = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 4, 3))
        assert float(fa_norm_loss(fa)) == pytest.approx(
            float(np.linalg.norm(np.arange(24))), rel=1e-6)

    def test_kl_params_vs_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(2)
        rates = np.abs(rng.standard_normal((6, 4, 12, 3, 2))).astype(np.float32)
        got = float(kl_params_loss(jnp.asarray(rates)))

        t = torch.tensor(rates).reshape(-1, 2)
        q = torch.distributions.Normal(t.mean(0), t.std(0))
        p = torch.distributions.Normal(torch.tensor([0.8, 0.55]),
                                       torch.tensor([0.2, 0.2]))
        want = float(torch.distributions.kl_divergence(p, q).mean())
        assert got == pytest.approx(want, rel=1e-4)

    def test_kl_z_vs_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(3)
        mean = rng.standard_normal((4, 2, 7)).astype(np.float32)
        std = np.abs(rng.standard_normal((4, 2, 7))).astype(np.float32) + 0.1
        got = float(kl_z_loss(jnp.asarray(mean), jnp.asarray(std),
                              latent_dim=8, len_tr=130))

        tm = torch.tensor(mean)
        ts = torch.tensor(std)
        pm = torch.cat([tm[..., :2], torch.zeros_like(tm[..., 2:])], -1)
        pstd = torch.cat([torch.tensor([0.1, 0.01]), torch.ones(5)], 0).expand_as(pm)
        kl = torch.distributions.kl_divergence(
            torch.distributions.Normal(pm, pstd),
            torch.distributions.Normal(tm, ts))
        want = float(kl.sum(-1).mean() / 130)
        assert got == pytest.approx(want, rel=1e-4)


class TestGating:
    def test_training_info_presets(self):
        assert TRAINING_INFO["CONN"].fa_norm == 0.0
        assert TRAINING_INFO["UONN"].fa_norm == pytest.approx(0.1)
        assert not TRAINING_INFO["SONN"].kl_p
        assert not TRAINING_INFO["SONN"].reg_loss

    def test_compute_loss_gates(self):
        from fiude_tpu.models.vae import ForwardExtras
        rng = np.random.default_rng(4)
        B, S, T, R = 2, 4, 3, 1
        y_pred = jnp.asarray(rng.standard_normal((B, S, T, R)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((B, T, R)).astype(np.float32))
        extras = ForwardExtras(
            mean=jnp.asarray(rng.standard_normal((B, R, 7)).astype(np.float32)),
            std=jnp.abs(jnp.asarray(rng.standard_normal((B, R, 7)).astype(np.float32))) + 0.1,
            latent=jnp.asarray(rng.standard_normal((T, B * S, R, 8)).astype(np.float32)),
            aux={"rates": jnp.abs(jnp.asarray(
                     rng.standard_normal((T - 1, 4, B * S, R, 2)).astype(np.float32))),
                 "fa": jnp.asarray(
                     rng.standard_normal((T - 1, 4, B * S, R, 3)).astype(np.float32))},
        )
        loss_all, m_all = compute_loss(
            TRAINING_INFO["UONN"], y_pred, y, extras, kl_w=0.5,
            latent_dim=8, len_tr=130)
        assert set(m_all) >= {"nll", "kl_latent", "kl_params", "Fa_norm",
                              "reg_loss", "loss", "kl_w"}
        loss_sonn, m_sonn = compute_loss(
            TRAINING_INFO["SONN"], y_pred, y, extras, kl_w=0.5,
            latent_dim=8, len_tr=130)
        assert "kl_params" not in m_sonn and "reg_loss" not in m_sonn
        assert float(loss_all) != float(loss_sonn)


class TestAnnealGateSemantics:
    def test_anneal_false_freezes_clock_and_weight(self):
        """Reference lib/VAE.py:148-151: with the anneal gate off, tr_step
        does not advance and kl_w stays at its default 1."""
        import jax.numpy as jnp
        from fiude_tpu.data.synthetic import synthetic_dataset
        from fiude_tpu.data.loader import ArrayLoader
        from fiude_tpu.models import UDEForecaster
        from fiude_tpu.train import LossConfig, Trainer

        x_tr, y_tr, *_ = synthetic_dataset(
            n_regions=1, n_qs=3, window_size=7, gamma=14, lag=5,
            n_seasons=2, season_len=80, seed=0)
        model = UDEForecaster.build(
            n_regions=1, latent_dim=6, n_qs=3, ode_name="Fp",
            enc_params={"q_sizes": (8,), "ff_sizes": (8,)},
            ode_params={"net_sizes": (8,)})
        trainer = Trainer(model, loss_cfg=LossConfig(anneal=False), len_tr=16)
        trainer.setup_training(lr=1e-3)
        loader = ArrayLoader(x_tr[:16], y_tr[:16], batch_size=16, seed=0)
        t = jnp.arange(0, 8, dtype=jnp.float32) / 7.0
        trainer.train(loader, t, epochs=2, eval_pts=np.arange(0, 8, 7),
                      n_samples=4, grad_lim=5000)
        assert int(trainer.state.tr_step) == 0
        assert trainer.history.epoch_history[-1]["kl_w"] == 1.0
