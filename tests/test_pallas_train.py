"""Fused training trajectory kernel (ops/pallas_train.py) vs jax.grad of
the odeint_grid scan path: values, aux, and EVERY cotangent (weights,
initial state, fa_w) must match to float tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiude_tpu.models.rhs import UDE, SIRRates, NeuralAug
from fiude_tpu.ops.integrate import odeint_grid
from fiude_tpu.ops.pallas_train import (
    aux_to_model_layout, cm_permute_traceable, fused_train_trajectory,
    traj_to_model_layout,
)
from fiude_tpu.ops.pallas_ude import to_cm

R, L = 4, 6
NET, AUG = (12, 10), (8,)
B, T = 8, 3
FA_W = 0.7
RNG = np.random.default_rng(0)


def _setup(ode_name):
    if ode_name == "FaFp":
        ode = UDE(n_regions=R, latent_dim=L, net_sizes=NET,
                  aug_net_sizes=AUG)
        has_fp, has_aug = True, True
        n_fp, n_aug = len(NET) + 1, len(AUG) + 1
    elif ode_name == "Fp":
        ode = SIRRates(n_regions=R, latent_dim=L, net_sizes=NET)
        has_fp, has_aug = True, False
        n_fp, n_aug = len(NET) + 1, 0
    else:
        ode = NeuralAug(n_regions=R, latent_dim=L, aug_net_sizes=AUG)
        has_fp, has_aug = False, True
        n_fp, n_aug = 0, len(AUG) + 1
    params = ode.init(jax.random.PRNGKey(1))
    z = jnp.asarray(RNG.uniform(0, 0.4, (B, R, L)).astype(np.float32))
    t = jnp.asarray(np.array([0.0, 0.5, 1.0], np.float32))
    return ode, params, z, t, has_fp, has_aug, n_fp, n_aug


def _fused_outputs(ode, params, z, t, has_fp, has_aug, n_fp, n_aug, fa_w):
    flat = cm_permute_traceable(params, R, L, has_fp=has_fp,
                                has_aug=has_aug)
    traj_h, rates, fa = fused_train_trajectory(
        flat, to_cm(z), fa_w, t[1:] - t[:-1],
        T=len(t), R=R, L=L, n_fp_layers=n_fp, n_aug_layers=n_aug,
        tile_b=8, interpret=True)
    latent = traj_to_model_layout(traj_h, to_cm(z), R, L)
    aux = aux_to_model_layout(rates, fa, len(t), R)
    return latent, aux


def _scan_outputs(ode, params, z, t, fa_w, ode_name):
    if ode_name == "FaFp":
        rhs = lambda s, y: ode.apply(params, s, y, fa_w=fa_w)
    else:
        rhs = lambda s, y: ode.apply(params, s, y)
    latent, aux = odeint_grid(rhs, z, t, method="rk4")
    return latent, aux


def _loss_from(latent, aux):
    """Arbitrary smooth functional touching trajectory and both aux heads
    with distinct weightings so no cotangent path can hide."""
    loss = jnp.sum(jnp.sin(latent) * 1.3) + jnp.sum(latent ** 2) * 0.1
    if "rates" in aux:
        loss = loss + 0.7 * jnp.sum(jnp.cos(aux["rates"])) \
            + 0.2 * jnp.sum(aux["rates"] ** 2)
    if "fa" in aux:
        loss = loss + 0.4 * jnp.sum(jnp.tanh(aux["fa"])) \
            + 0.05 * jnp.sum(aux["fa"] ** 2)
    return loss


@pytest.mark.parametrize("ode_name", ["FaFp", "Fp", "Fa"])
class TestForwardParity:
    def test_trajectory_and_aux(self, ode_name):
        ode, params, z, t, has_fp, has_aug, n_fp, n_aug = _setup(ode_name)
        lat_f, aux_f = _fused_outputs(ode, params, z, t, has_fp, has_aug,
                                      n_fp, n_aug, FA_W)
        lat_s, aux_s = _scan_outputs(ode, params, z, t, FA_W, ode_name)
        np.testing.assert_allclose(np.asarray(lat_f), np.asarray(lat_s),
                                   rtol=2e-5, atol=1e-6)
        # aux layout: odeint_grid gives (T-1, stages, ...) pytree
        for key in aux_f:
            np.testing.assert_allclose(
                np.asarray(aux_f[key]), np.asarray(aux_s[key]),
                rtol=2e-5, atol=1e-6, err_msg=key)


@pytest.mark.parametrize("ode_name", ["FaFp", "Fp", "Fa"])
class TestGradientParity:
    def test_all_cotangents(self, ode_name):
        ode, params, z, t, has_fp, has_aug, n_fp, n_aug = _setup(ode_name)

        def loss_fused(params, z, fa_w):
            lat, aux = _fused_outputs(ode, params, z, t, has_fp, has_aug,
                                      n_fp, n_aug, fa_w)
            return _loss_from(lat, aux)

        def loss_scan(params, z, fa_w):
            lat, aux = _scan_outputs(ode, params, z, t, fa_w, ode_name)
            return _loss_from(lat, aux)

        fa_w = jnp.asarray(FA_W, jnp.float32)
        v_f, g_f = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(
            params, z, fa_w)
        v_s, g_s = jax.value_and_grad(loss_scan, argnums=(0, 1, 2))(
            params, z, fa_w)

        assert float(v_f) == pytest.approx(float(v_s), rel=2e-5)

        # parameter cotangents, leaf by leaf
        flat_f, tree_f = jax.tree.flatten(g_f[0])
        flat_s, tree_s = jax.tree.flatten(g_s[0])
        assert tree_f == tree_s
        for a, b in zip(flat_f, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-6)
        # initial-state cotangent
        np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_s[1]),
                                   rtol=5e-4, atol=5e-6)
        # fa_w cotangent (only the UDE uses it)
        if ode_name == "FaFp":
            assert float(g_f[2]) == pytest.approx(float(g_s[2]), rel=5e-4)

    def test_unused_aux_cotangent(self, ode_name):
        """Loss through the trajectory only — aux cotangents are zeros."""
        ode, params, z, t, has_fp, has_aug, n_fp, n_aug = _setup(ode_name)

        def loss_fused(params):
            lat, _ = _fused_outputs(ode, params, z, t, has_fp, has_aug,
                                    n_fp, n_aug, FA_W)
            return jnp.sum(lat ** 2)

        def loss_scan(params):
            lat, _ = _scan_outputs(ode, params, z, t, FA_W, ode_name)
            return jnp.sum(lat ** 2)

        g_f = jax.grad(loss_fused)(params)
        g_s = jax.grad(loss_scan)(params)
        for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-6)


class TestModelIntegration:
    def test_apply_and_grads_match_scan_model(self):
        """UDEForecaster(fused_train=True) == the scan model: forward
        output, aux pytree, and gradients of a full NLL-style loss."""
        import dataclasses

        from fiude_tpu.models.vae import UDEForecaster

        def build(fused):
            return UDEForecaster.build(
                n_regions=R, latent_dim=L, n_qs=3, ode_name="FaFp",
                enc_params={"q_sizes": (12,), "ff_sizes": (8,)},
                ode_params={"net_sizes": NET, "aug_net_sizes": AUG},
                fused_train=fused)

        m_fused, m_scan = build(True), build(False)
        params = m_scan.init(jax.random.PRNGKey(3))
        x = jnp.asarray(RNG.uniform(0, 1, (4, 10, 16)).astype(np.float32))
        eps = jnp.asarray(RNG.standard_normal((3, 4, R, L - 1))
                          .astype(np.float32))
        t = jnp.arange(4, dtype=jnp.float32) / 7.0

        def loss(model, params, fa_w):
            y, ex = model.apply(params, x, t, eps, fa_w=fa_w)
            out = jnp.sum(y ** 2) + jnp.sum(jnp.sin(ex.latent))
            out = out + jnp.sum(ex.aux["rates"] ** 2) * 0.1
            out = out + jnp.sum(jnp.abs(ex.aux["fa"])) * 0.01
            return out

        fa_w = jnp.asarray(0.8, jnp.float32)
        v_f, g_f = jax.value_and_grad(
            lambda p: loss(m_fused, p, fa_w))(params)
        v_s, g_s = jax.value_and_grad(
            lambda p: loss(m_scan, p, fa_w))(params)
        assert float(v_f) == pytest.approx(float(v_s), rel=2e-5)
        for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-6)

    def test_trainer_step_matches_scan(self):
        """One full jitted Trainer step (loss stack + grad-skip + Adam)
        produces identical metrics and post-step params on both paths."""
        from fiude_tpu.models.vae import UDEForecaster
        from fiude_tpu.train import TRAINING_INFO
        from fiude_tpu.train.trainer import Trainer

        def run(fused):
            model = UDEForecaster.build(
                n_regions=R, latent_dim=L, n_qs=3, ode_name="FaFp",
                enc_params={"q_sizes": (12,), "ff_sizes": (8,)},
                ode_params={"net_sizes": NET, "aug_net_sizes": AUG},
                fused_train=fused)
            tr = Trainer(model=model, loss_cfg=TRAINING_INFO["UONN"],
                         seed=7, len_tr=10)
            tr.init_params(jax.random.PRNGKey(5))
            tr.setup_training(lr=1e-3)
            rng = np.random.default_rng(9)
            x = jnp.asarray(rng.uniform(0, 1, (4, 10, 16))
                            .astype(np.float32))
            y = jnp.asarray(rng.uniform(0, 1, (4, 4, R))
                            .astype(np.float32))
            t = jnp.arange(4, dtype=jnp.float32) / 7.0
            eps = jnp.asarray(rng.standard_normal((3, 4, R, L - 1))
                              .astype(np.float32))
            state, metrics = tr._step_fn(
                tr.state, x, y, t, eps, jnp.asarray(1.0, jnp.float32),
                jnp.asarray(1, jnp.int32), jnp.asarray(5000.0, jnp.float32))
            return {k: float(v) for k, v in metrics.items()}, state.params

        m_f, p_f = run(True)
        m_s, p_s = run(False)
        for k in m_s:
            assert m_f[k] == pytest.approx(m_s[k], rel=2e-4, abs=1e-7), k
        for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("ode_name", ["FaFp", "Fp", "Fa"])
class TestStatsMode:
    """stats_mode: the kernels reduce the masked aux sufficient statistics
    on-core — values and every cotangent must match the streaming path's
    jnp reductions over the full aux tensors."""

    @staticmethod
    def _stats_from_streaming(aux, tmask):
        """Reference reductions over the streaming (stage-ordered) aux."""
        from fiude_tpu.ops.pallas_train import RATE_SHIFT
        out = {}
        if "rates" in aux:
            r = aux["rates"]  # (T-1, 4, B, R, 2)
            m = tmask.reshape(-1, 1, 1, 1, 1)
            d = r - jnp.asarray(RATE_SHIFT, r.dtype)
            out["r1"] = jnp.sum(d * m, axis=(0, 1, 2, 3))
            out["r2"] = jnp.sum(jnp.square(d) * m, axis=(0, 1, 2, 3))
        if "fa" in aux:
            f = aux["fa"]
            m = tmask.reshape(-1, 1, 1, 1, 1)
            out["f2"] = jnp.sum(jnp.square(f) * m)
        return out

    def test_values_and_grads(self, ode_name):
        ode, params, z, t, has_fp, has_aug, n_fp, n_aug = _setup(ode_name)
        tmask = jnp.asarray([1.0, 0.5], jnp.float32)

        def outs_stats(params, z, fa_w):
            flat = cm_permute_traceable(params, R, L, has_fp=has_fp,
                                        has_aug=has_aug)
            traj_h, r1, r2, f2 = fused_train_trajectory(
                flat, to_cm(z), fa_w, t[1:] - t[:-1], stats_mode=True,
                tmask=tmask, T=len(t), R=R, L=L, n_fp_layers=n_fp,
                n_aug_layers=n_aug, tile_b=8, interpret=True)
            lat = traj_to_model_layout(traj_h, to_cm(z), R, L)
            st = {}
            if r1 is not None:
                st["r1"], st["r2"] = r1, r2
            if f2 is not None:
                st["f2"] = f2
            return lat, st

        def outs_stream(params, z, fa_w):
            lat, aux = _scan_outputs(ode, params, z, t, fa_w, ode_name)
            return lat, self._stats_from_streaming(aux, tmask)

        def loss(outs_fn, params, z, fa_w):
            lat, st = outs_fn(params, z, fa_w)
            out = jnp.sum(jnp.sin(lat)) * 1.3
            if "r1" in st:
                out = out + 0.7 * jnp.sum(jnp.cos(st["r1"])) \
                    + 0.2 * jnp.sum(st["r2"] ** 2)
            if "f2" in st:
                out = out + 0.4 * jnp.tanh(st["f2"]) + 0.05 * st["f2"]
            return out

        fa_w = jnp.asarray(FA_W, jnp.float32)
        lat_k, st_k = outs_stats(params, z, fa_w)
        lat_s, st_s = outs_stream(params, z, fa_w)
        np.testing.assert_allclose(np.asarray(lat_k), np.asarray(lat_s),
                                   rtol=2e-5, atol=1e-6)
        assert set(st_k) == set(st_s)
        for k in st_s:
            np.testing.assert_allclose(np.asarray(st_k[k]),
                                       np.asarray(st_s[k]),
                                       rtol=1e-4, atol=1e-5, err_msg=k)

        v_k, g_k = jax.value_and_grad(
            lambda p, zz, fw: loss(outs_stats, p, zz, fw),
            argnums=(0, 1, 2))(params, z, fa_w)
        v_s, g_s = jax.value_and_grad(
            lambda p, zz, fw: loss(outs_stream, p, zz, fw),
            argnums=(0, 1, 2))(params, z, fa_w)
        assert float(v_k) == pytest.approx(float(v_s), rel=2e-5)
        # both sides are f32 with different (equally valid) reduction
        # orders for the moment sums — slightly looser than the streaming
        # parity tests
        for a, b in zip(jax.tree.leaves(g_k[:2]), jax.tree.leaves(g_s[:2])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-5)
        if ode_name == "FaFp":
            assert float(g_k[2]) == pytest.approx(float(g_s[2]), rel=2e-3)


class TestStatsTrainerIntegration:
    def test_trainer_step_matches_scan_with_curriculum(self):
        """Full jitted Trainer step on the stats path (kl_p + fa_norm from
        kernel statistics) vs the scan path, under a padded-curriculum
        time_mask: identical metrics and post-Adam params."""
        from fiude_tpu.models.vae import UDEForecaster
        from fiude_tpu.train import TRAINING_INFO
        from fiude_tpu.train.trainer import Trainer

        def run(fused, stats):
            model = UDEForecaster.build(
                n_regions=R, latent_dim=L, n_qs=3, ode_name="FaFp",
                enc_params={"q_sizes": (12,), "ff_sizes": (8,)},
                ode_params={"net_sizes": NET, "aug_net_sizes": AUG},
                fused_train=fused, fused_stats=stats)
            tr = Trainer(model=model, loss_cfg=TRAINING_INFO["UONN"],
                         seed=7, len_tr=10)
            tr.init_params(jax.random.PRNGKey(5))
            tr.setup_training(lr=1e-3)
            rng = np.random.default_rng(9)
            x = jnp.asarray(rng.uniform(0, 1, (4, 10, 16))
                            .astype(np.float32))
            y = jnp.asarray(rng.uniform(0, 1, (4, 4, R))
                            .astype(np.float32))
            t = jnp.arange(4, dtype=jnp.float32) / 7.0
            eps = jnp.asarray(rng.standard_normal((3, 4, R, L - 1))
                              .astype(np.float32))
            tm = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)
            em = jnp.asarray([1.0, 1.0, 1.0, 0.0], jnp.float32)
            state, metrics = tr._step_fn(
                tr.state, x, y, t, eps, jnp.asarray(1.0, jnp.float32),
                jnp.asarray(1, jnp.int32), jnp.asarray(5000.0, jnp.float32),
                time_mask=tm, eval_mask=em)
            return {k: float(v) for k, v in metrics.items()}, state.params

        m_k, p_k = run(True, True)
        m_s, p_s = run(False, False)
        for k in m_s:
            assert m_k[k] == pytest.approx(m_s[k], rel=2e-4, abs=1e-7), k
        for a, b in zip(jax.tree.leaves(p_k), jax.tree.leaves(p_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
