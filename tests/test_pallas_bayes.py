"""Fused Bayesian trajectory kernel (ops/pallas_bayes.py).

Correctness strategy (the kernel PRNG cannot match jax.random draw-for-draw):

1. zero-noise equivalence with the deterministic fused kernel;
2. injected-noise mode against a pure-JAX oracle that materializes the
   per-evaluation weights in the ORIGINAL (region-major) layout and steps
   RK4(3/8) with the model-math RHS (models/rhs.py) — exercising the full
   mean + z*|std| plumbing through the compartment-major packing;
3. FusedBayesForecaster end-to-end vs UDEForecaster.apply at std=0 (both
   collapse to the deterministic forecast);
4. a TPU-only statistical check that on-core PRNG sampling matches the XLA
   Bayes path in distribution (runs only on real hardware; the Mosaic
   interpreter stubs prng_random_bits to zeros).

Reference semantics: fresh weight noise at every RHS evaluation, shared
across the folded MC/batch ensemble (lib/in_development/models_bayes.py:30-48).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiude_tpu.models.nn import Dense
from fiude_tpu.models.rhs import UDE, UDEParams
from fiude_tpu.models.vae import UDEForecaster
from fiude_tpu.ops.pallas_bayes import (
    FusedBayesForecaster, bayes_cm_weights, fused_bayes_trajectory_decode,
)
from fiude_tpu.ops.pallas_ude import (
    _build_plan, cm_permute, cm_permute_decoder, from_cm,
    fused_trajectory_decode, to_cm,
)

R, L, NQS = 4, 6, 5
NET, AUG = (12, 10), (8,)
N_FP, N_AUG = len(NET) + 1, len(AUG) + 1
FA_W = 0.7


def _model(ode_name="Bayes_FaFp"):
    return UDEForecaster.build(
        n_regions=R, latent_dim=L, n_qs=NQS, ode_name=ode_name,
        enc_params={"q_sizes": (16,), "ff_sizes": (8,),
                    "SIR_scaler": [0.1, 0.05, 1.0]},
        ode_params={"net_sizes": NET, "aug_net_sizes": AUG})


def _kernel_inputs(params, has_aug=True):
    mw, sw = bayes_cm_weights(params.ode, R, L, has_aug=has_aug)
    dw, db = cm_permute_decoder(params.dec, R)
    return mw, sw, dw, db


def _noise_shapes(mw, n_fp, n_aug):
    """Shapes of the kernel's noise inputs, in materialization order."""
    _, mean_arrs = _build_plan(mw, n_fp, n_aug)
    if n_aug:
        w0 = jnp.concatenate([mw[0], mw[2 * n_fp]], axis=1)
        b0 = jnp.concatenate([mw[1], mw[2 * n_fp + 1]], axis=1)
    else:
        w0, b0 = mw[0], mw[1]
    return ([w0[: 3 * R].shape, w0[3 * R:].shape, b0.shape]
            + [a.shape for a in mean_arrs])


def _orig_noise_to_kernel(z_fp, z_aug, n_fp, n_aug):
    """Map per-layer original-layout noise (Dense pytrees) into the kernel's
    injected-noise arrays via the same permutation/packing as the weights
    (valid because the packing is an index map: perm(z*s) = perm(z)*perm(s),
    and the block-diagonal off-blocks have std 0)."""
    from types import SimpleNamespace
    ns = SimpleNamespace(fp_net=z_fp, aug_net=z_aug)
    flat = tuple(cm_permute(ns, R, L, has_aug=n_aug > 0))
    _, arrs = _build_plan(flat, n_fp, n_aug)
    if n_aug:
        w0 = jnp.concatenate([flat[0], flat[2 * n_fp]], axis=1)
        b0 = jnp.concatenate([flat[1], flat[2 * n_fp + 1]], axis=1)
    else:
        w0, b0 = flat[0], flat[1]
    return [w0[: 3 * R], w0[3 * R:], b0] + list(arrs)


class TestZeroNoise:
    def test_matches_deterministic_kernel(self):
        model = _model()
        params = model.init(jax.random.PRNGKey(0))
        mw, sw, dw, db = _kernel_inputs(params)
        rng = np.random.default_rng(0)
        z0 = jnp.asarray(rng.uniform(0, 0.3, (8, R * L)).astype(np.float32))
        T, dt = 4, 0.5
        shapes = _noise_shapes(mw, N_FP, N_AUG)
        zeros = tuple(jnp.zeros((4 * (T - 1),) + s, jnp.float32)
                      for s in shapes)
        yb = fused_bayes_trajectory_decode(
            z0, mw, sw, dw, db, jnp.asarray([0], jnp.int32),
            T=T, dt=dt, R=R, L=L, n_fp_layers=N_FP, n_aug_layers=N_AUG,
            fa_w=FA_W, tile_b=8, interpret=True, noise=zeros)
        yd = fused_trajectory_decode(
            z0, mw, dw, db, T=T, dt=dt, R=R, L=L,
            n_fp_layers=N_FP, n_aug_layers=N_AUG,
            fa_w=FA_W, tile_b=8, interpret=True)
        np.testing.assert_allclose(np.asarray(yb), np.asarray(yd), atol=1e-6)


class TestInjectedNoiseOracle:
    def test_matches_model_math(self):
        """Fresh weights per RK stage, stepped with the model-math RHS."""
        model = _model()
        params = model.init(jax.random.PRNGKey(1))
        mw, sw, dw, db = _kernel_inputs(params)
        T, dt, B = 3, 0.5, 8
        n_evals = 4 * (T - 1)
        rng = np.random.default_rng(42)
        z0_cm = jnp.asarray(
            rng.uniform(0, 0.3, (B, R * L)).astype(np.float32))

        # original-layout noise per eval per layer
        def draw_like(net):
            return tuple(
                Dense(w=jnp.asarray(rng.standard_normal(l.w_mean.shape)
                                    .astype(np.float32)),
                      b=jnp.asarray(rng.standard_normal(l.b_mean.shape)
                                    .astype(np.float32)))
                for l in net)

        z_fp = [draw_like(params.ode.fp_net) for _ in range(n_evals)]
        z_aug = [draw_like(params.ode.aug_net) for _ in range(n_evals)]

        # kernel-side: permuted/packed, stacked on the eval axis
        per_eval = [_orig_noise_to_kernel(z_fp[e], z_aug[e], N_FP, N_AUG)
                    for e in range(n_evals)]
        noise = tuple(jnp.stack([per_eval[e][k] for e in range(n_evals)])
                      for k in range(len(per_eval[0])))

        y_kernel = fused_bayes_trajectory_decode(
            z0_cm, mw, sw, dw, db, jnp.asarray([0], jnp.int32),
            T=T, dt=dt, R=R, L=L, n_fp_layers=N_FP, n_aug_layers=N_AUG,
            fa_w=FA_W, tile_b=8, interpret=True, noise=noise)

        # oracle: materialize per-eval weights in original layout, step
        # RK4(3/8) with the deterministic model RHS
        det = UDE(n_regions=R, latent_dim=L, net_sizes=NET,
                  aug_net_sizes=AUG)

        def materialize(net, z_net):
            return tuple(
                Dense(w=l.w_mean + z.w * jnp.abs(l.w_std),
                      b=l.b_mean + z.b * jnp.abs(l.b_std))
                for l, z in zip(net, z_net))

        def f(e, x):
            p = UDEParams(
                fp_net=materialize(params.ode.fp_net, z_fp[e]),
                aug_net=materialize(params.ode.aug_net, z_aug[e]))
            return det.apply(p, 0.0, x, fa_w=FA_W)[0]

        x = from_cm(z0_cm, R, L)
        traj = [x]
        for i in range(T - 1):
            e = 4 * i
            k1 = f(e, x)
            k2 = f(e + 1, x + dt * k1 / 3.0)
            k3 = f(e + 2, x + dt * (k2 - k1 / 3.0))
            k4 = f(e + 3, x + dt * (k1 - k2 + k3))
            x = x + dt * (k1 + 3.0 * (k2 + k3) + k4) / 8.0
            traj.append(x)
        latent = jnp.stack(traj)                       # (T, B, R, L)
        y_oracle = model.decoder.apply(params.dec, latent)  # (T, B, R)

        np.testing.assert_allclose(np.asarray(y_kernel),
                                   np.asarray(y_oracle),
                                   rtol=2e-5, atol=2e-6)


class TestForecasterZeroStd:
    @pytest.mark.parametrize("ode_name",
                             ["Bayes_FaFp", "Bayes_Fp", "Bayes_Fa"])
    def test_matches_xla_bayes_path(self, ode_name):
        model = _model(ode_name)
        params = model.init(jax.random.PRNGKey(2))
        # zero the variational stds: both paths become deterministic
        import dataclasses as _dc  # noqa: F401

        def zero_std(net):
            return tuple(l._replace(w_std=jnp.zeros_like(l.w_std),
                                    b_std=jnp.zeros_like(l.b_std))
                         for l in net)

        ode = params.ode
        if hasattr(ode, "fp_net"):
            ode = ode._replace(fp_net=zero_std(ode.fp_net))
        if hasattr(ode, "aug_net"):
            ode = ode._replace(aug_net=zero_std(ode.aug_net))
        params = params._replace(ode=ode)

        batch, n_samples, window = 4, 3, 10
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(
            0, 1, (batch, window, R * (NQS + 1))).astype(np.float32))
        t = jnp.arange(0, 3, dtype=jnp.float32)
        eps = jnp.asarray(rng.standard_normal(
            (n_samples, batch, R, L - 1)).astype(np.float32))

        kw = {"fa_w": FA_W} if ode_name == "Bayes_FaFp" else {}
        y_ref, _ = model.apply(params, x, t, eps,
                               rng=jax.random.PRNGKey(9), **kw)
        fused = FusedBayesForecaster(model, params, **kw)
        y_fused = fused(x, t, eps, seed=7)
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="on-core PRNG only runs on real TPU (the Mosaic "
                           "interpreter stubs prng_random_bits to zeros)")
class TestOnCorePRNGStats:
    def test_matches_xla_bayes_in_distribution(self):
        model = _model()
        params = model.init(jax.random.PRNGKey(4))
        batch, n_samples, window = 4, 8, 10
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(
            0, 1, (batch, window, R * (NQS + 1))).astype(np.float32))
        t = jnp.arange(0, 4, dtype=jnp.float32)
        eps = jnp.asarray(rng.standard_normal(
            (n_samples, batch, R, L - 1)).astype(np.float32))

        fused = FusedBayesForecaster(model, params, fa_w=FA_W)
        rounds = 24
        ys_k = np.stack([np.asarray(fused(x, t, eps, seed=s))
                         for s in range(rounds)])
        ys_x = np.stack([np.asarray(model.apply(
            params, x, t, eps, fa_w=FA_W,
            rng=jax.random.PRNGKey(1000 + s))[0]) for s in range(rounds)])

        # weight-noise ensembles agree in mean and spread
        m_k, m_x = ys_k.mean(axis=0), ys_x.mean(axis=0)
        s_k, s_x = ys_k.std(axis=0).mean(), ys_x.std(axis=0).mean()
        np.testing.assert_allclose(m_k, m_x, atol=5 * s_x / np.sqrt(rounds)
                                   + 1e-3)
        assert 0.5 < s_k / s_x < 2.0


class TestTrainerRouting:
    def test_forecast_fused_routes_bayes(self):
        """Trainer.forecast(fused=True) reaches the Bayes kernel (on the CPU
        interpreter the stubbed PRNG gives the mean-weight forecast, which
        must match the XLA path with stds zeroed)."""
        from fiude_tpu.train.trainer import Trainer

        model = _model()
        trainer = Trainer(model=model, seed=11)
        trainer.init_params()

        rng = np.random.default_rng(8)
        batch, window = 4, 10
        x = jnp.asarray(rng.uniform(
            0, 1, (batch, window, R * (NQS + 1))).astype(np.float32))
        t = jnp.arange(0, 3, dtype=jnp.float32)
        key = jax.random.PRNGKey(21)
        y = trainer.forecast(x, t, n_samples=3, key=key, fa_w=FA_W,
                             fused=True)
        assert y.shape == (batch, 3, 3, R)
        assert np.isfinite(np.asarray(y)).all()
