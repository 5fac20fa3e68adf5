"""Fused Pallas trajectory kernel vs the lax.scan reference path.

On the CPU test platform the kernel runs in interpreter mode — numerics must
match the scan path; on TPU the same code compiles via Mosaic.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiude_tpu.models import UDEForecaster
from fiude_tpu.ops.pallas_ude import (
    FusedForecaster, cm_permute, cm_permute_decoder, from_cm, to_cm,
)

RNG = np.random.default_rng(0)


def make_model(ode_name="FaFp", R=2, L=6):
    return UDEForecaster.build(
        n_regions=R, latent_dim=L, n_qs=3, ode_name=ode_name,
        enc_params={"q_sizes": (12,), "ff_sizes": (8,)},
        ode_params={"net_sizes": (16, 16), "aug_net_sizes": (16, 16)})


class TestLayout:
    def test_cm_roundtrip(self):
        z = jnp.asarray(RNG.standard_normal((5, 3, 4)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(from_cm(to_cm(z), 3, 4)), np.asarray(z))

    def test_permuted_mlp_equivalence(self):
        """CM-permuted net on CM inputs == original net on region-major."""
        from fiude_tpu.models.nn import elu_mlp
        model = make_model("Fp", R=3, L=5)
        params = model.init(jax.random.PRNGKey(0))
        z = jnp.asarray(RNG.standard_normal((7, 3, 5)).astype(np.float32))

        rates_ref = jnp.abs(elu_mlp(params.ode.fp_net,
                                    z.reshape(7, -1))).reshape(7, 3, 2)

        flat = cm_permute(params.ode, 3, 5, has_aug=False)
        # replay reference MLP ordering: L0, (ELU, Li)*, L_out (no final act)
        h = to_cm(z) @ flat[0] + flat[1][0]
        for k in range(2, len(flat) - 2, 2):
            h = jax.nn.elu(h) @ flat[k] + flat[k + 1][0]
        h = h @ flat[-2] + flat[-1][0]
        rates_cm = jnp.abs(h)  # (7, 2R): [beta(R) | gamma(R)]
        np.testing.assert_allclose(np.asarray(rates_cm[:, :3]),
                                   np.asarray(rates_ref[..., 0]),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rates_cm[:, 3:]),
                                   np.asarray(rates_ref[..., 1]),
                                   rtol=1e-4, atol=1e-6)


class TestFusedForward:
    @pytest.mark.parametrize("ode_name", ["Fp", "FaFp", "Fa"])
    def test_matches_scan_path(self, ode_name):
        model = make_model(ode_name)
        params = model.init(jax.random.PRNGKey(1))
        x = jnp.asarray(RNG.uniform(0, 1, (4, 10, 8)).astype(np.float32))
        eps = jnp.asarray(RNG.standard_normal((4, 4, 2, 5)).astype(np.float32))
        t = jnp.arange(6, dtype=jnp.float32) / 7.0

        y_ref, _ = model.apply(params, x, t, eps, fa_w=1.0)
        fused = FusedForecaster(model, params, fa_w=1.0, tile_b=16)
        y_fused = fused(x, t, eps)

        assert y_fused.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                                   rtol=2e-4, atol=2e-5)

    def test_fa_w_zero_matches_fp(self):
        model = make_model("FaFp")
        params = model.init(jax.random.PRNGKey(2))
        x = jnp.asarray(RNG.uniform(0, 1, (2, 10, 8)).astype(np.float32))
        eps = jnp.asarray(RNG.standard_normal((2, 2, 2, 5)).astype(np.float32))
        t = jnp.arange(4, dtype=jnp.float32) / 7.0
        y_ref, _ = model.apply(params, x, t, eps, fa_w=0.0)
        fused = FusedForecaster(model, params, fa_w=0.0, tile_b=4)
        np.testing.assert_allclose(np.asarray(fused(x, t, eps)),
                                   np.asarray(y_ref), rtol=2e-4, atol=2e-5)

    def test_out_of_range_freeze(self):
        """Kernel reproduces the (x>2)|(x<-1) hard zeroing."""
        model = make_model("Fp")
        params = model.init(jax.random.PRNGKey(3))
        x = jnp.asarray(RNG.uniform(0, 1, (2, 10, 8)).astype(np.float32))
        # gigantic eps pushes states far out of range
        eps = jnp.asarray(100.0 * np.ones((2, 2, 2, 5), np.float32))
        t = jnp.arange(4, dtype=jnp.float32) / 7.0
        y_ref, _ = model.apply(params, x, t, eps)
        fused = FusedForecaster(model, params, tile_b=4)
        np.testing.assert_allclose(np.asarray(fused(x, t, eps)),
                                   np.asarray(y_ref), rtol=2e-4, atol=2e-5)


class TestTrainerFusedForecast:
    def test_fused_matches_scan_forecast(self):
        from fiude_tpu.train import TRAINING_INFO, Trainer
        model = make_model("FaFp")
        trainer = Trainer(model, loss_cfg=TRAINING_INFO["UONN"], seed=0)
        trainer.init_params()
        x = jnp.asarray(RNG.uniform(0, 1, (4, 10, 8)).astype(np.float32))
        t = jnp.arange(5, dtype=jnp.float32) / 7.0
        key = jax.random.PRNGKey(3)
        y_scan = trainer.forecast(x, t, n_samples=4, key=key)
        y_fused = trainer.forecast(x, t, n_samples=4, key=key, fused=True)
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_scan),
                                   rtol=2e-4, atol=2e-5)
