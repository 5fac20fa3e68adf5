"""Alternate encoder families wired into the full forecaster."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiude_tpu.models import UDEForecaster
from fiude_tpu.models.encoders import BiGRUEncoder, BiLSTMEncoder, MISOGRUEncoder

RNG = np.random.default_rng(0)


class TestBiGRUEncoder:
    def test_shapes(self):
        enc = BiGRUEncoder(n_regions=2, n_qs=4, latent_dim=5,
                           q_sizes=(12,), ili_sizes=(8,), ff_sizes=(8,))
        params = enc.init(jax.random.PRNGKey(0))
        x = jnp.asarray(RNG.uniform(0, 1, (3, 20, 2 * 5)).astype(np.float32))
        mean, std = enc.apply(params, x)
        assert mean.shape == (3, 2, 5)
        assert std.shape == (3, 2, 5)
        assert np.all(np.asarray(std) >= 0)

    def test_miso_alias(self):
        assert MISOGRUEncoder is BiGRUEncoder


class TestBiLSTMEncoder:
    def test_shapes(self):
        enc = BiLSTMEncoder(input_size=6, hidden_size=10, num_layers=2,
                            latent_dim=5)
        params = enc.init(jax.random.PRNGKey(0))
        x = jnp.asarray(RNG.uniform(0, 1, (3, 20, 6)).astype(np.float32))
        mean, std = enc.apply(params, x)
        assert mean.shape == (3, 1, 5)
        assert std.shape == (3, 1, 5)


class TestVAEWithVariants:
    @pytest.mark.parametrize("encoder_name,enc_params", [
        ("bigru", {"q_sizes": (8,), "ili_sizes": (6,), "ff_sizes": (8,)}),
        ("bilstm", {"hidden_size": 10}),
    ])
    def test_forward(self, encoder_name, enc_params):
        n_regions = 1  # bilstm is single-region; bigru works for any
        model = UDEForecaster.build(
            n_regions=n_regions, latent_dim=6, n_qs=3, ode_name="Fp",
            encoder_name=encoder_name, enc_params=dict(enc_params),
            ode_params={"net_sizes": (8, 8)})
        params = model.init(jax.random.PRNGKey(1))
        x = jnp.asarray(RNG.uniform(0, 1, (2, 20, 4)).astype(np.float32))
        eps = jnp.asarray(RNG.standard_normal((3, 2, 1, 5)).astype(np.float32))
        t = jnp.arange(3, dtype=jnp.float32)
        y, _ = model.apply(params, x, t, eps)
        assert y.shape == (2, 3, 3, 1)
        assert np.all(np.isfinite(np.asarray(y)))
