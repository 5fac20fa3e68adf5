"""Alternate encoder families wired into the full forecaster."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiude_tpu.models import UDEForecaster
from fiude_tpu.models.encoders import (
    BiGRUEncoder, BiLSTMEncoder, GenericEncoder, MISOGRUEncoder,
)

RNG = np.random.default_rng(0)


class TestGenericEncoder:
    def test_shapes(self):
        enc = GenericEncoder(rnn_input_size=8, n_regions=2, latent_dim=5,
                             rnn_hidden_sizes=(16, 12), ff_hidden_sizes=(10,))
        params = enc.init(jax.random.PRNGKey(0))
        x = jnp.asarray(RNG.uniform(0, 1, (3, 20, 8)).astype(np.float32))
        mean, std = enc.apply(params, x)
        assert mean.shape == (3, 2, 5) and std.shape == (3, 2, 5)
        assert np.all(np.asarray(std) >= 0)

    def test_torch_oracle_parity(self):
        """Tie weights against a torch replica of the legacy Encoder
        (CustomRNN + FFNetwork, reference lib/Old/old_models.py:9-39):
        stacked GRUs -> last step -> Linear/ReLU/.../Linear (ReLU before the
        final projection) -> split -> std=|std|*scaler."""
        torch = pytest.importorskip("torch")
        from fiude_tpu.models.nn import Dense
        from fiude_tpu.ops.gru import gru_params_from_torch

        n_regions, latent_dim, in_size = 2, 4, 6
        rnn_sizes, ff_sizes = [12, 10], [8, 2 * n_regions * latent_dim]
        scaler = [0.1, 0.05, 1.0, 1.0]

        t_grus = []
        d = in_size
        for h in rnn_sizes:
            t_grus.append(torch.nn.GRU(d, h, batch_first=True))
            d = h
        t_ff = []
        d = rnn_sizes[-1]
        for i, h in enumerate(ff_sizes):
            t_ff.append(torch.nn.Linear(d, h))
            if i != len(ff_sizes) - 1:
                t_ff.append(torch.nn.ReLU())
            d = h

        x = RNG.uniform(0, 1, (3, 15, in_size)).astype(np.float32)
        with torch.no_grad():
            xt = torch.flip(torch.tensor(x), [1])
            for g in t_grus:
                xt, _ = g(xt)
            ht = xt[:, -1, :]
            for layer in t_ff:
                ht = layer(ht)
            mean_t, std_t = torch.chunk(ht, 2, dim=-1)
            mean_t = mean_t.reshape(-1, n_regions, latent_dim).numpy()
            std_t = (torch.abs(std_t.reshape(-1, n_regions, latent_dim))
                     * torch.tensor(scaler).view(1, 1, -1)).numpy()

        npv = lambda p: p.detach().numpy().copy()
        grus = tuple(
            gru_params_from_torch(npv(g.weight_ih_l0), npv(g.weight_hh_l0),
                                  npv(g.bias_ih_l0), npv(g.bias_hh_l0))
            for g in t_grus)
        ff = tuple(Dense(w=jnp.asarray(npv(l.weight).T), b=jnp.asarray(npv(l.bias)))
                   for l in t_ff if isinstance(l, torch.nn.Linear))
        enc = GenericEncoder(rnn_input_size=in_size, n_regions=n_regions,
                             latent_dim=latent_dim,
                             rnn_hidden_sizes=tuple(rnn_sizes),
                             ff_hidden_sizes=(8,), sir_scaler=tuple(scaler))
        from fiude_tpu.models.encoders import GenericEncoderParams
        mean_j, std_j = enc.apply(GenericEncoderParams(grus=grus, ff=ff),
                                  jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(mean_j), mean_t,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(std_j), std_t,
                                   rtol=1e-5, atol=1e-6)

    def test_in_forecaster(self):
        model = UDEForecaster.build(
            n_regions=1, latent_dim=6, n_qs=3, ode_name="Fp",
            encoder_name="generic",
            enc_params={"rnn_hidden_sizes": (10,), "ff_hidden_sizes": (8,)},
            ode_params={"net_sizes": (8, 8)})
        params = model.init(jax.random.PRNGKey(1))
        x = jnp.asarray(RNG.uniform(0, 1, (2, 20, 4)).astype(np.float32))
        eps = jnp.asarray(RNG.standard_normal((3, 2, 1, 5)).astype(np.float32))
        t = jnp.arange(3, dtype=jnp.float32)
        y, _ = model.apply(params, x, t, eps)
        assert y.shape == (2, 3, 3, 1)
        assert np.all(np.isfinite(np.asarray(y)))


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
