"""Numerical parity vs torch CPU for recurrences and model blocks.

These tests pin the gate conventions (torch GRU/LSTM), the ELU-MLP layer
ordering, the simplex reparam, and the decoder readout so the framework's
training dynamics can match the reference's to float tolerance.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fiude_tpu.ops.gru import (
    gru, lstm, bigru, gru_params_from_torch, lstm_params_from_torch,
)
from fiude_tpu.models.nn import Dense, elu_mlp, relu_mlp
from fiude_tpu.models.vae import reparam, make_prior

RNG = np.random.default_rng(0)


def _np(t):
    return t.detach().numpy()


class TestGRUParity:
    @pytest.mark.parametrize("input_size,hidden,seq,batch", [
        (10, 16, 7, 3), (441, 64, 43, 5),
    ])
    def test_forward_matches_torch(self, input_size, hidden, seq, batch):
        tg = torch.nn.GRU(input_size, hidden, batch_first=True)
        x = RNG.standard_normal((batch, seq, input_size)).astype(np.float32)
        with torch.no_grad():
            out_t, h_t = tg(torch.tensor(x))
        p = gru_params_from_torch(_np(tg.weight_ih_l0), _np(tg.weight_hh_l0),
                                  _np(tg.bias_ih_l0), _np(tg.bias_hh_l0))
        out_j, h_j = gru(p, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out_j), _np(out_t),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(h_j), _np(h_t)[0],
                                   rtol=2e-5, atol=2e-6)

    def test_reverse_matches_torch_bidirectional_back_half(self):
        tg = torch.nn.GRU(8, 12, batch_first=True, bidirectional=True)
        x = RNG.standard_normal((4, 9, 8)).astype(np.float32)
        with torch.no_grad():
            out_t, _ = tg(torch.tensor(x))
        fwd = gru_params_from_torch(_np(tg.weight_ih_l0), _np(tg.weight_hh_l0),
                                    _np(tg.bias_ih_l0), _np(tg.bias_hh_l0))
        bwd = gru_params_from_torch(
            _np(tg.weight_ih_l0_reverse), _np(tg.weight_hh_l0_reverse),
            _np(tg.bias_ih_l0_reverse), _np(tg.bias_hh_l0_reverse))
        out_j, _ = bigru(fwd, bwd, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out_j), _np(out_t),
                                   rtol=2e-5, atol=2e-6)


class TestLSTMParity:
    def test_forward_matches_torch(self):
        tl = torch.nn.LSTM(11, 20, batch_first=True)
        x = RNG.standard_normal((3, 15, 11)).astype(np.float32)
        with torch.no_grad():
            out_t, (h_t, c_t) = tl(torch.tensor(x))
        p = lstm_params_from_torch(_np(tl.weight_ih_l0), _np(tl.weight_hh_l0),
                                   _np(tl.bias_ih_l0), _np(tl.bias_hh_l0))
        out_j, (h_j, c_j) = lstm(p, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out_j), _np(out_t),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(c_j), _np(c_t)[0],
                                   rtol=2e-5, atol=2e-6)


class TestMLPParity:
    def test_elu_mlp_reference_layer_ordering(self):
        """Linear, (ELU, Linear)*, Linear — final layer takes the *unactivated*
        last hidden output (reference lib/models.py:118-124)."""
        sizes = [12, 20, 20, 16, 6]
        t_layers = []
        seq = []
        for i in range(len(sizes) - 2):
            lin = torch.nn.Linear(sizes[i], sizes[i + 1])
            t_layers.append(lin)
            seq.append(lin)
            if i < len(sizes) - 3:
                seq.append(torch.nn.ELU())
        out_lin = torch.nn.Linear(sizes[-2], sizes[-1])
        t_layers.append(out_lin)
        seq.append(out_lin)
        model = torch.nn.Sequential(*seq)

        x = RNG.standard_normal((5, 12)).astype(np.float32)
        with torch.no_grad():
            y_t = model(torch.tensor(x))

        j_layers = tuple(
            Dense(w=jnp.asarray(_np(l.weight)).T, b=jnp.asarray(_np(l.bias)))
            for l in t_layers)
        y_j = elu_mlp(j_layers, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y_j), _np(y_t),
                                   rtol=2e-5, atol=2e-6)


class TestReparamParity:
    def test_simplex_projection(self):
        n_samples, batch, regions, ld_enc = 6, 4, 3, 7
        eps = RNG.standard_normal((n_samples, batch, regions, ld_enc)).astype(np.float32)
        mean = RNG.standard_normal((batch, regions, ld_enc)).astype(np.float32)
        std = np.abs(RNG.standard_normal((batch, regions, ld_enc))).astype(np.float32)

        # torch-semantics oracle
        zt = torch.tensor(eps) * torch.tensor(std) + torch.tensor(mean)
        head = torch.abs(zt[..., :2])
        zt = torch.concat([head, (1 - head.sum(-1)).unsqueeze(-1), zt[..., 2:]], -1)
        zt = zt.reshape((n_samples * batch,) + zt.shape[2:])

        zj = reparam(jnp.asarray(eps), jnp.asarray(std), jnp.asarray(mean))
        assert zj.shape == (n_samples * batch, regions, ld_enc + 1)
        np.testing.assert_allclose(np.asarray(zj), _np(zt), rtol=1e-6, atol=1e-7)
        # S + I + R == 1
        np.testing.assert_allclose(
            np.asarray(zj[..., :3].sum(-1)), 1.0, rtol=1e-5)

    def test_make_prior(self):
        # encoder mean has latent_dim - 1 dims (reference lib/VAE.py:75,167)
        mean = RNG.standard_normal((4, 2, 7)).astype(np.float32)
        pm, ps = make_prior(jnp.asarray(mean), latent_dim=8)
        np.testing.assert_allclose(np.asarray(pm[..., :2]), mean[..., :2])
        assert np.all(np.asarray(pm[..., 2:]) == 0)
        np.testing.assert_allclose(np.asarray(ps[..., 0]), 0.1, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ps[..., 1]), 0.01, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ps[..., 2:]), 1.0, rtol=1e-6)


class TestStatsParity:
    def test_normal_logpdf_and_kl_match_torch(self):
        from fiude_tpu.ops.stats import normal_logpdf, kl_normal
        x = RNG.standard_normal((32,)).astype(np.float32)
        m = RNG.standard_normal((32,)).astype(np.float32)
        s = (0.1 + np.abs(RNG.standard_normal((32,)))).astype(np.float32)
        m2 = RNG.standard_normal((32,)).astype(np.float32)
        s2 = (0.1 + np.abs(RNG.standard_normal((32,)))).astype(np.float32)

        d1 = torch.distributions.Normal(torch.tensor(m), torch.tensor(s))
        d2 = torch.distributions.Normal(torch.tensor(m2), torch.tensor(s2))
        np.testing.assert_allclose(
            np.asarray(normal_logpdf(jnp.asarray(x), jnp.asarray(m), jnp.asarray(s))),
            _np(d1.log_prob(torch.tensor(x))), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(kl_normal(jnp.asarray(m), jnp.asarray(s),
                                 jnp.asarray(m2), jnp.asarray(s2))),
            _np(torch.distributions.kl_divergence(d1, d2)), rtol=1e-5, atol=1e-6)

    def test_unbiased_std_matches_torch(self):
        from fiude_tpu.ops.stats import std
        x = RNG.standard_normal((16, 5)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(std(jnp.asarray(x), axis=0)),
            _np(torch.tensor(x).std(0)), rtol=1e-5)


class TestStackedGRUFusion:
    def test_gru_stack_last_matches_layerwise(self):
        """Fused multi-layer scan == sequential per-layer GRU sweeps."""
        from fiude_tpu.ops.gru import gru, gru_stack_last, init_gru
        key = jax.random.PRNGKey(0)
        p0 = init_gru(jax.random.fold_in(key, 0), 10, 16)
        p1 = init_gru(jax.random.fold_in(key, 1), 16, 12)
        x = jnp.asarray(RNG.standard_normal((4, 9, 10)).astype(np.float32))

        h_fused = gru_stack_last((p0, p1), x)
        out0, _ = gru(p0, x)
        out1, h_seq = gru(p1, out0)
        np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_seq),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(h_fused),
                                   np.asarray(out1[:, -1, :]),
                                   rtol=1e-6, atol=1e-7)
