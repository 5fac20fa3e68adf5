"""End-to-end forward parity: UDEForecaster vs a tied-weight torch oracle.

The oracle re-creates the reference forward semantics (flip -> stacked GRU ->
FF head -> abs*scaler -> simplex reparam -> 3/8-rule RK4 over the weekly grid
-> SIR-rates RHS with out-of-range zeroing -> linear decode -> (B,S,T,R))
directly from torch primitives, then both models run with identical weights
and identical eps draws.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fiude_tpu.models import (
    BackGRUEncoder, LinearDecoder, SIRRates, UDE, UDEForecaster,
)
from fiude_tpu.models.encoders import BackGRUEncoderParams
from fiude_tpu.models.decoder import LinearDecoderParams
from fiude_tpu.models.nn import Dense
from fiude_tpu.models.rhs import SIRRatesParams, UDEParams
from fiude_tpu.models.vae import UDEForecasterParams
from fiude_tpu.ops.gru import gru_params_from_torch

RNG = np.random.default_rng(42)


def _np(t):
    # copy: torch optimizers mutate storage in place, and jnp.asarray on CPU
    # may alias the numpy view zero-copy
    return t.detach().numpy().copy()


def _dense_from_torch(lin):
    return Dense(w=jnp.asarray(_np(lin.weight)).T, b=jnp.asarray(_np(lin.bias)))


class TorchOracle:
    """Reference-semantics forward in torch (built from the equations)."""

    def __init__(self, n_regions, n_qs, latent_dim, q_sizes, ff_sizes,
                 net_sizes, sir_scaler=(0.1, 0.05, 1.0)):
        self.n_regions = n_regions
        self.latent_dim = latent_dim
        self.ld_enc = latent_dim - 1
        in_size = n_regions * (n_qs + 1)
        self.grus = torch.nn.ModuleList()
        for h in q_sizes:
            self.grus.append(torch.nn.GRU(in_size, h, batch_first=True))
            in_size = h
        # FF head: L0, (ReLU, Li)*, L_out
        self.ffs = torch.nn.ModuleList()
        sizes = [q_sizes[-1]] + list(ff_sizes)
        for i in range(len(sizes) - 1):
            self.ffs.append(torch.nn.Linear(sizes[i], sizes[i + 1]))
        self.ff_out = torch.nn.Linear(ff_sizes[-1], 2 * n_regions * self.ld_enc)
        scaler = list(sir_scaler) + [sir_scaler[-1]] * (self.ld_enc - len(sir_scaler))
        self.scaler = torch.tensor(scaler[: self.ld_enc]).view(1, -1)
        # Fp net: L0, (ELU, Li)*, L_out
        sizes = [n_regions * latent_dim] + list(net_sizes)
        self.fps = torch.nn.ModuleList()
        for i in range(len(sizes) - 1):
            self.fps.append(torch.nn.Linear(sizes[i], sizes[i + 1]))
        self.fp_out = torch.nn.Linear(net_sizes[-1], 2 * n_regions)
        self.dec = torch.nn.Linear(n_regions * 3, n_regions)

    def encode(self, x):
        x = x.flip(1)
        for g in self.grus:
            x, _ = g(x)
        h = x[:, -1, :]
        h = self.ffs[0](h)
        for lin in self.ffs[1:]:
            h = lin(torch.relu(h))
        h = self.ff_out(h)
        mean, std = torch.split(h, h.size(-1) // 2, dim=-1)
        mean = mean.reshape(-1, self.n_regions, self.ld_enc)
        std = torch.abs(std.reshape(-1, self.n_regions, self.ld_enc)) * self.scaler
        return mean, std

    def rhs(self, t, x):
        mask = (x > 2) | (x < -1)
        out = x.reshape(x.shape[0], -1)
        out = self.fps[0](out)
        for lin in self.fps[1:]:
            out = lin(torch.nn.functional.elu(out))
        out = torch.abs(self.fp_out(out)).reshape(-1, self.n_regions, 2)
        plus_i = out[..., 0] * x[..., 0] * x[..., 1]
        minus_i = out[..., 1] * x[..., 1]
        fp = torch.stack([-plus_i, plus_i - minus_i, minus_i], dim=-1)
        res = torch.cat([fp, torch.zeros_like(x[..., 3:])], -1)
        res = torch.where(mask, torch.zeros_like(res), res)
        return res

    def rk4_38(self, y, t):
        """torchdiffeq 'rk4' (3/8 rule), one step per grid interval."""
        ys = [y]
        for i in range(len(t) - 1):
            t0, dt = t[i], t[i + 1] - t[i]
            k1 = self.rhs(t0, y)
            k2 = self.rhs(t0 + dt / 3, y + dt * k1 / 3)
            k3 = self.rhs(t0 + 2 * dt / 3, y + dt * (k2 - k1 / 3))
            k4 = self.rhs(t0 + dt, y + dt * (k1 - k2 + k3))
            y = y + dt * (k1 + 3 * (k2 + k3) + k4) / 8
            ys.append(y)
        return torch.stack(ys)

    def forward(self, x, t, eps):
        n_samples, batch = eps.shape[0], eps.shape[1]
        mean, std = self.encode(x)
        z = eps * std + mean
        head = torch.abs(z[..., :2])
        z = torch.concat([head, (1 - head.sum(-1)).unsqueeze(-1), z[..., 2:]], -1)
        z = z.reshape((n_samples * batch,) + z.shape[2:]) + 1e-5
        latent = self.rk4_38(z, t)
        d = latent[..., :3]
        y = self.dec(d.reshape(d.shape[0], d.shape[1], -1))
        y = y.reshape(-1, n_samples, batch, self.n_regions).permute(2, 1, 0, 3)
        return y


def tie_weights(oracle: TorchOracle, cfg: UDEForecaster) -> UDEForecasterParams:
    grus = tuple(
        gru_params_from_torch(_np(g.weight_ih_l0), _np(g.weight_hh_l0),
                              _np(g.bias_ih_l0), _np(g.bias_hh_l0))
        for g in oracle.grus)
    ff = tuple(_dense_from_torch(l) for l in list(oracle.ffs) + [oracle.ff_out])
    fp = tuple(_dense_from_torch(l) for l in list(oracle.fps) + [oracle.fp_out])
    return UDEForecasterParams(
        enc=BackGRUEncoderParams(grus=grus, ff=ff),
        ode=SIRRatesParams(fp_net=fp),
        dec=LinearDecoderParams(out=_dense_from_torch(oracle.dec)),
    )


class TestForwardParity:
    def test_full_forward_matches_torch_oracle(self):
        n_regions, n_qs, latent_dim = 2, 4, 6
        q_sizes, ff_sizes, net_sizes = (24, 16), (12,), (20, 20)
        window, horizon_weeks = 14, 4
        batch, n_samples = 3, 5

        torch.manual_seed(0)
        oracle = TorchOracle(n_regions, n_qs, latent_dim, q_sizes, ff_sizes,
                             net_sizes)
        cfg = UDEForecaster.build(
            n_regions=n_regions, latent_dim=latent_dim, n_qs=n_qs,
            ode_name="Fp",
            enc_params={"q_sizes": q_sizes, "ff_sizes": ff_sizes},
            ode_params={"net_sizes": net_sizes})
        params = tie_weights(oracle, cfg)

        x = RNG.uniform(0, 1, (batch, window, n_regions * (n_qs + 1))).astype(np.float32)
        eps = RNG.standard_normal(
            (n_samples, batch, n_regions, latent_dim - 1)).astype(np.float32)
        t = np.arange(horizon_weeks + 1, dtype=np.float32)

        with torch.no_grad():
            y_t = oracle.forward(torch.tensor(x), torch.tensor(t),
                                 torch.tensor(eps))
        y_j, extras = jax.jit(cfg.apply)(params, jnp.asarray(x),
                                         jnp.asarray(t), jnp.asarray(eps))

        assert y_j.shape == (batch, n_samples, horizon_weeks + 1, n_regions)
        np.testing.assert_allclose(np.asarray(y_j), _np(y_t),
                                   rtol=5e-5, atol=5e-6)
        # aux rates collected for every stage of every step
        assert extras.aux["rates"].shape == (
            horizon_weeks, 4, n_samples * batch, n_regions, 2)

    def test_ude_fa_ramp(self):
        """fa_w=0 must reduce the UDE forward to the pure-Fp field."""
        cfg_ude = UDEForecaster.build(
            n_regions=1, latent_dim=6, n_qs=3, ode_name="FaFp",
            enc_params={"q_sizes": (8,), "ff_sizes": (8,)},
            ode_params={"net_sizes": (8, 8), "aug_net_sizes": (8, 8)})
        key = jax.random.PRNGKey(1)
        params = cfg_ude.init(key)

        x = jnp.asarray(RNG.uniform(0, 1, (2, 10, 4)).astype(np.float32))
        eps = jnp.asarray(RNG.standard_normal((3, 2, 1, 5)).astype(np.float32))
        t = jnp.arange(3, dtype=jnp.float32)

        y0, ex0 = cfg_ude.apply(params, x, t, eps, fa_w=0.0)
        y1, ex1 = cfg_ude.apply(params, x, t, eps, fa_w=1.0)
        assert not np.allclose(np.asarray(y0), np.asarray(y1))

        cfg_fp = UDEForecaster.build(
            n_regions=1, latent_dim=6, n_qs=3, ode_name="Fp",
            enc_params={"q_sizes": (8,), "ff_sizes": (8,)},
            ode_params={"net_sizes": (8, 8)})
        fp_params = UDEForecasterParams(
            enc=params.enc, ode=SIRRatesParams(fp_net=params.ode.fp_net),
            dec=params.dec)
        y_fp, _ = cfg_fp.apply(fp_params, x, t, eps)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y_fp), rtol=1e-6)

    def test_fa_only_model(self):
        cfg = UDEForecaster.build(
            n_regions=2, latent_dim=5, n_qs=3, ode_name="Fa",
            enc_params={"q_sizes": (8,), "ff_sizes": (8,)},
            ode_params={"aug_net_sizes": (8, 8)})
        params = cfg.init(jax.random.PRNGKey(2))
        x = jnp.asarray(RNG.uniform(0, 1, (2, 10, 8)).astype(np.float32))
        eps = jnp.asarray(RNG.standard_normal((3, 2, 2, 4)).astype(np.float32))
        t = jnp.arange(4, dtype=jnp.float32)
        y, extras = cfg.apply(params, x, t, eps)
        assert y.shape == (2, 3, 4, 2)
        assert extras.aux["fa"].shape == (3, 4, 6, 2, 3)

    def test_out_of_range_zeroing(self):
        """States beyond (x>2)|(x<-1) must freeze (zero derivative)."""
        cfg = SIRRates(n_regions=1, latent_dim=4, net_sizes=(8,))
        params = cfg.init(jax.random.PRNGKey(3))
        x = jnp.array([[[3.0, 0.5, 0.1, 0.0]]])  # S out of range
        dx, _ = cfg.apply(params, 0.0, x)
        assert float(dx[0, 0, 0]) == 0.0
        assert float(dx[0, 0, 3]) == 0.0  # tail dims always zero for Fp


class TestFloat64Parity:
    def test_forward_matches_torch_to_1e9(self):
        """In float64 the tied-weight forward matches torch to ~1e-9 rtol —
        the float32 residuals elsewhere are pure rounding, not math drift
        (north star asks for 1e-5; this shows the math is exact)."""
        n_regions, n_qs, latent_dim = 2, 4, 6
        q_sizes, ff_sizes, net_sizes = (24, 16), (12,), (20, 20)

        torch.manual_seed(3)
        oracle = TorchOracle(n_regions, n_qs, latent_dim, q_sizes, ff_sizes,
                             net_sizes)
        for m in [oracle.grus, oracle.ffs, oracle.ff_out, oracle.fps,
                  oracle.fp_out, oracle.dec]:
            m.double()
        oracle.scaler = oracle.scaler.double()

        cfg = UDEForecaster.build(
            n_regions=n_regions, latent_dim=latent_dim, n_qs=n_qs,
            ode_name="Fp", dtype="float64",
            enc_params={"q_sizes": q_sizes, "ff_sizes": ff_sizes},
            ode_params={"net_sizes": net_sizes})
        params = tie_weights(oracle, cfg)
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)

        rng = np.random.default_rng(5)
        x = rng.uniform(0, 1, (3, 12, n_regions * (n_qs + 1)))
        eps = rng.standard_normal((4, 3, n_regions, latent_dim - 1))
        # one RK step: BLAS accumulation-order differences (torch-MKL vs
        # XLA-Eigen) amplify through multiple steps; a single step isolates
        # the math itself
        t = np.arange(2, dtype=np.float64)

        with torch.no_grad():
            y_t = oracle.forward(torch.tensor(x), torch.tensor(t),
                                 torch.tensor(eps))
        y_j, _ = cfg.apply(params, jnp.asarray(x), jnp.asarray(t),
                           jnp.asarray(eps))
        np.testing.assert_allclose(np.asarray(y_j), _np(y_t),
                                   rtol=1e-8, atol=1e-11)
