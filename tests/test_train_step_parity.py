"""One full training step vs a tied-weight torch oracle.

The strongest parity guarantee: identical weights + identical eps draws ->
the loss, every loss term, the global grad norm, and the post-Adam-step
parameters must match torch to float32 tolerance.  This pins the entire
differentiable path (forward, 3/8-RK4 backprop-through-solver, all loss
terms, Adam).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

from tests.test_vae_forward import TorchOracle, tie_weights
from fiude_tpu.models import UDEForecaster
from fiude_tpu.train import AnnealConfig, LossConfig, TrainState, Trainer
from fiude_tpu.train.losses import kl_annealing

RNG = np.random.default_rng(7)


def torch_loss(oracle, x, t, eps, y_true, kl_w, len_tr=130):
    """Reference loss stack in torch (CONN gating: nll+kl_z+kl_p+reg)."""
    n_samples, batch = eps.shape[0], eps.shape[1]
    mean, std = oracle.encode(x)
    z = eps * std + mean
    head = torch.abs(z[..., :2])
    z = torch.concat([head, (1 - head.sum(-1)).unsqueeze(-1), z[..., 2:]], -1)
    z = z.reshape((n_samples * batch,) + z.shape[2:]) + 1e-5

    rates_track = []

    def rhs(tt, xx):
        mask = (xx > 2) | (xx < -1)
        out = xx.reshape(xx.shape[0], -1)
        out = oracle.fps[0](out)
        for lin in oracle.fps[1:]:
            out = lin(torch.nn.functional.elu(out))
        out = torch.abs(oracle.fp_out(out)).reshape(-1, oracle.n_regions, 2)
        rates_track.append(out)
        plus_i = out[..., 0] * xx[..., 0] * xx[..., 1]
        minus_i = out[..., 1] * xx[..., 1]
        fp = torch.stack([-plus_i, plus_i - minus_i, minus_i], dim=-1)
        res = torch.cat([fp, torch.zeros_like(xx[..., 3:])], -1)
        return torch.where(mask, torch.zeros_like(res), res)

    ys = [z]
    y = z
    for i in range(len(t) - 1):
        t0, dt = t[i], t[i + 1] - t[i]
        k1 = rhs(t0, y)
        k2 = rhs(t0 + dt / 3, y + dt * k1 / 3)
        k3 = rhs(t0 + 2 * dt / 3, y + dt * (k2 - k1 / 3))
        k4 = rhs(t0 + dt, y + dt * (k1 - k2 + k3))
        y = y + dt * (k1 + 3 * (k2 + k3) + k4) / 8
        ys.append(y)
    latent = torch.stack(ys)

    d = latent[..., :3]
    y_dec = oracle.dec(d.reshape(d.shape[0], d.shape[1], -1))
    y_pred = y_dec.reshape(-1, n_samples, batch,
                           oracle.n_regions).permute(2, 1, 0, 3)

    # nll
    y_std = y_pred.std(1)
    y_mean = y_pred.mean(1)
    nll = -torch.distributions.Normal(y_mean, y_std).log_prob(y_true)
    nll = (nll * (y_true != -1).float()).mean()
    # kl_z
    pm = torch.cat([mean[..., :2], torch.zeros_like(mean[..., 2:])], -1)
    ps = torch.cat([torch.tensor([0.1, 0.01]),
                    torch.ones(mean.shape[-1] - 2)], 0).expand_as(pm)
    kl_z = kl_w * torch.distributions.kl_divergence(
        torch.distributions.Normal(pm, ps),
        torch.distributions.Normal(mean, std)).sum(-1).mean() / len_tr
    # kl_p
    rates = torch.stack(rates_track).reshape(-1, 2)
    q = torch.distributions.Normal(rates.mean(0), rates.std(0))
    p = torch.distributions.Normal(torch.tensor([0.8, 0.55]),
                                   torch.tensor([0.2, 0.2]))
    kl_p = torch.distributions.kl_divergence(p, q).mean()
    # reg
    lat3 = latent[..., :3]
    reg = 0.1 * (torch.where(lat3 < 0, lat3.abs(), torch.zeros_like(lat3))
                 + torch.where(lat3 > 1, (1 - lat3).abs(),
                               torch.zeros_like(lat3))).sum()
    return nll + kl_z + kl_p + reg, {"nll": nll, "kl_latent": kl_z,
                                     "kl_params": kl_p, "reg_loss": reg}


class TestTrainStepParity:
    def test_loss_grad_and_adam_step_match(self):
        n_regions, n_qs, latent_dim = 2, 4, 6
        q_sizes, ff_sizes, net_sizes = (24, 16), (12,), (20, 20)
        batch, n_samples, window = 3, 5, 14

        torch.manual_seed(0)
        oracle = TorchOracle(n_regions, n_qs, latent_dim, q_sizes, ff_sizes,
                             net_sizes)
        model = UDEForecaster.build(
            n_regions=n_regions, latent_dim=latent_dim, n_qs=n_qs,
            ode_name="Fp",
            enc_params={"q_sizes": q_sizes, "ff_sizes": ff_sizes},
            ode_params={"net_sizes": net_sizes})
        params = tie_weights(oracle, model)

        x = RNG.uniform(0, 1, (batch, window,
                               n_regions * (n_qs + 1))).astype(np.float32)
        eps = RNG.standard_normal(
            (n_samples, batch, n_regions, latent_dim - 1)).astype(np.float32)
        t = np.arange(4, dtype=np.float32)
        y_true = RNG.uniform(0, 1, (batch, 4, n_regions)).astype(np.float32)

        kl_w = float(kl_annealing(1, AnnealConfig()))

        # ---- torch side -------------------------------------------------
        xt = torch.tensor(x)
        loss_t, terms_t = torch_loss(oracle, xt, torch.tensor(t),
                                     torch.tensor(eps),
                                     torch.tensor(y_true), kl_w)
        loss_t.backward()
        torch_params = (list(oracle.grus.parameters())
                        + list(oracle.ffs.parameters())
                        + list(oracle.ff_out.parameters())
                        + list(oracle.fps.parameters())
                        + list(oracle.fp_out.parameters())
                        + list(oracle.dec.parameters()))
        gnorm_t = float(torch.norm(
            torch.cat([p.grad.view(-1) for p in torch_params]), 2))
        opt_t = torch.optim.Adam(torch_params, lr=1e-3)
        opt_t.step()

        # ---- jax side ---------------------------------------------------
        trainer = Trainer(model, loss_cfg=LossConfig(nll=True, mse=False,
                                                     kl_z=True, kl_p=True,
                                                     fa_norm=0.0,
                                                     reg_loss=True,
                                                     anneal=True))
        trainer.params = params
        trainer.setup_training(lr=1e-3)
        state, metrics = trainer._step_fn(
            trainer.state, jnp.asarray(x), jnp.asarray(y_true),
            jnp.asarray(t), jnp.asarray(eps), jnp.asarray(1.0),
            jnp.asarray(0), jnp.asarray(1e9))

        # loss + each term
        assert float(metrics["loss"]) == pytest.approx(float(loss_t.detach()),
                                                       rel=2e-4)
        for k, v in terms_t.items():
            assert float(metrics[k]) == pytest.approx(float(v), rel=2e-3,
                                                      abs=1e-5), k
        # global grad norm
        assert float(metrics["grad_norm"]) == pytest.approx(gnorm_t, rel=2e-3)

        # post-Adam parameters (spot-check decoder + first fp layer)
        w_dec_t = oracle.dec.weight.detach().numpy().T
        np.testing.assert_allclose(np.asarray(state.params.dec.out.w),
                                   w_dec_t, rtol=1e-4, atol=1e-6)
        w_fp0_t = oracle.fps[0].weight.detach().numpy().T
        np.testing.assert_allclose(np.asarray(state.params.ode.fp_net[0].w),
                                   w_fp0_t, rtol=1e-4, atol=1e-6)
        w_gru_t = oracle.grus[0].weight_ih_l0.detach().numpy().T
        np.testing.assert_allclose(np.asarray(state.params.enc.grus[0].w_ih),
                                   w_gru_t, rtol=1e-4, atol=1e-6)
