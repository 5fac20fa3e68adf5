"""Migration path: reference-layout torch .pth checkpoints -> framework params.

Builds torch modules with the reference's exact state-dict key layout
(ModuleList indices with interleaved Flatten/ELU/ReLU), saves them, loads
through the converter, and checks the forward pass matches the torch oracle.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fiude_tpu.models import UDEForecaster
from fiude_tpu.train.torch_compat import params_from_torch_checkpoint

RNG = np.random.default_rng(11)


def build_reference_like_modules(n_regions, n_qs, latent_dim, q_sizes,
                                 ff_sizes, net_sizes, aug_net_sizes):
    """torch modules with the reference's state-dict key layout."""
    ld_enc = latent_dim - 1
    enc = torch.nn.Module()
    enc.rnn_layers = torch.nn.ModuleList()
    in_size = n_regions * (n_qs + 1)
    for h in q_sizes:
        enc.rnn_layers.append(torch.nn.GRU(in_size, h, batch_first=True))
        in_size = h
    enc.ff_layers = torch.nn.ModuleList()
    enc.ff_layers.append(torch.nn.Linear(q_sizes[-1], ff_sizes[0]))
    for l in range(1, len(ff_sizes)):
        enc.ff_layers.append(torch.nn.ReLU())
        enc.ff_layers.append(torch.nn.Linear(ff_sizes[l - 1], ff_sizes[l]))
    enc.ff_layers.append(torch.nn.Linear(ff_sizes[-1],
                                         2 * n_regions * ld_enc))

    ode = torch.nn.Module()  # FaFp layout: net + aug_net with Flatten/ELU
    ode.net = torch.nn.ModuleList()
    ode.net.append(torch.nn.Flatten())
    ode.net.append(torch.nn.Linear(n_regions * latent_dim, net_sizes[0]))
    for l in range(1, len(net_sizes)):
        ode.net.append(torch.nn.ELU())
        ode.net.append(torch.nn.Linear(net_sizes[l - 1], net_sizes[l]))
    ode.net.append(torch.nn.Linear(net_sizes[-1], 2 * n_regions))
    ode.aug_net = torch.nn.ModuleList()
    ode.aug_net.append(torch.nn.Flatten())
    ode.aug_net.append(torch.nn.Linear(n_regions * latent_dim,
                                       aug_net_sizes[0]))
    for l in range(1, len(aug_net_sizes)):
        ode.aug_net.append(torch.nn.ELU())
        ode.aug_net.append(torch.nn.Linear(aug_net_sizes[l - 1],
                                           aug_net_sizes[l]))
    ode.aug_net.append(torch.nn.Linear(aug_net_sizes[-1], 3 * n_regions))

    dec = torch.nn.Module()
    dec.decoder = torch.nn.Sequential(
        torch.nn.Flatten(), torch.nn.Linear(n_regions * 3, n_regions))
    return enc, ode, dec


class TestTorchCheckpointMigration:
    def test_pth_roundtrip_matches_forward(self, tmp_path):
        n_regions, n_qs, latent_dim = 2, 4, 6
        q_sizes, ff_sizes = (24, 16), (12,)
        net_sizes, aug_net_sizes = (20, 20), (16, 16)

        torch.manual_seed(1)
        enc, ode, dec = build_reference_like_modules(
            n_regions, n_qs, latent_dim, q_sizes, ff_sizes, net_sizes,
            aug_net_sizes)
        prefix = str(tmp_path / "ref_")
        torch.save(enc.state_dict(), prefix + "enc.pth")
        torch.save(ode.state_dict(), prefix + "ode.pth")
        torch.save(dec.state_dict(), prefix + "dec.pth")

        model = UDEForecaster.build(
            n_regions=n_regions, latent_dim=latent_dim, n_qs=n_qs,
            ode_name="FaFp",
            enc_params={"q_sizes": q_sizes, "ff_sizes": ff_sizes},
            ode_params={"net_sizes": net_sizes,
                        "aug_net_sizes": aug_net_sizes})
        params = params_from_torch_checkpoint(prefix, "FaFp")

        # shape-compatible with a fresh init
        fresh = model.init(jax.random.PRNGKey(0))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(fresh)):
            assert a.shape == b.shape

        # oracle comparison through the tied-weight TorchOracle machinery:
        # rebuild the oracle from the SAME torch modules and compare forwards
        from tests.test_vae_forward import TorchOracle
        oracle = TorchOracle(n_regions, n_qs, latent_dim, q_sizes, ff_sizes,
                             net_sizes)
        # tie oracle's modules to the saved ones (enc + fp net + dec)
        for g_o, g_r in zip(oracle.grus, enc.rnn_layers):
            g_o.load_state_dict(g_r.state_dict())
        lin_ff = [m for m in enc.ff_layers
                  if isinstance(m, torch.nn.Linear)]
        for l_o, l_r in zip(list(oracle.ffs) + [oracle.ff_out], lin_ff):
            l_o.load_state_dict(l_r.state_dict())
        lin_fp = [m for m in ode.net if isinstance(m, torch.nn.Linear)]
        for l_o, l_r in zip(list(oracle.fps) + [oracle.fp_out], lin_fp):
            l_o.load_state_dict(l_r.state_dict())
        oracle.dec.load_state_dict(dec.decoder[1].state_dict())

        x = RNG.uniform(0, 1, (3, 12, n_regions * (n_qs + 1))).astype(np.float32)
        eps = RNG.standard_normal(
            (4, 3, n_regions, latent_dim - 1)).astype(np.float32)
        t = np.arange(4, dtype=np.float32)

        with torch.no_grad():
            y_t = oracle.forward(torch.tensor(x), torch.tensor(t),
                                 torch.tensor(eps))
        y_j, _ = model.apply(params, jnp.asarray(x), jnp.asarray(t),
                             jnp.asarray(eps), fa_w=0.0)
        # fa_w=0 isolates the fp path (the oracle has no aug net)
        np.testing.assert_allclose(np.asarray(y_j),
                                   y_t.detach().numpy(),
                                   rtol=5e-5, atol=5e-6)

    def test_bayes_and_fp_layouts(self, tmp_path):
        from fiude_tpu.models.bayes import BayesUDEParams
        from fiude_tpu.models.rhs import SIRRatesParams
        from fiude_tpu.train.torch_compat import ode_params_from_torch

        # Fp layout ("Fp_net.{i}")
        fp = torch.nn.Module()
        fp.Fp_net = torch.nn.ModuleList(
            [torch.nn.Flatten(), torch.nn.Linear(12, 8), torch.nn.ELU(),
             torch.nn.Linear(8, 8), torch.nn.Linear(8, 4)])
        p = ode_params_from_torch(fp.state_dict(), "Fp")
        assert isinstance(p, SIRRatesParams)
        assert len(p.fp_net) == 3
        assert p.fp_net[0].w.shape == (12, 8)

        # Bayes FaFp layout (Fp_net + aug_net with Dense_Variational keys)
        sd = {}
        for net, sizes in (("Fp_net", [(12, 8), (8, 4)]),
                           ("aug_net", [(12, 8), (8, 6)])):
            for i, (a, b) in enumerate(sizes):
                idx = 1 + 2 * i
                sd[f"{net}.{idx}.w_mean"] = torch.zeros(b, a)
                sd[f"{net}.{idx}.w_std"] = torch.ones(b, a)
                sd[f"{net}.{idx}.b_mean"] = torch.zeros(b)
                sd[f"{net}.{idx}.b_std"] = torch.ones(b)
        p = ode_params_from_torch(sd, "FaFp")
        assert isinstance(p, BayesUDEParams)
        assert len(p.fp_net) == 2 and len(p.aug_net) == 2
        assert p.fp_net[0].w_mean.shape == (12, 8)
