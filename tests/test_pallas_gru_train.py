"""Gradient parity of the fused training encoder (ops/pallas_gru_train.py)
against ``jax.grad`` of the XLA-scan ``BackGRUEncoder.apply`` path.

Runs the Pallas kernels in interpret mode on CPU; checks the forward values
and EVERY weight/bias cotangent (GRU layers + FF head) to tight tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiude_tpu.models.encoders import BackGRUEncoder
from fiude_tpu.ops.pallas_gru_train import fused_backgru_train_apply


def build(n_regions=3, n_qs=2, latent_dim=6, q_sizes=(12, 8), ff_sizes=(8,)):
    enc = BackGRUEncoder(n_regions=n_regions, n_qs=n_qs,
                         latent_dim=latent_dim, q_sizes=q_sizes,
                         ff_sizes=ff_sizes)
    params = enc.init(jax.random.PRNGKey(0))
    return enc, params


def loss_pair(enc, x):
    def scan_loss(params):
        mean, std = enc.apply(params, x)
        return jnp.sum(mean ** 2) + 0.5 * jnp.sum(std * mean)

    def fused_loss(params):
        mean, std = fused_backgru_train_apply(enc, params, x,
                                              interpret=True)
        return jnp.sum(mean ** 2) + 0.5 * jnp.sum(std * mean)

    return scan_loss, fused_loss


def assert_grads_close(g_ref, g_fused, rtol=1e-5, atol=1e-6):
    leaves_r, tree_r = jax.tree.flatten(g_ref)
    leaves_f, tree_f = jax.tree.flatten(g_fused)
    assert tree_r == tree_f
    for lr, lf in zip(leaves_r, leaves_f):
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lr),
                                   rtol=rtol, atol=atol)


class TestVmemGuard:
    def test_flagship_fits_large_batch_does_not(self):
        from fiude_tpu.ops.pallas_gru_train import fits_vmem
        enc = BackGRUEncoder(n_regions=49, n_qs=8, latent_dim=8,
                             q_sizes=(256, 128), ff_sizes=(64, 64))
        assert fits_vmem(enc, batch=32, seq_len=42)
        assert not fits_vmem(enc, batch=256, seq_len=42)

    def test_encode_falls_back_to_scan_when_over_budget(self):
        """UDEForecaster._encode with fused_train must not route an
        over-VMEM shape into the kernel — it silently takes the XLA scan."""
        import dataclasses

        from fiude_tpu.models import UDEForecaster

        model = UDEForecaster.build(
            n_regions=3, latent_dim=6, n_qs=2, ode_name="FaFp",
            enc_params={"q_sizes": (12, 8), "ff_sizes": (8,)},
            ode_params={"net_sizes": (8, 8), "aug_net_sizes": (8, 8)})
        model = dataclasses.replace(model, fused_train=True)
        params = model.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(5)
        x_big = jnp.asarray(rng.uniform(
            0, 1, (4096, 9, model.encoder.input_size)).astype(np.float32))
        from fiude_tpu.ops.pallas_gru_train import fits_vmem
        assert not fits_vmem(model.encoder, batch=4096, seq_len=9)
        m_f, s_f = model._encode(params.enc, x_big)
        m_r, s_r = model.encoder.apply(params.enc, x_big)
        np.testing.assert_array_equal(np.asarray(m_f), np.asarray(m_r))
        np.testing.assert_array_equal(np.asarray(s_f), np.asarray(s_r))


class TestFusedEncoderGrad:
    @pytest.mark.parametrize("q_sizes,ff_sizes", [
        ((12, 8), (8,)),      # 2 GRU layers, 3 FF layers (reference shape)
        ((16,), (8, 8)),      # 1 GRU layer, 4 FF layers
        # NOTE: ff_sizes=() (single-linear head) is not a reachable config —
        # models/nn.py:mlp_apply requires at least one hidden layer.
    ])
    def test_value_and_grad_parity(self, q_sizes, ff_sizes):
        enc, params = build(q_sizes=q_sizes, ff_sizes=ff_sizes)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(0, 1, (4, 9, enc.input_size))
                        .astype(np.float32))
        scan_loss, fused_loss = loss_pair(enc, x)
        v_ref, g_ref = jax.value_and_grad(scan_loss)(params)
        v_fus, g_fus = jax.value_and_grad(fused_loss)(params)
        np.testing.assert_allclose(float(v_fus), float(v_ref), rtol=1e-6)
        assert_grads_close(g_ref, g_fus)

    def test_batch_not_multiple_of_8(self):
        enc, params = build()
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(0, 1, (5, 7, enc.input_size))
                        .astype(np.float32))
        scan_loss, fused_loss = loss_pair(enc, x)
        g_ref = jax.grad(scan_loss)(params)
        g_fus = jax.grad(fused_loss)(params)
        assert_grads_close(g_ref, g_fus)

    def test_forward_matches_serving_contract(self):
        enc, params = build()
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(0, 1, (4, 9, enc.input_size))
                        .astype(np.float32))
        m_ref, s_ref = enc.apply(params, x)
        m_fus, s_fus = fused_backgru_train_apply(enc, params, x,
                                                 interpret=True)
        np.testing.assert_allclose(np.asarray(m_fus), np.asarray(m_ref),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s_fus), np.asarray(s_ref),
                                   rtol=1e-6, atol=1e-6)

    def test_under_jit_with_reference_window(self):
        """Reference window shape (42 steps) under jit, grad wrt params."""
        enc, params = build(n_regions=2, n_qs=3, q_sizes=(12, 8),
                            ff_sizes=(8,))
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(0, 1, (8, 42, enc.input_size))
                        .astype(np.float32))
        scan_loss, fused_loss = loss_pair(enc, x)
        g_ref = jax.jit(jax.grad(scan_loss))(params)
        g_fus = jax.jit(jax.grad(fused_loss))(params)
        assert_grads_close(g_ref, g_fus, rtol=2e-5, atol=1e-5)
