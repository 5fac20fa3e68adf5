"""Fused Pallas Back-GRU encoder vs the `ops.gru` scan path (interpret mode
on CPU; the same program compiles for TPU serving)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiude_tpu.models.encoders import BackGRUEncoder
from fiude_tpu.ops.pallas_gru import FusedBackGRUEncoder

RNG = np.random.default_rng(0)


def make(n_regions=2, n_qs=4, latent_dim=5, q_sizes=(24, 16), ff_sizes=(12,),
         uncertainty=True, seed=0):
    enc = BackGRUEncoder(n_regions=n_regions, n_qs=n_qs, latent_dim=latent_dim,
                         q_sizes=q_sizes, ff_sizes=ff_sizes,
                         uncertainty=uncertainty)
    params = enc.init(jax.random.PRNGKey(seed))
    return enc, params


class TestFusedEncoderParity:
    @pytest.mark.parametrize("q_sizes,ff_sizes", [
        ((24, 16), (12,)),          # 2 GRU layers, 2 FF layers
        ((16,), (12, 8)),           # 1 GRU layer, 3 FF layers
        ((256, 128), (64, 64)),     # bench-scale hidden sizes
    ])
    def test_matches_scan_path(self, q_sizes, ff_sizes):
        enc, params = make(q_sizes=q_sizes, ff_sizes=ff_sizes)
        fused = FusedBackGRUEncoder(enc, params)
        x = jnp.asarray(RNG.uniform(0, 1, (5, 17, 2 * 5)).astype(np.float32))
        m_ref, s_ref = enc.apply(params, x)
        m_f, s_f = fused(x)
        np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_no_uncertainty_path(self):
        enc, params = make(uncertainty=False)
        fused = FusedBackGRUEncoder(enc, params)
        x = jnp.asarray(RNG.uniform(0, 1, (3, 10, 10)).astype(np.float32))
        m_ref, s_ref = enc.apply(params, x)
        m_f, s_f = fused(x)
        assert s_ref is None and s_f is None
        np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_unpadded_batch(self):
        """B not a multiple of 8: kernel pads rows, output sliced back."""
        enc, params = make()
        fused = FusedBackGRUEncoder(enc, params)
        x = jnp.asarray(RNG.uniform(0, 1, (3, 9, 10)).astype(np.float32))
        m_ref, _ = enc.apply(params, x)
        m_f, _ = fused(x)
        assert m_f.shape == m_ref.shape
        np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_vmem_guard(self):
        enc, params = make(q_sizes=(256, 128), ff_sizes=(64, 64))
        fused = FusedBackGRUEncoder(enc, params, vmem_cap=1024)
        x = jnp.zeros((32, 42, 10), jnp.float32)
        with pytest.raises(ValueError, match="VMEM estimate"):
            fused(x)
