"""Multi-chip BAYES training on the virtual 8-device CPU mesh.

The replicated-rng contract (fiude_tpu/parallel/train_step.py): the
variational weight draw rides ONE replicated PRNG key, so every shard
integrates with the SAME weight sample while the MC ensemble shards over
(sample, data) — single-chip semantics exactly (reference
``lib/in_development/models_bayes.py:30-48``), with the variational-layer
KL (``get_kl``, ``:118-128``) joining the loss via ``ode_kl_w``.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from fiude_tpu.models import UDEForecaster
from fiude_tpu.parallel import make_mesh, make_sharded_train_step, sample_data_mesh
from fiude_tpu.train import TRAINING_INFO
from fiude_tpu.train.trainer import TrainState, _tree_select

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU platform")


def small_bayes_model(**kw):
    return UDEForecaster.build(
        n_regions=2, latent_dim=6, n_qs=3, ode_name="UONNb",
        enc_params={"q_sizes": (16,), "ff_sizes": (12,)},
        ode_params={"net_sizes": (12, 12), "aug_net_sizes": (12, 12)}, **kw)


def make_inputs(batch=16, n_samples=8, window=12, n_regions=2, n_qs=3, T=3):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, window, n_regions * (n_qs + 1))
                                ).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (batch, T, n_regions)).astype(np.float32))
    t = jnp.arange(T, dtype=jnp.float32)
    eps = jnp.asarray(rng.standard_normal(
        (n_samples, batch, n_regions, 5)).astype(np.float32))
    return x, y, t, eps


def _single_device_bayes_step(model, opt, state, args, rng):
    """Single-chip oracle: the Trainer._build_step semantics (rng-threaded
    apply + variational_kl ode_kl term) as one plain jitted step."""
    from fiude_tpu.models.bayes import variational_kl
    from fiude_tpu.train.losses import AnnealConfig, compute_loss, kl_annealing

    x, y, t, eps, fa_w, epoch, grad_lim = args
    loss_cfg = TRAINING_INFO["UONNb"]

    @jax.jit
    def step(state, rng):
        tr_step = state.tr_step + 1
        kl_w = kl_annealing(tr_step, AnnealConfig())

        def loss_fn(params):
            y_pred, extras = model.apply(params, x, t, eps, fa_w=fa_w,
                                         rng=rng)
            ode_kl = variational_kl(params.ode,
                                    getattr(model.ode, "prior_std", 0.1))
            return compute_loss(loss_cfg, y_pred, y, extras, kl_w=kl_w,
                                latent_dim=model.latent_dim, len_tr=130,
                                ode_kl=ode_kl)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grad_norm = optax.global_norm(grads)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ok = (grad_norm < grad_lim) | (state.skip_count >= 4) | (epoch <= 3)
        params = _tree_select(ok, new_params, state.params)
        opt_state = _tree_select(ok, new_opt, state.opt_state)
        metrics = dict(metrics)
        metrics["grad_norm"] = grad_norm
        return TrainState(params, opt_state, tr_step,
                          jnp.where(ok, 0, state.skip_count + 1).astype(
                              jnp.int32)), metrics

    return step(state, rng)


class TestShardedBayesStep:
    def test_bayes_step_matches_single_chip(self):
        """pjit Bayes step on a sample x data mesh == single-chip scan step
        given the SAME replicated key: loss, every term incl. ode_kl, and
        post-Adam params."""
        model = small_bayes_model()
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        state0 = TrainState(params, opt.init(params),
                            jnp.asarray(0, jnp.int32),
                            jnp.asarray(0, jnp.int32))
        x, y, t, eps = make_inputs()
        args = (x, y, t, eps, jnp.asarray(1.0), jnp.asarray(0),
                jnp.asarray(5000.0))
        key = jax.random.PRNGKey(7)

        mesh = sample_data_mesh(8)
        step = make_sharded_train_step(model, TRAINING_INFO["UONNb"], opt,
                                       mesh, donate=False)
        state1, metrics = step(state0, *args, key)

        state_ref, metrics_ref = _single_device_bayes_step(
            model, opt, state0, args, key)

        assert "ode_kl" in metrics and "ode_kl" in metrics_ref
        for k in ("loss", "nll", "kl_latent", "kl_params", "ode_kl",
                  "grad_norm"):
            np.testing.assert_allclose(
                float(metrics[k]), float(metrics_ref[k]), rtol=2e-4,
                err_msg=f"term {k} diverges from the single-chip step")
        diff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state1.params, state_ref.params)
        assert max(jax.tree.leaves(diff)) < 1e-5

    def test_bayes_weight_draw_is_key_deterministic(self):
        """Same key -> identical sharded step output; different key ->
        different NLL (the weight draw really flows through the sharded
        step rather than being silently fixed)."""
        model = small_bayes_model()
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        state0 = TrainState(params, opt.init(params),
                            jnp.asarray(0, jnp.int32),
                            jnp.asarray(0, jnp.int32))
        x, y, t, eps = make_inputs()
        args = (x, y, t, eps, jnp.asarray(1.0), jnp.asarray(0),
                jnp.asarray(5000.0))
        mesh = sample_data_mesh(8)
        step = make_sharded_train_step(model, TRAINING_INFO["UONNb"], opt,
                                       mesh, donate=False)
        _, m_a = step(state0, *args, jax.random.PRNGKey(7))
        _, m_a2 = step(state0, *args, jax.random.PRNGKey(7))
        _, m_b = step(state0, *args, jax.random.PRNGKey(8))
        np.testing.assert_allclose(float(m_a["nll"]), float(m_a2["nll"]),
                                   rtol=0, atol=0)
        assert abs(float(m_a["nll"]) - float(m_b["nll"])) > 1e-7

    def test_fused_bayes_sharded_step_matches_single_chip_fused(self):
        """shard_map fused Bayes training (interpret-mode Mosaic on CPU,
        where the on-core PRNG is stubbed -> both sides see the same zero
        weight noise) pins the replicated-rng plumbing, the one-psum
        sufficient-statistics loss with the ode_kl term, and psum'd
        cotangents against the single-chip fused step."""
        import warnings

        from fiude_tpu.parallel.train_step import make_fused_sharded_train_step

        model = small_bayes_model()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # interpreter-PRNG warning
            fused = dataclasses.replace(model, fused_train=True)
            params = model.init(jax.random.PRNGKey(0))
            opt = optax.adam(1e-3)
            state0 = TrainState(params, opt.init(params),
                                jnp.asarray(0, jnp.int32),
                                jnp.asarray(0, jnp.int32))
            x, y, t, eps = make_inputs()
            args = (x, y, t, eps, jnp.asarray(1.0), jnp.asarray(0),
                    jnp.asarray(5000.0))
            key = jax.random.PRNGKey(7)

            mesh = make_mesh([("sample", 4)])
            step = make_fused_sharded_train_step(
                fused, TRAINING_INFO["UONNb"], opt, mesh, donate=False)
            state1, metrics = step(state0, *args, key)

            state_ref, metrics_ref = _single_device_bayes_step(
                fused, opt, state0, args, key)

        for k in ("loss", "nll", "kl_latent", "kl_params", "ode_kl"):
            np.testing.assert_allclose(
                float(metrics[k]), float(metrics_ref[k]), rtol=2e-4,
                err_msg=f"term {k} diverges from the single-chip fused step")
        diff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state1.params, state_ref.params)
        assert max(jax.tree.leaves(diff)) < 1e-5
