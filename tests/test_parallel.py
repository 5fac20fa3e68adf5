"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from fiude_tpu.data.synthetic import synthetic_dataset
from fiude_tpu.models import UDEForecaster
from fiude_tpu.parallel import (
    data_mesh, make_mesh, make_sharded_forecast, make_sharded_train_step,
    sample_data_mesh,
)
from fiude_tpu.train import TRAINING_INFO
from fiude_tpu.train.trainer import TrainState, Trainer


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU platform")


def small_model():
    return UDEForecaster.build(
        n_regions=2, latent_dim=6, n_qs=3, ode_name="FaFp",
        enc_params={"q_sizes": (16,), "ff_sizes": (12,)},
        ode_params={"net_sizes": (12, 12), "aug_net_sizes": (12, 12)})


def make_inputs(batch=16, n_samples=8, window=12, n_regions=2, n_qs=3, T=3):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, window, n_regions * (n_qs + 1))
                                ).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (batch, T, n_regions)).astype(np.float32))
    t = jnp.arange(T, dtype=jnp.float32)
    eps = jnp.asarray(rng.standard_normal(
        (n_samples, batch, n_regions, 5)).astype(np.float32))
    return x, y, t, eps


class TestMesh:
    def test_make_mesh_shapes(self):
        m = make_mesh([("sample", 2), ("data", 4)])
        assert m.devices.shape == (2, 4)
        m1 = data_mesh()
        assert m1.axis_names == ("data",)
        m2 = sample_data_mesh(8)
        assert int(np.prod(m2.devices.shape)) == 8


class TestShardedStep:
    def test_dp_step_runs_and_matches_single_device(self):
        model = small_model()
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        state0 = TrainState(params, opt.init(params),
                            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
        x, y, t, eps = make_inputs()
        args = (x, y, t, eps, jnp.asarray(1.0), jnp.asarray(0),
                jnp.asarray(5000.0))

        mesh = sample_data_mesh(8)
        step = make_sharded_train_step(model, TRAINING_INFO["UONN"], opt,
                                       mesh, donate=False)
        state1, metrics = step(state0, *args)
        assert np.isfinite(float(metrics["loss"]))

        # single-device oracle via the Trainer's own step
        tr = Trainer(model, loss_cfg=TRAINING_INFO["UONN"])
        tr.params = params
        tr.setup_training(lr=1e-3)
        # use a plain adam (not inject_hyperparams) comparison by rebuilding:
        state_ref, metrics_ref = _single_device_step(model, opt, state0, args)

        np.testing.assert_allclose(float(metrics["loss"]),
                                   float(metrics_ref["loss"]), rtol=1e-4)
        diff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state1.params, state_ref.params)
        assert max(jax.tree.leaves(diff)) < 1e-5

    def test_tp_step_matches_single_device(self):
        """3-D mesh (sample x data x model): weight matrices shard
        Megatron-style over the model axis; results match the replicated
        single-device step (GSPMD inserts the collectives)."""
        from fiude_tpu.parallel import tp_shardings

        model = small_model()
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        state0 = TrainState(params, opt.init(params),
                            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
        x, y, t, eps = make_inputs()
        args = (x, y, t, eps, jnp.asarray(1.0), jnp.asarray(0),
                jnp.asarray(5000.0))

        mesh = make_mesh([("sample", 2), ("data", 2), ("model", 2)])
        step = make_sharded_train_step(model, TRAINING_INFO["UONN"], opt,
                                       mesh, donate=False,
                                       example_state=state0)
        state1, metrics = step(state0, *args)

        # weight matrices really live sharded over the model axis
        sh = state1.params.ode.fp_net[0].w.sharding
        assert sh.spec == jax.sharding.PartitionSpec(None, "model")
        assert state1.params.ode.fp_net[1].w.sharding.spec == \
            jax.sharding.PartitionSpec("model", None)

        state_ref, metrics_ref = _single_device_step(model, opt, state0, args)
        np.testing.assert_allclose(float(metrics["loss"]),
                                   float(metrics_ref["loss"]), rtol=1e-4)
        diff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state1.params, state_ref.params)
        assert max(jax.tree.leaves(diff)) < 1e-5

    def test_tp_requires_example_state(self):
        model = small_model()
        opt = optax.adam(1e-3)
        mesh = make_mesh([("sample", 2), ("data", 2), ("model", 2)])
        with pytest.raises(ValueError, match="example_state"):
            make_sharded_train_step(model, TRAINING_INFO["UONN"], opt, mesh,
                                    donate=False)

    def test_sharded_forecast(self):
        model = small_model()
        params = model.init(jax.random.PRNGKey(1))
        mesh = sample_data_mesh(8)
        fc = make_sharded_forecast(model, mesh)
        x, y, t, eps = make_inputs()
        y_pred = fc(params, x, t, eps, jnp.asarray(1.0))
        assert y_pred.shape == (16, 8, 3, 2)
        assert np.all(np.isfinite(np.asarray(y_pred)))

    def test_fused_sharded_train_step_matches_single_device(self):
        """shard_map fused training (ops/pallas_train under a sample-axis
        mesh, one-psum sufficient-statistics loss, psum'd cotangents) must
        reproduce the single-device step: loss, every loss term, grad norm,
        and post-Adam params."""
        import dataclasses

        from fiude_tpu.parallel import make_mesh
        from fiude_tpu.parallel.train_step import make_fused_sharded_train_step

        model = small_model()
        fused = dataclasses.replace(model, fused_train=True)
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        state0 = TrainState(params, opt.init(params),
                            jnp.asarray(0, jnp.int32),
                            jnp.asarray(0, jnp.int32))
        x, y, t, eps = make_inputs()
        args = (x, y, t, eps, jnp.asarray(1.0), jnp.asarray(0),
                jnp.asarray(5000.0))

        mesh = make_mesh([("sample", 4)])
        step = make_fused_sharded_train_step(
            fused, TRAINING_INFO["UONN"], opt, mesh, donate=False)
        state1, metrics = step(state0, *args)

        state_ref, metrics_ref = _single_device_step(model, opt, state0,
                                                     args)
        for k in ("loss", "nll", "kl_latent", "kl_params", "Fa_norm",
                  "reg_loss"):
            np.testing.assert_allclose(
                float(metrics[k]), float(metrics_ref[k]), rtol=2e-4,
                err_msg=f"term {k} diverges from the single-device step")
        diff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state1.params, state_ref.params)
        assert max(jax.tree.leaves(diff)) < 1e-5

    def test_sharded_fused_forecast_matches_single_device(self):
        """The fused Pallas serving kernel under shard_map (ensemble split
        over the sample axis) matches the single-device fused forecaster."""
        from fiude_tpu.ops.pallas_ude import FusedForecaster
        from fiude_tpu.parallel import ShardedFusedForecaster

        model = small_model()
        params = model.init(jax.random.PRNGKey(2))
        x, _, t, eps = make_inputs()

        single = FusedForecaster(model, params, fa_w=1.0, tile_b=16,
                                 fuse_encoder=False)
        y_ref = np.asarray(single(x, t, eps))

        mesh = make_mesh([("sample", 4), ("data", 2)])
        sharded = ShardedFusedForecaster(model, params, mesh, fa_w=1.0,
                                         tile_b=16)
        y_sh = np.asarray(sharded(x, t, eps))
        assert y_sh.shape == y_ref.shape
        np.testing.assert_allclose(y_sh, y_ref, rtol=2e-5, atol=2e-6)


def _single_device_step(model, opt, state, args):
    from fiude_tpu.train.losses import compute_loss, kl_annealing, AnnealConfig
    from fiude_tpu.train.trainer import _tree_select
    x, y, t, eps, fa_w, epoch, grad_lim = args

    @jax.jit
    def step(state):
        tr_step = state.tr_step + 1
        kl_w = kl_annealing(tr_step, AnnealConfig())

        def loss_fn(params):
            y_pred, extras = model.apply(params, x, t, eps, fa_w=fa_w)
            return compute_loss(TRAINING_INFO["UONN"], y_pred, y, extras,
                                kl_w=kl_w, latent_dim=model.latent_dim,
                                len_tr=130)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        import optax as _o
        grad_norm = _o.global_norm(grads)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = _o.apply_updates(state.params, updates)
        ok = (grad_norm < grad_lim) | (state.skip_count >= 4) | (epoch <= 3)
        params = _tree_select(ok, new_params, state.params)
        opt_state = _tree_select(ok, new_opt, state.opt_state)
        return TrainState(params, opt_state, tr_step,
                          jnp.where(ok, 0, state.skip_count + 1).astype(jnp.int32)), metrics

    return step(state)
