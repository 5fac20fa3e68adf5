"""Sharded training step: DP over batch x MC-ensemble sharding via pjit.

One compiled program per mesh: parameters and optimizer state are replicated,
the batch rides the ``data`` axis and the Monte-Carlo draws ride the
``sample`` axis.  Gradient all-reduce is inserted by XLA from the sharding
constraints (replicated params + sharded data -> psum over ICI); no explicit
collectives appear in user code — the idiomatic jax.sharding recipe.

This is the TPU-native replacement for the reference's "parallelism"
(24 single-threaded processes, ``run_stuff_linux.sh:3-6``): instead of one
config per process on one CPU core, one training step spans the slice, and
the 2048-system ODE ensemble (samples x batch) is sharded across chips.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fiude_tpu.models.vae import UDEForecaster
from fiude_tpu.train.losses import (
    AnnealConfig, LossConfig, compute_loss, kl_annealing,
)
from fiude_tpu.train.trainer import TrainState, _tree_select


def make_sharded_train_step(
    model: UDEForecaster,
    loss_cfg: LossConfig,
    opt,
    mesh: Mesh,
    *,
    anneal: AnnealConfig = AnnealConfig(),
    len_tr: int = 130,
    prior_params: Optional[Dict[str, Any]] = None,
    donate: bool = True,
    example_state: Optional["TrainState"] = None,
):
    """Build a jitted, mesh-sharded training step.

    Shardings: x/y sharded on batch -> ``data``; eps sharded (``sample``,
    ``data``) on its first two axes; t replicated.  The state is replicated
    unless the mesh has a ``model`` axis, in which case weight matrices (and
    their optimizer moments) shard Megatron-style over it
    (:mod:`fiude_tpu.parallel.tp`) — pass ``example_state`` so the state's
    sharding tree can be derived.

    Returns ``step(state, x, y, t, eps, fa_w, epoch, grad_lim) ->
    (state, metrics)`` — or, for Bayes models, ``step(state, x, y, t, eps,
    fa_w, epoch, grad_lim, rng)``: the PRNG key for the variational weight
    draw rides as a REPLICATED ninth argument, so every shard sees the
    identical weight sample (the replicated-rng contract; one global weight
    draw per step exactly like the single-chip scan, reference
    ``lib/in_development/models_bayes.py:30-48``), and the
    variational-layer KL (``get_kl``, ``:118-128``) joins the loss with
    ``ode_kl_w``.
    """
    prior_params = prior_params or {"means": [0.8, 0.55], "stds": [0.2, 0.2]}
    latent_dim = model.latent_dim
    axis_names = mesh.axis_names
    sample_axis = "sample" if "sample" in axis_names else None
    data_axis = "data" if "data" in axis_names else axis_names[-1]

    repl = NamedSharding(mesh, P())
    x_shard = NamedSharding(mesh, P(data_axis))
    eps_shard = NamedSharding(mesh, P(sample_axis, data_axis))

    state_shard: Any = repl
    if "model" in axis_names:
        if example_state is None:
            raise ValueError(
                "mesh has a 'model' axis: pass example_state so the "
                "tensor-parallel state sharding tree can be derived")
        from fiude_tpu.parallel.tp import tp_shardings
        state_shard = tp_shardings(example_state, mesh)

    is_bayes = getattr(model, "is_bayes", False)

    def _step(state: TrainState, x, y, t, eps, fa_w, epoch, grad_lim, rng):
        if loss_cfg.anneal:
            tr_step = state.tr_step + 1
            kl_w = kl_annealing(tr_step, anneal)
        else:
            tr_step = state.tr_step
            kl_w = jnp.asarray(1.0, jnp.float32)

        def loss_fn(params):
            y_pred, extras = model.apply(params, x, t, eps, fa_w=fa_w,
                                         rng=rng)
            ode_kl = None
            if is_bayes:
                from fiude_tpu.models.bayes import variational_kl
                ode_kl = variational_kl(
                    params.ode, getattr(model.ode, "prior_std", 0.1))
            loss, metrics = compute_loss(
                loss_cfg, y_pred, y, extras, kl_w=kl_w,
                latent_dim=latent_dim, len_tr=len_tr,
                prior_params=prior_params, ode_kl=ode_kl)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        apply_step = ((grad_norm < grad_lim)
                      | (state.skip_count >= 4) | (epoch <= 3))
        params = _tree_select(apply_step, new_params, state.params)
        opt_state = _tree_select(apply_step, new_opt_state, state.opt_state)
        skip_count = jnp.where(apply_step, 0, state.skip_count + 1).astype(jnp.int32)
        metrics = dict(metrics)
        metrics["grad_norm"] = grad_norm
        return TrainState(params, opt_state, tr_step, skip_count), metrics

    if is_bayes:
        # the key is replicated: one weight draw, broadcast to every shard
        return jax.jit(
            _step,
            in_shardings=(state_shard, x_shard, x_shard, repl, eps_shard,
                          repl, repl, repl, repl),
            out_shardings=(state_shard, repl),
            donate_argnums=(0,) if donate else (),
        )

    def step(state, x, y, t, eps, fa_w, epoch, grad_lim):
        return _step(state, x, y, t, eps, fa_w, epoch, grad_lim, None)

    return jax.jit(
        step,
        in_shardings=(state_shard, x_shard, x_shard, repl, eps_shard,
                      repl, repl, repl),
        out_shardings=(state_shard, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_fused_sharded_train_step(
    model: UDEForecaster,
    loss_cfg: LossConfig,
    opt,
    mesh: Mesh,
    *,
    sample_axis: str = "sample",
    anneal: AnnealConfig = AnnealConfig(),
    len_tr: int = 130,
    prior_params: Optional[Dict[str, Any]] = None,
    donate: bool = True,
):
    """Multi-chip FUSED training step: the training analogue of
    :class:`fiude_tpu.parallel.serving.ShardedFusedForecaster`.

    A ``pallas_call`` has no SPMD partitioning rule, so the fused
    fwd+bwd trajectory pair (:mod:`fiude_tpu.ops.pallas_train`) cannot ride
    jit-sharding like the XLA path in :func:`make_sharded_train_step`.
    Instead the per-device program is explicit ``shard_map``: the MC-draw
    axis of ``eps`` is split over ``mesh``'s ``sample`` axis, every device
    runs the SAME fused forward+backward kernels on its ensemble shard
    (weights replicated — zero inter-chip traffic during the solve), the
    loss is assembled from ONE psum round of sufficient statistics
    (:func:`fiude_tpu.train.losses.compute_loss_sharded`), and weight
    cotangents are psum'd over ICI.  The optimizer/skip epilogue runs
    replicated outside the shard_map.

    Pass a model built with ``fused_train=True``.  ``eps``'s sample axis
    must divide by the axis size.  Reference hot loop this scales:
    ``lib/VAE.py:137,200-223``.

    Bayes families ride a REPLICATED-rng contract: the PRNG key enters the
    shard_map with spec ``P()`` (identical on every device), the scalar
    kernel seed derived from it (``jax.random.randint`` in
    ``UDEForecaster.apply``) is therefore identical on every device, and the
    fused variational kernel's on-core PRNG (``pltpu.prng_seed`` +
    Box-Muller, :mod:`fiude_tpu.ops.pallas_bayes_train`) is a deterministic
    function of that seed — so all shards integrate with the SAME weight
    draw per RHS evaluation, matching single-chip semantics exactly
    (reference ``lib/in_development/models_bayes.py:30-48``).  Per-shard
    rngs would silently desynchronize the weight draw; never split the key
    over the mesh.  The variational-layer KL (params-only, replicated) is
    added via :func:`compute_loss_sharded`'s ``ode_kl`` term.  The returned
    step takes a ninth ``rng`` argument for Bayes models.
    """
    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map

    from fiude_tpu.train.losses import compute_loss_sharded

    prior_params = prior_params or {"means": [0.8, 0.55], "stds": [0.2, 0.2]}
    latent_dim = model.latent_dim
    is_bayes = getattr(model, "is_bayes", False)

    def grads_shard(params, kl_w, x, y, t, eps_l, fa_w, rng):
        """One device: fused fwd+bwd on the local eps shard -> psum'd
        grads + full-ensemble metrics (replicated).  ``rng`` is replicated
        (spec P()): one variational weight draw shared by every shard."""

        def loss_fn(p):
            y_pred, extras = model.apply(p, x, t, eps_l, fa_w=fa_w, rng=rng)
            ode_kl = None
            if is_bayes:
                from fiude_tpu.models.bayes import variational_kl
                ode_kl = variational_kl(
                    p.ode, getattr(model.ode, "prior_std", 0.1))
            return compute_loss_sharded(
                loss_cfg, y_pred, y, extras, axis=sample_axis, kl_w=kl_w,
                latent_dim=latent_dim, len_tr=len_tr,
                prior_params=prior_params, ode_kl=ode_kl)

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return jax.lax.psum(grads, sample_axis), metrics

    sharded_grads = shard_map(
        grads_shard, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(sample_axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)

    def _step(state: TrainState, x, y, t, eps, fa_w, epoch, grad_lim, rng):
        if loss_cfg.anneal:
            tr_step = state.tr_step + 1
            kl_w = kl_annealing(tr_step, anneal)
        else:
            tr_step = state.tr_step
            kl_w = jnp.asarray(1.0, jnp.float32)

        grads, metrics = sharded_grads(
            state.params, kl_w, x, y, t, eps,
            jnp.asarray(fa_w, jnp.float32), rng)
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = opt.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        apply_step = ((grad_norm < grad_lim)
                      | (state.skip_count >= 4) | (epoch <= 3))
        params = _tree_select(apply_step, new_params, state.params)
        opt_state = _tree_select(apply_step, new_opt_state, state.opt_state)
        skip_count = jnp.where(apply_step, 0,
                               state.skip_count + 1).astype(jnp.int32)
        metrics = dict(metrics)
        metrics["grad_norm"] = grad_norm
        return TrainState(params, opt_state, tr_step, skip_count), metrics

    repl = NamedSharding(mesh, P())
    eps_shard = NamedSharding(mesh, P(sample_axis))
    if is_bayes:
        return jax.jit(
            _step,
            in_shardings=(repl, repl, repl, repl, eps_shard, repl, repl,
                          repl, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )

    def step(state, x, y, t, eps, fa_w, epoch, grad_lim):
        # dummy key: apply ignores rng for non-Bayes RHS, but shard_map
        # needs a concrete replicated leaf in the rng slot
        return _step(state, x, y, t, eps, fa_w, epoch, grad_lim,
                     jax.random.PRNGKey(0))

    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, repl, eps_shard, repl, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_sharded_forecast(model: UDEForecaster, mesh: Mesh):
    """Jitted MC forecast with the ensemble sharded over the mesh."""
    axis_names = mesh.axis_names
    sample_axis = "sample" if "sample" in axis_names else None
    data_axis = "data" if "data" in axis_names else axis_names[-1]
    repl = NamedSharding(mesh, P())
    x_shard = NamedSharding(mesh, P(data_axis))
    eps_shard = NamedSharding(mesh, P(sample_axis, data_axis))

    def forecast(params, x, t, eps, fa_w):
        y_pred, _ = model.apply(params, x, t, eps, fa_w=fa_w)
        return y_pred

    return jax.jit(forecast,
                   in_shardings=(repl, x_shard, repl, eps_shard, repl),
                   out_shardings=repl)
