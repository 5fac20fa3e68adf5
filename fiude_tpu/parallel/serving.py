"""Multi-chip serving of the fused Pallas trajectory kernel.

The single-chip serving path (`ops/pallas_ude.FusedForecaster`) runs the
whole trajectory+decode as one kernel launch; this module scales it across
a device mesh with ``shard_map``: the Monte-Carlo ensemble is split over
the ``sample`` axis, every device runs the SAME fused kernel on its
ensemble shard (weights replicated, zero inter-chip traffic during the
solve), and the forecast concatenates on the way out.  This is the
TPU-native form of scaling the reference's test-time 128-512-sample
ensembles (``lib/utils.py:20``, ``lib/Old/test_odes.py:278``).

``shard_map`` (not bare jit-sharding) because a ``pallas_call`` has no
SPMD partitioning rule — the per-shard program must be explicit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pre-0.8 jax
    from jax.experimental.shard_map import shard_map

from fiude_tpu.models.vae import reparam
from fiude_tpu.ops.pallas_ude import FusedForecaster, fused_trajectory_decode, to_cm


class ShardedFusedForecaster:
    """Mesh-parallel MC forecast through the fused trajectory kernel.

    Same contract as :class:`FusedForecaster` — ``__call__(x, t, eps) ->
    (B, S, T, R)`` — with ``eps``'s sample axis sharded over
    ``mesh``'s ``sample`` axis.  ``n_samples`` must divide by the axis
    size.  Encoding runs once (replicated); each device solves its
    ensemble shard in one kernel launch.
    """

    def __init__(self, model, params, mesh: Mesh, *, fa_w: float = 1.0,
                 tile_b: int = 1024, sample_axis: str = "sample",
                 interpret: Optional[bool] = None):
        self.fused = FusedForecaster(model, params, fa_w=fa_w, tile_b=tile_b,
                                     interpret=interpret, fuse_encoder=False)
        self.mesh = mesh
        self.sample_axis = sample_axis
        self.n_shards = mesh.shape[sample_axis]
        self._pipelines = {}

    def _pipeline(self, T: int, dt: float, tile: int):
        key = (T, dt, tile)
        fn = self._pipelines.get(key)
        if fn is not None:
            return fn
        fused, model = self.fused, self.fused.model
        mesh, axis = self.mesh, self.sample_axis

        def solve_shard(z_cm):
            """One device's ensemble shard through the fused kernel."""
            y = fused_trajectory_decode(
                z_cm, fused.weights, fused.dec_w, fused.dec_b,
                T=T, dt=dt, R=model.n_regions, L=model.latent_dim,
                n_fp_layers=fused.n_fp_layers,
                n_aug_layers=fused.n_aug_layers,
                fa_w=fused.fa_w, tile_b=tile, interpret=fused.interpret,
                compute_dtype=fused.compute_dtype)
            return y  # (T, S_shard*B, R)

        # the pallas_call's ShapeDtypeStruct carries no vma/replication info,
        # so the varying-across-mesh check must be off (jax>=0.8: check_vma;
        # older experimental shard_map: check_rep)
        try:
            sharded_solve = shard_map(
                solve_shard, mesh=mesh,
                in_specs=(P(axis),), out_specs=P(None, axis),
                check_vma=False)
        except TypeError:
            sharded_solve = shard_map(
                solve_shard, mesh=mesh,
                in_specs=(P(axis),), out_specs=P(None, axis),
                check_rep=False)

        def pipeline(enc_params, x, eps):
            n_samples, batch = eps.shape[0], eps.shape[1]
            mean, std = model.encoder.apply(enc_params, x)
            z = reparam(eps, std, mean) \
                + jnp.asarray(model.ic_jitter, jnp.float32)
            y = sharded_solve(to_cm(z))                 # (T, S*B, R)
            y = y.reshape(T, n_samples, batch, model.n_regions)
            return jnp.transpose(y, (2, 1, 0, 3))       # (B, S, T, R)

        fn = jax.jit(pipeline)
        self._pipelines[key] = fn
        return fn

    def __call__(self, x, t, eps):
        t = np.asarray(t)
        dts = np.diff(t)
        assert np.allclose(dts, dts[0], rtol=1e-5), \
            "fused path requires a uniform time grid"
        n_samples, batch = eps.shape[0], eps.shape[1]
        assert n_samples % self.n_shards == 0, (
            f"n_samples={n_samples} must divide over the {self.n_shards}-way "
            f"'{self.sample_axis}' mesh axis")
        shard_rows = (n_samples // self.n_shards) * batch
        tile = min(self.fused.tile_b, shard_rows)
        while shard_rows % tile != 0:
            tile //= 2
        return self._pipeline(len(t), float(dts[0]), tile)(
            self.fused.params.enc, jnp.asarray(x), jnp.asarray(eps))
