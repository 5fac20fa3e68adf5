"""Device-mesh construction for the framework's parallel axes.

The reference's only multi-worker axis is "N independent CPU processes with a
file-lock queue" (``run_stuff_linux.sh``); TPU-native, the natural axes are:

* ``data``   — data parallelism over the training batch;
* ``sample`` — the Monte-Carlo ensemble axis (64-512 draws at train/test);
* ``config`` — population sweeps: one hyperparameter config per mesh slice
  (replaces the ``started.txt`` work queue).

All collectives ride ICI via XLA (psum under sharded jit); no NCCL/MPI-style
host code exists anywhere in the framework.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[Tuple[str, int]],
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh from (axis_name, size) pairs; size -1 = all remaining."""
    devices = list(devices if devices is not None else jax.devices())
    sizes = [s for _, s in axes]
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes = [len(devices) // known if s == -1 else s for s in sizes]
    names = tuple(n for n, _ in axes)
    arr = np.asarray(devices[: int(np.prod(sizes))]).reshape(sizes)
    return Mesh(arr, names)


def data_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh."""
    devices = jax.devices()[: n_devices] if n_devices else jax.devices()
    return make_mesh([("data", len(devices))], devices)


def sample_data_mesh(n_devices: Optional[int] = None,
                     sample_axis: Optional[int] = None) -> Mesh:
    """2-D (sample, data) mesh: MC-ensemble x batch sharding."""
    devices = jax.devices()[: n_devices] if n_devices else jax.devices()
    n = len(devices)
    if sample_axis is None:
        sample_axis = 1
        for cand in (2, 4, 8):
            if n % cand == 0 and cand <= n:
                sample_axis = cand
    return make_mesh([("sample", sample_axis), ("data", n // sample_axis)],
                     devices)


def config_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D sweep mesh: one hyperparameter config (or group) per device."""
    devices = jax.devices()[: n_devices] if n_devices else jax.devices()
    return make_mesh([("config", len(devices))], devices)


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
