"""Tensor parallelism: Megatron-style sharding specs for the model pytrees.

The reference has no intra-model parallelism of any kind (its only axis is
24 independent CPU processes, ``run_stuff_linux.sh:3-6``); this module adds
the TPU-native third mesh axis — ``model`` — so one forecaster's weight
matrices shard across chips and XLA inserts the collectives (the idiomatic
GSPMD recipe: annotate shardings, let the partitioner place all-gathers /
reduce-scatters on ICI).

Scheme (classic column/row pairing):

* MLP stacks (RHS ``fp_net``/``aug_net``, encoder ``ff``): even layers are
  **column-parallel** — weight ``(in, out)`` sharded ``P(None, 'model')``,
  bias sharded — odd layers **row-parallel** — weight sharded
  ``P('model', None)``, bias replicated (its add follows the psum).
* Recurrent layers (GRU/LSTM, any encoder family): gate projections
  ``w_ih``/``w_hh`` ``(in, 3H or 4H)`` are column-parallel over the
  concatenated gate axis, biases sharded.
* Everything else (decoder, scalars, optimizer counts) replicated.

Specs are assigned by *tree path* (``jax.tree_util.keystr``), so the same
rule maps a ``TrainState`` — params AND the optimizer's ``mu``/``nu``
moments, which nest the same sub-paths — without per-optimizer plumbing.
Axis sizes that don't divide evenly fall back to replicated (GSPMD would
pad; for these small models replication is cheaper than ragged shards).
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MLP = re.compile(r"\.(?:fp_net|aug_net|ff)\[(\d+)\]\.(w|b)$")
# gate projections of any recurrent cell (GRU 3H / LSTM 4H), any encoder
# family's params tree (grus / i_layers / q_layers / layers)
_GRU = re.compile(r"\.(w_ih|w_hh|b_ih|b_hh)$")


def tp_spec(path_str: str, leaf, n_shards: int,
            model_axis: str = "model") -> P:
    """PartitionSpec for one leaf, keyed on its tree path (see module doc)."""
    shape = getattr(leaf, "shape", ())

    m = _MLP.search(path_str)
    if m is not None:
        idx, kind = int(m.group(1)), m.group(2)
        if idx % 2 == 0:  # column-parallel
            if kind == "w" and len(shape) == 2 and shape[1] % n_shards == 0:
                return P(None, model_axis)
            if kind == "b" and len(shape) == 1 and shape[0] % n_shards == 0:
                return P(model_axis)
        else:             # row-parallel
            if kind == "w" and len(shape) == 2 and shape[0] % n_shards == 0:
                return P(model_axis, None)
        return P()

    m = _GRU.search(path_str)
    if m is not None:
        name = m.group(1)
        if name.startswith("w") and len(shape) == 2 \
                and shape[1] % n_shards == 0:
            return P(None, model_axis)
        if name.startswith("b") and len(shape) == 1 \
                and shape[0] % n_shards == 0:
            return P(model_axis)
        return P()

    return P()


def tp_shardings(tree, mesh: Mesh, *, model_axis: str = "model"):
    """NamedSharding tree for ``tree`` (params, a TrainState, an optimizer
    state, ...) with weight matrices sharded over ``mesh``'s model axis."""
    n = mesh.shape[model_axis]

    def one(path, leaf):
        return NamedSharding(mesh, tp_spec(jax.tree_util.keystr(path), leaf,
                                           n, model_axis))

    return jax.tree_util.tree_map_with_path(one, tree)
