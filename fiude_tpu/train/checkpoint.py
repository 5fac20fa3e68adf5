"""Three-part (enc/ode/dec) checkpointing with torch ``strict=False`` merge.

Parity with reference ``lib/VAE.py:293-334``: encoder, ODE and decoder param
trees are saved separately (enabling the CONN -> UONN transfer recipe,
``testing_pre_train.py:132-136``); loading merges by key path + shape and
silently keeps the template's values for missing/mismatched entries
(``strict=False`` semantics).

Format: one ``.npz`` per part with tree-key-path strings as array names —
host-portable, no pickles.

Improvement over the reference: the Fp sub-network is named ``fp_net`` in
both :class:`SIRRatesParams` and :class:`UDEParams`, so a CONN -> UONN load
actually transfers the mechanistic net (in the reference the names differ —
``Fp_net`` vs ``net`` — so torch's strict=False silently transferred nothing
for the ODE).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def tree_to_flat_dict(tree) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def merge_flat_dict(template, flat: Dict[str, np.ndarray], strict: bool = False):
    """Rebuild a tree shaped like ``template`` taking values from ``flat``
    where key path and shape match (torch load_state_dict(strict=False))."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = jax.tree_util.keystr(path)
        if key in flat and flat[key].shape == np.asarray(leaf).shape:
            leaves.append(jax.numpy.asarray(flat[key], dtype=leaf.dtype))
        elif strict:
            raise KeyError(f"missing or mismatched checkpoint entry {key!r}")
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _ensure_dir(prefix: str):
    d = os.path.dirname(prefix)
    if d:
        os.makedirs(d, exist_ok=True)


def save_params(prefix: str, params) -> None:
    """Save ``params`` (UDEForecasterParams-like with .enc/.ode/.dec) as
    ``{prefix}{enc,ode,dec}.npz`` (reference lib/VAE.py:308-315)."""
    _ensure_dir(prefix)
    for part in ("enc", "ode", "dec"):
        np.savez(f"{prefix}{part}.npz", **tree_to_flat_dict(getattr(params, part)))


def load_params(template, prefix: str, strict: bool = False):
    """Load a three-part checkpoint into the shape of ``template``."""
    parts = {}
    for part in ("enc", "ode", "dec"):
        path = f"{prefix}{part}.npz"
        with np.load(path) as data:
            flat = {k: data[k] for k in data.files}
        parts[part] = merge_flat_dict(getattr(template, part), flat, strict=strict)
    return template._replace(**parts)
