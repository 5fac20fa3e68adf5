"""Minimal functional NN primitives: params are pytrees, applies are pure.

Initializers replicate torch defaults so training dynamics match the
reference:

* ``init_dense``: torch ``nn.Linear`` default — Kaiming-uniform weights
  (a=sqrt(5)) which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)), bias
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
* ``init_dense_normal``: the reference decoder init — N(0, std^2) weights,
  zero bias (reference ``lib/utils.py:69-73``).

MLP stacking conventions follow the reference's ``nn.ModuleList`` ordering
exactly (reference ``lib/models.py:118-124``): ``Linear, (ACT, Linear)*,
Linear`` — i.e. activation *between* hidden layers and **no** activation
before the final projection (so the last hidden layer output feeds two
consecutive linear layers — a reference quirk preserved for parity).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp


class Dense(NamedTuple):
    w: jnp.ndarray  # (in_features, out_features) — stored transposed vs torch
    b: jnp.ndarray  # (out_features,)


def init_dense(key, in_features: int, out_features: int, dtype=jnp.float32) -> Dense:
    """torch nn.Linear default init."""
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_features, jnp.float32))
    kw, kb = jax.random.split(key)
    return Dense(
        w=jax.random.uniform(kw, (in_features, out_features), dtype, -bound, bound),
        b=jax.random.uniform(kb, (out_features,), dtype, -bound, bound),
    )


def init_dense_normal(key, in_features: int, out_features: int, std: float = 0.1,
                      dtype=jnp.float32) -> Dense:
    """Reference decoder init: weights N(0, std^2), bias 0 (lib/utils.py:69)."""
    return Dense(
        w=std * jax.random.normal(key, (in_features, out_features), dtype),
        b=jnp.zeros((out_features,), dtype),
    )


def dense(p: Dense, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p.w + p.b


def init_mlp(key, sizes: Sequence[int], dtype=jnp.float32) -> Tuple[Dense, ...]:
    """Chain of Dense layers: sizes = [in, h0, ..., out]."""
    keys = jax.random.split(key, len(sizes) - 1)
    return tuple(
        init_dense(k, sizes[i], sizes[i + 1], dtype) for i, k in enumerate(keys)
    )


def mlp_apply(layers: Sequence[Dense], x: jnp.ndarray, activation) -> jnp.ndarray:
    """Reference ordering: L0, (act, L1), ..., (act, L_{n-1}), L_out.

    Activation between hidden layers only; the final layer consumes the last
    hidden output with no activation (parity with lib/models.py:118-124 and
    the encoder FF head lib/models.py:74-86).
    """
    hidden, out = layers[:-1], layers[-1]
    x = dense(hidden[0], x)
    for layer in hidden[1:]:
        x = dense(layer, activation(x))
    return dense(out, x)


def elu_mlp(layers: Sequence[Dense], x: jnp.ndarray) -> jnp.ndarray:
    return mlp_apply(layers, x, jax.nn.elu)


def relu_mlp(layers: Sequence[Dense], x: jnp.ndarray) -> jnp.ndarray:
    return mlp_apply(layers, x, jax.nn.relu)


def mlp_apply_standard(layers: Sequence[Dense], x: jnp.ndarray,
                       activation) -> jnp.ndarray:
    """Conventional MLP ordering: activation after every layer except the
    final projection — the legacy ``FFNetwork`` convention
    (reference ``lib/Old/old_models.py:165-186``), which unlike
    :func:`mlp_apply` does activate the input of the last layer."""
    for layer in layers[:-1]:
        x = activation(dense(layer, x))
    return dense(layers[-1], x)


def relu_mlp_standard(layers: Sequence[Dense], x: jnp.ndarray) -> jnp.ndarray:
    return mlp_apply_standard(layers, x, jax.nn.relu)
