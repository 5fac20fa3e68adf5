"""Bayesian variational RHS variants (reference ``lib/in_development/models_bayes.py``).

:class:`DenseVariationalParams` holds mean-field Gaussian weights; each apply
draws fresh ``z ~ N(0,1)`` and uses ``w = w_mean + z * |w_std|`` — in the
reference this happens at *every* RHS evaluation (``make_z`` per forward,
``models_bayes.py:30-48``), reproduced here by threading a per-(step, stage)
PRNG key through the integrator (see ``ops.integrate._wrap_rhs``).

The variational KL regularizer mirrors ``get_kl``
(``models_bayes.py:118-128``): per layer,
``(KL(q_w || N(0, prior_std)).mean() + KL(q_b || ...).mean()) / 2``, averaged
over layers; weighted by ``ode_kl_w`` (= 1/153 in ``run_ode.py:144``) in the
loss.

Init parity: ``w_mean`` Kaiming-uniform (a=sqrt(5)) == U(+-1/sqrt(fan_in)),
``w_std`` = 0.1, ``b_mean`` U(+-1/sqrt(fan_in)), ``b_std`` = 0.1
(``models_bayes.py:34-41``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fiude_tpu.models.rhs import (
    _out_of_range_mask, _pad_tail, _sir_field,
)
from fiude_tpu.ops.stats import kl_normal


class DenseVariationalParams(NamedTuple):
    w_mean: jnp.ndarray  # (in, out) — transposed vs torch
    w_std: jnp.ndarray   # (in, out)
    b_mean: jnp.ndarray  # (out,)
    b_std: jnp.ndarray   # (out,)


def init_dense_variational(key, in_features: int, out_features: int,
                           dtype=jnp.float32) -> DenseVariationalParams:
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_features, jnp.float32))
    kw, kb = jax.random.split(key)
    return DenseVariationalParams(
        w_mean=jax.random.uniform(kw, (in_features, out_features), dtype,
                                  -bound, bound),
        w_std=jnp.full((in_features, out_features), 0.1, dtype),
        b_mean=jax.random.uniform(kb, (out_features,), dtype, -bound, bound),
        b_std=jnp.full((out_features,), 0.1, dtype),
    )


def dense_variational(p: DenseVariationalParams, x, key):
    kw, kb = jax.random.split(key)
    w = p.w_mean + jax.random.normal(kw, p.w_mean.shape, p.w_mean.dtype) \
        * jnp.abs(p.w_std)
    b = p.b_mean + jax.random.normal(kb, p.b_mean.shape, p.b_mean.dtype) \
        * jnp.abs(p.b_std)
    return x @ w + b


def variational_elu_mlp(layers: Tuple[DenseVariationalParams, ...], x, key):
    """Reference layer ordering: L0, (ELU, Li)*, L_out — no activation before
    the final projection."""
    keys = jax.random.split(key, len(layers))
    hidden, out = layers[:-1], layers[-1]
    x = dense_variational(hidden[0], x, keys[0])
    for i, layer in enumerate(hidden[1:], start=1):
        x = dense_variational(layer, jax.nn.elu(x), keys[i])
    return dense_variational(out, x, keys[-1])


def _layer_kl(p: DenseVariationalParams, prior_std: float):
    kw = kl_normal(p.w_mean, jnp.abs(p.w_std), 0.0, prior_std)
    kb = kl_normal(p.b_mean, jnp.abs(p.b_std), 0.0, prior_std)
    return (jnp.mean(kw) + jnp.mean(kb)) / 2.0


def variational_kl(params, prior_std: float = 0.1):
    """Mean layer-wise KL(q || prior) over every DenseVariationalParams in
    the tree (reference get_kl, models_bayes.py:118-128)."""
    layers = [l for l in jax.tree.leaves(
        params, is_leaf=lambda x: isinstance(x, DenseVariationalParams))
        if isinstance(l, DenseVariationalParams)]
    if not layers:
        return jnp.asarray(0.0, jnp.float32)
    kl = sum(_layer_kl(l, prior_std) for l in layers)
    return kl / len(layers)


def _init_var_mlp(key, sizes, dtype):
    keys = jax.random.split(key, len(sizes) - 1)
    return tuple(init_dense_variational(k, sizes[i], sizes[i + 1], dtype)
                 for i, k in enumerate(keys))


@dataclasses.dataclass(frozen=True)
class BayesSIRRates:
    """CONNb: SIR with variational neural rates (models_bayes.py:69-128)."""
    n_regions: int = 1
    latent_dim: int = 8
    net_sizes: Tuple[int, ...] = (20, 20)
    prior_std: float = 0.1
    dtype: str = "float32"

    ode_type: str = "Fp"
    uncertainty: str = "bayes"

    def init(self, key):
        sizes = ([self.n_regions * self.latent_dim] + list(self.net_sizes)
                 + [2 * self.n_regions])
        return BayesSIRRatesParams(
            fp_net=_init_var_mlp(key, sizes, jnp.dtype(self.dtype)))

    def apply(self, params, t, x, key):
        mask = _out_of_range_mask(x)
        flat = x.reshape(x.shape[0], -1)
        rates = jnp.abs(variational_elu_mlp(params.fp_net, flat, key)).reshape(
            -1, self.n_regions, 2)
        res = _pad_tail(_sir_field(rates, x), x)
        return jnp.where(mask, 0.0, res), {"rates": rates}


class BayesSIRRatesParams(NamedTuple):
    fp_net: Tuple[DenseVariationalParams, ...]


@dataclasses.dataclass(frozen=True)
class BayesNeuralAug:
    """SONNb (models_bayes.py:131-183)."""
    n_regions: int = 1
    latent_dim: int = 8
    aug_net_sizes: Tuple[int, ...] = (32, 32)
    prior_std: float = 0.1
    dtype: str = "float32"

    ode_type: str = "Fa"
    uncertainty: str = "bayes"

    def init(self, key):
        sizes = ([self.n_regions * self.latent_dim]
                 + list(self.aug_net_sizes) + [3 * self.n_regions])
        return BayesNeuralAugParams(
            aug_net=_init_var_mlp(key, sizes, jnp.dtype(self.dtype)))

    def apply(self, params, t, x, key):
        mask = _out_of_range_mask(x)
        flat = x.reshape(x.shape[0], -1)
        fa = variational_elu_mlp(params.aug_net, flat, key).reshape(
            -1, self.n_regions, 3)
        res = _pad_tail(fa, x)
        return jnp.where(mask, 0.0, res), {"fa": fa}


class BayesNeuralAugParams(NamedTuple):
    aug_net: Tuple[DenseVariationalParams, ...]


@dataclasses.dataclass(frozen=True)
class BayesUDE:
    """UONNb (models_bayes.py:185-265)."""
    n_regions: int = 1
    latent_dim: int = 8
    net_sizes: Tuple[int, ...] = (20, 20)
    aug_net_sizes: Tuple[int, ...] = (32, 32)
    prior_std: float = 0.1
    dtype: str = "float32"

    ode_type: str = "FaFp"
    uncertainty: str = "bayes"

    def init(self, key):
        k1, k2 = jax.random.split(key)
        dtype = jnp.dtype(self.dtype)
        in_f = self.n_regions * self.latent_dim
        return BayesUDEParams(
            fp_net=_init_var_mlp(
                k1, [in_f] + list(self.net_sizes) + [2 * self.n_regions], dtype),
            aug_net=_init_var_mlp(
                k2, [in_f] + list(self.aug_net_sizes) + [3 * self.n_regions], dtype),
        )

    def apply(self, params, t, x, key, fa_w=1.0):
        k1, k2 = jax.random.split(key)
        mask = _out_of_range_mask(x)
        flat = x.reshape(x.shape[0], -1)
        rates = jnp.abs(variational_elu_mlp(params.fp_net, flat, k1)).reshape(
            -1, self.n_regions, 2)
        fp = _sir_field(rates, x)
        fa = variational_elu_mlp(params.aug_net, flat, k2).reshape(
            -1, self.n_regions, 3)
        res = _pad_tail(fp + fa_w * fa, x)
        return jnp.where(mask, 0.0, res), {"rates": rates, "fa": fa}


class BayesUDEParams(NamedTuple):
    fp_net: Tuple[DenseVariationalParams, ...]
    aug_net: Tuple[DenseVariationalParams, ...]
