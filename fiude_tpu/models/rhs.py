"""Latent ODE right-hand sides: mechanistic SIR x neural hybrids (the "UDE").

Three families, mirroring the reference's CONN/SONN/UONN taxonomy:

* :class:`SIRRates` ("Fp"/CONN, reference ``lib/models.py:109-156``):
  an ELU-MLP maps the full latent state to per-region positive rates
  (beta, gamma); the derivative is the mechanistic SIR field
  ``dS=-beta*S*I, dI=beta*S*I-gamma*I, dR=gamma*I`` with zero derivative for
  latent dims >= 3.
* :class:`NeuralAug` ("Fa"/SONN, reference ``lib/models.py:158-197``):
  a free neural field writing into the S,I,R slots only.
* :class:`UDE` ("FaFp"/UONN, reference ``lib/models.py:199-265``):
  ``Fp + fa_w * Fa`` with a ramp weight ``fa_w`` used by the CONN->UONN
  transfer recipe (reference ``testing_pre_train.py:139-146``).

Reference semantics preserved exactly:
* hard zeroing of the derivative wherever the state is out of range
  ``(x > 2) | (x < -1)`` — an in-place scatter in torch, a ``jnp.where``
  here (reference ``lib/models.py:130,145``);
* rate/augmentation tracking — the reference appends every RHS evaluation to
  mutable lists for the empirical (beta, gamma) posterior and the Fa-norm
  penalty (``lib/models.py:137,187``); here each apply returns an ``aux``
  dict that the integrator stacks stage-ordered (functional, scan-carried).

Apply signature: ``apply(params, t, x, ...) -> (dx, aux)`` with
``x: (batch, n_regions, latent_dim)`` where batch is the folded
``n_samples * batch_size`` ensemble axis — one large MXU-friendly matmul per
MLP layer.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fiude_tpu.models.nn import Dense, elu_mlp, init_dense


def _init_elu_mlp(key, sizes, dtype):
    keys = jax.random.split(key, len(sizes) - 1)
    return tuple(init_dense(k, sizes[i], sizes[i + 1], dtype)
                 for i, k in enumerate(keys))


def _out_of_range_mask(x):
    """(x > 2) | (x < -1) — reference lib/models.py:130."""
    return (x > 2.0) | (x < -1.0)


def _sir_field(rates, x):
    """Mechanistic SIR derivative from positive rates (B, R, 2)."""
    plus_i = rates[..., 0] * x[..., 0] * x[..., 1]
    minus_i = rates[..., 1] * x[..., 1]
    return jnp.stack([-plus_i, plus_i - minus_i, minus_i], axis=-1)


def _pad_tail(field3, x):
    """Concat zeros for latent dims >= 3 (reference lib/models.py:144)."""
    return jnp.concatenate([field3, jnp.zeros_like(x[..., 3:])], axis=-1)


@dataclasses.dataclass(frozen=True)
class SIRRates:
    """CONN / "Fp": SIR with neural (beta, gamma)."""
    n_regions: int = 1
    latent_dim: int = 8
    net_sizes: Tuple[int, ...] = (20, 20)
    dtype: str = "float32"

    ode_type: str = "Fp"
    uncertainty: str = "none"

    def init(self, key) -> "SIRRatesParams":
        sizes = ([self.n_regions * self.latent_dim] + list(self.net_sizes)
                 + [2 * self.n_regions])
        return SIRRatesParams(
            fp_net=_init_elu_mlp(key, sizes, jnp.dtype(self.dtype)))

    def apply(self, params: "SIRRatesParams", t, x):
        mask = _out_of_range_mask(x)
        flat = x.reshape(x.shape[0], -1)
        rates = jnp.abs(elu_mlp(params.fp_net, flat)).reshape(
            -1, self.n_regions, 2)
        res = _pad_tail(_sir_field(rates, x), x)
        res = jnp.where(mask, 0.0, res)
        return res, {"rates": rates}


class SIRRatesParams(NamedTuple):
    fp_net: Tuple[Dense, ...]


@dataclasses.dataclass(frozen=True)
class NeuralAug:
    """SONN / "Fa": free neural augmentation in the S,I,R slots."""
    n_regions: int = 1
    latent_dim: int = 8
    aug_net_sizes: Tuple[int, ...] = (32, 32)
    dtype: str = "float32"

    ode_type: str = "Fa"
    uncertainty: str = "none"

    def init(self, key) -> "NeuralAugParams":
        sizes = ([self.n_regions * self.latent_dim] + list(self.aug_net_sizes)
                 + [3 * self.n_regions])
        return NeuralAugParams(
            aug_net=_init_elu_mlp(key, sizes, jnp.dtype(self.dtype)))

    def apply(self, params: "NeuralAugParams", t, x):
        mask = _out_of_range_mask(x)
        flat = x.reshape(x.shape[0], -1)
        fa = elu_mlp(params.aug_net, flat).reshape(-1, self.n_regions, 3)
        res = _pad_tail(fa, x)
        res = jnp.where(mask, 0.0, res)
        return res, {"fa": fa}


class NeuralAugParams(NamedTuple):
    aug_net: Tuple[Dense, ...]


@dataclasses.dataclass(frozen=True)
class UDE:
    """UONN / "FaFp": mechanistic SIR-rates field + fa_w * neural field.

    ``fa_w`` is a runtime scalar argument to ``apply`` (not a baked python
    attribute) so the CONN->UONN transfer ramp (0 -> 1 in 0.1 steps,
    reference testing_pre_train.py:139-146) never triggers recompilation.
    """
    n_regions: int = 1
    latent_dim: int = 8
    net_sizes: Tuple[int, ...] = (20, 20)
    aug_net_sizes: Tuple[int, ...] = (32, 32)
    dtype: str = "float32"

    ode_type: str = "FaFp"
    uncertainty: str = "none"

    def init(self, key) -> "UDEParams":
        k1, k2 = jax.random.split(key)
        dtype = jnp.dtype(self.dtype)
        in_f = self.n_regions * self.latent_dim
        return UDEParams(
            fp_net=_init_elu_mlp(
                k1, [in_f] + list(self.net_sizes) + [2 * self.n_regions], dtype),
            aug_net=_init_elu_mlp(
                k2, [in_f] + list(self.aug_net_sizes) + [3 * self.n_regions], dtype),
        )

    def apply(self, params: "UDEParams", t, x, fa_w=1.0):
        mask = _out_of_range_mask(x)
        flat = x.reshape(x.shape[0], -1)
        rates = jnp.abs(elu_mlp(params.fp_net, flat)).reshape(
            -1, self.n_regions, 2)
        fp = _sir_field(rates, x)
        fa = elu_mlp(params.aug_net, flat).reshape(-1, self.n_regions, 3)
        res = _pad_tail(fp + fa_w * fa, x)
        res = jnp.where(mask, 0.0, res)
        return res, {"rates": rates, "fa": fa}


class UDEParams(NamedTuple):
    fp_net: Tuple[Dense, ...]
    aug_net: Tuple[Dense, ...]


def empirical_rate_posterior(rates_aux, ddof: int = 1):
    """Empirical Normal over all collected (beta, gamma) evaluations.

    ``rates_aux``: any pytree leaf of shape (..., n_regions, 2) stacked over
    steps/stages — flattened to (-1, 2) exactly like the reference's
    ``torch.stack(self.params).reshape(-1, 2)`` with unbiased std
    (reference lib/models.py:152-156).
    """
    flat = rates_aux.reshape(-1, 2)
    return jnp.mean(flat, axis=0), jnp.std(flat, axis=0, ddof=ddof)
