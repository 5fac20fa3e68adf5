"""Distribution math owned in-framework (replaces ``torch.distributions``).

Only diagonal Gaussians appear anywhere in the reference; we implement their
log-pdf and KL in closed form so everything stays fusable under jit.
Numerical conventions match torch exactly:

* ``Normal(mean, std).log_prob`` (reference ``lib/train_functions.py:84``)
* ``kl_divergence(Normal(p), Normal(q))`` (reference
  ``lib/train_functions.py:79,167``)
* ``torch.std`` defaults to the *unbiased* (Bessel-corrected) estimator —
  the MC-ensemble NLL (reference ``lib/train_functions.py:82``) and the
  empirical (beta, gamma) posterior (reference ``lib/models.py:156``) both
  depend on it, so :func:`std` exposes ``ddof=1`` as the default.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def normal_logpdf(x, mean, std):
    """Elementwise Gaussian log-density, torch ``Normal.log_prob`` semantics."""
    var = jnp.square(std)
    return -jnp.square(x - mean) / (2.0 * var) - jnp.log(std) - _LOG_SQRT_2PI


def kl_normal(p_mean, p_std, q_mean, q_std):
    """Elementwise ``KL(N(p_mean, p_std) || N(q_mean, q_std))``."""
    var_ratio = jnp.square(p_std / q_std)
    t1 = jnp.square((p_mean - q_mean) / q_std)
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


def mean_std(x, axis=0, ddof: int = 1):
    """Mean and (by default unbiased) std along ``axis``; matches torch."""
    return jnp.mean(x, axis=axis), jnp.std(x, axis=axis, ddof=ddof)


def std(x, axis=0, ddof: int = 1):
    """Unbiased-by-default standard deviation (torch.std parity)."""
    return jnp.std(x, axis=axis, ddof=ddof)


def masked_mean(x, mask, axis=None, eps: float = 0.0):
    """Mean of ``x`` over elements where ``mask`` is truthy."""
    mask = mask.astype(x.dtype)
    total = jnp.sum(x * mask, axis=axis)
    count = jnp.sum(mask, axis=axis)
    return total / jnp.maximum(count, 1.0 + eps)


def masked_mean_std(x, mask, axis=0, ddof: int = 1):
    """Mean/unbiased-std along ``axis`` counting only masked-in elements.

    Used by the padded-curriculum loss path, where RHS auxiliaries beyond the
    current training horizon must not contaminate the empirical (beta, gamma)
    posterior.
    """
    mask = mask.astype(x.dtype)
    count = jnp.sum(mask, axis=axis)
    mean = jnp.sum(x * mask, axis=axis) / jnp.maximum(count, 1.0)
    sq = jnp.sum(jnp.square(x - mean) * mask, axis=axis)
    return mean, jnp.sqrt(sq / jnp.maximum(count - ddof, 1.0))
