"""Evaluation metrics (parity with reference ``lib/Metrics.py``).

Host-side numpy/scipy implementations — these run on forecast arrays pulled
back from the device for results tables, matching the reference bit-for-bit:

* :func:`nll` — mean negative Gaussian log-density (``lib/Metrics.py:5-13``).
* :func:`mae` — mean absolute error (``:15-23``).
* :func:`mb_log` — CDC-style multi-bin log score
  ``log(cdf(true+0.6) - cdf(true-0.5))`` with zero-probability floored at
  4.5399929762484854e-05 (``:25-60``).
* :func:`skill` — ``exp(mean(mb_log))`` (``:62-75``).

Device-side jnp variants (suffix ``_jnp``) are provided for fused in-graph
evaluation (e.g. inside sweep programs) — numerically identical.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import norm

import jax.numpy as jnp

from fiude_tpu.ops.stats import normal_logpdf

_MBL_FLOOR = 4.5399929762484854e-05


def nll(true, mean=None, std=None):
    return -np.mean(norm.logpdf(true, loc=mean, scale=std))


def mae(true, mean=None, std=None):
    return np.mean(np.abs(true - mean))


def mb_log(true, mean=None, std=None):
    dist = norm(loc=mean, scale=std)
    cdf = dist.cdf(true + 0.6) - dist.cdf(true - 0.5)
    cdf = np.where(cdf == 0, _MBL_FLOOR, cdf)
    return np.log(cdf)


def skill(true, mean=None, std=None):
    return np.exp(mb_log(true, mean, std).mean())


# -- device-side variants ----------------------------------------------------

def nll_jnp(true, mean, std):
    return -jnp.mean(normal_logpdf(true, mean, std))


def mb_log_jnp(true, mean, std):
    import jax.scipy.stats as jstats
    cdf = (jstats.norm.cdf(true + 0.6, loc=mean, scale=std)
           - jstats.norm.cdf(true - 0.5, loc=mean, scale=std))
    cdf = jnp.where(cdf == 0, _MBL_FLOOR, cdf)
    return jnp.log(cdf)


def skill_jnp(true, mean, std):
    return jnp.exp(jnp.mean(mb_log_jnp(true, mean, std)))
