"""Evaluation metrics (parity with reference ``lib/Metrics.py``).

Host-side numpy/scipy implementations — these run on forecast arrays pulled
back from the device for results tables, matching the reference bit-for-bit:

* :func:`nll` — mean negative Gaussian log-density (``lib/Metrics.py:5-13``).
* :func:`mae` — mean absolute error (``:15-23``).
* :func:`mb_log` — CDC-style multi-bin log score
  ``log(cdf(true+0.6) - cdf(true-0.5))`` with zero-probability floored at
  4.5399929762484854e-05 (``:25-60``); ``bins=True`` scores a CDC binned
  probability table instead (``:26-41``).
* :func:`skill` — ``exp(mean(mb_log))`` (``:62-75``).

All four accept either arrays or a DataFrame with ``Pred``/``Std``/``True``
columns (``lib/Metrics.py:6-9``).  Unlike the reference we do not swallow
exceptions into a ``-10`` sentinel (``:58-60``) — errors propagate.

Device-side jnp variants (suffix ``_jnp``) are provided for fused in-graph
evaluation (e.g. inside sweep programs) — numerically identical.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import norm

import jax.numpy as jnp

from fiude_tpu.ops.stats import normal_logpdf

_MBL_FLOOR = 4.5399929762484854e-05


def _from_frame(true, mean, std):
    """Unpack a ``Pred``/``Std``/``True`` DataFrame (lib/Metrics.py:6-9)."""
    import pandas as pd
    if isinstance(true, pd.DataFrame):
        return true["True"], true["Pred"], true["Std"]
    return true, mean, std


def nll(true, mean=None, std=None, bins=False):
    true, mean, std = _from_frame(true, mean, std)
    return -np.mean(norm.logpdf(true, loc=mean, scale=std))


def mae(true, mean=None, std=None, bins=False):
    true, mean, std = _from_frame(true, mean, std)
    return np.mean(np.abs(true - mean))


def _mb_log_binned(table):
    """CDC binned-table log score (lib/Metrics.py:26-41).

    ``table``: DataFrame whose columns are bin left-edges (ascending floats)
    plus a final ``'True'`` column of observed values.  Per row, the score is
    ``log`` of the total probability mass in the bins within +-0.5 of the
    observation's own bin (``floor(true*10)/10``), i.e. an 11-bin window at
    CDC's 0.1-percentage-point resolution.
    """
    probs = table.drop(columns=["True"])
    edges = np.round(np.asarray(probs.columns, dtype=float), 1)
    correct = np.round(np.floor(np.asarray(table["True"], float) * 10) / 10, 1)
    lower = np.round(correct - 0.5, 1)[:, None]
    upper = np.round(correct + 0.5, 1)[:, None]
    in_window = (edges[None, :] >= lower) & (edges[None, :] <= upper)
    mass = np.sum(np.asarray(probs, float) * in_window, axis=1)
    return np.log(mass)


def mb_log(true, mean=None, std=None, bins=False):
    if bins:
        return _mb_log_binned(true)
    true, mean, std = _from_frame(true, mean, std)
    dist = norm(loc=mean, scale=std)
    cdf = dist.cdf(true + 0.6) - dist.cdf(true - 0.5)
    cdf = np.where(cdf == 0, _MBL_FLOOR, cdf)
    return np.log(cdf)


def skill(true, mean=None, std=None, bins=False):
    return np.exp(mb_log(true, mean, std, bins).mean())


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
