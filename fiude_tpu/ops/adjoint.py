"""Continuous-adjoint gradients through the ODE solver (O(1)-graph memory).

The default gradient path is discretize-then-optimize (autodiff through the
``lax.scan`` in :mod:`fiude_tpu.ops.integrate` — matching torch's
backprop-through-``odeint`` semantics, reference ``lib/VAE.py:203``).  For
long horizons this stores every stage activation; the adjoint method instead
re-integrates the augmented system

    d/ds [y, a_y, a_p] = [f(p, s, y), -a_y df/dy, -a_y df/dp]

backwards between output points (states checkpointed at the grid points from
the forward pass), accumulating output cotangents as it passes each point —
the Neural-ODE trick (Chen et al., 2018), here as a fixed-step ``lax.scan``
so it stays jit/TPU-friendly.

Gradients differ from discretize-then-optimize by the solver's local error
(O(h^4) for RK4); both converge to the continuous gradient.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from fiude_tpu.ops.integrate import (
    _ADAPTIVE_TABLEAUX, odeint_adaptive, odeint_grid,
)


def odeint_adjoint(
    f: Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    params: Any,
    y0: jnp.ndarray,
    t: jnp.ndarray,
    *,
    method: str = "rk4",
    substeps: int = 1,
) -> jnp.ndarray:
    """Integrate ``dy/dt = f(params, t, y)`` on grid ``t`` with adjoint-based
    gradients w.r.t. ``params`` and ``y0``.

    Adaptive methods (``dopri5``/``tsit5``) run the adaptive solver forward
    (whose while_loop is not reverse-differentiable) and the fixed-step
    adjoint backward — this is how the adaptive path becomes trainable.

    Returns ``ys`` of shape ``(T,) + y0.shape`` (no aux on this path).
    """
    return _odeint_adjoint(f, method, substeps, params, y0, jnp.asarray(t))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _odeint_adjoint(f, method, substeps, params, y0, t):
    if method in _ADAPTIVE_TABLEAUX:
        return odeint_adaptive(lambda s, y: f(params, s, y), y0, t,
                               method=method)
    ys, _ = odeint_grid(lambda s, y: f(params, s, y), y0, t,
                        method=method, substeps=substeps)
    return ys


def _fwd(f, method, substeps, params, y0, t):
    ys = _odeint_adjoint(f, method, substeps, params, y0, t)
    return ys, (params, ys, t)


def _bwd(f, method, substeps, residuals, g):
    params, ys, t = residuals
    if method in _ADAPTIVE_TABLEAUX:
        # the backward sweep uses a fixed-step integrator (adaptive forward
        # is fine: the adjoint only needs the checkpointed grid states)
        method, substeps = "rk4", max(substeps, 8)

    def aug_rhs(s, aug):
        y, a_y, _ = aug

        def f_of(y_, p_):
            return f(p_, s, y_)

        dy, vjp = jax.vjp(f_of, y, params)
        va_y, va_p = vjp(a_y)
        neg = jax.tree.map(jnp.negative, (va_y, va_p))
        return (dy, neg[0], neg[1])

    a_p0 = jax.tree.map(jnp.zeros_like, params)

    def interval(carry, xs):
        a_y, a_p = carry
        y_end, t_start, t_end, g_end = xs
        a_y = a_y + g_end
        # integrate the augmented system from t_end backwards to t_start
        seg = jnp.stack([t_end, t_start])
        aug0 = (y_end, a_y, a_p)
        aug_traj, _ = odeint_grid(aug_rhs, aug0, seg, method=method,
                                  substeps=substeps)
        _, a_y, a_p = jax.tree.map(lambda x: x[-1], aug_traj)
        return (a_y, a_p), None

    T = ys.shape[0]
    xs = (ys[1:][::-1], t[:-1][::-1], t[1:][::-1], g[1:][::-1])
    (a_y, a_p), _ = jax.lax.scan(interval, (jnp.zeros_like(ys[0]), a_p0), xs)
    a_y = a_y + g[0]
    return (a_p, a_y, jnp.zeros_like(t))


_odeint_adjoint.defvjp(_fwd, _bwd)
