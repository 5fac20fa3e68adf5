"""ODE integrators as XLA-friendly `lax.scan` / `lax.while_loop` programs.

This module owns the numerical core the reference outsources to ``torchdiffeq``
(``odeint(func, y0, t, method='rk4', options={'step_size': ...})``, see
reference ``lib/VAE.py:137``).  Design is TPU-first:

* Fixed-grid steppers are a single ``lax.scan`` over time intervals — one
  compiled program, static shapes, no host round-trips.  The batch dimension
  (Monte-Carlo samples x batch x regions) rides through every right-hand-side
  evaluation as one large matmul-friendly leading axis.
* ``torchdiffeq``'s ``method='rk4'`` is actually the Kutta 3/8 rule
  (``rk4_alt_step_func``); we expose that as the default ``"rk4"`` for
  numerical parity with the reference training dynamics, plus the classic
  Runge-Kutta 4 ("rk4_classic"), midpoint and Euler.
* Adaptive Dormand-Prince 5(4) with a PI step controller is implemented as a
  bounded ``lax.while_loop`` per output interval (dense output via 4th-order
  Hermite interpolation is unnecessary because the step is clamped to land on
  requested output times).
* Right-hand sides may return ``(dy, aux)`` where ``aux`` is an arbitrary
  pytree.  Stage-ordered auxiliaries are collected functionally by the scan —
  this replaces the reference's mutable ``self.params`` / ``self.tracker``
  lists (reference ``lib/models.py:137,187``) that feed the empirical (beta,
  gamma) posterior and the Fa-norm penalty.
* ``checkpoint=True`` wraps each interval step in ``jax.checkpoint`` so
  backprop through long horizons (up to 85 steps x 4 stages) trades FLOPs for
  HBM, keeping `n_samples*batch >= 2048` ensembles resident.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp


RHS = Callable[[jnp.ndarray, jnp.ndarray], Any]


def _wrap_rhs(rhs: RHS, rng=None, stages: int = 1):
    """Normalize a right-hand side to ``f(ctx, stage, t, y) -> (dy, aux)``.

    ``ctx`` is the (traced) step index.  When ``rng`` is given, the rhs is
    called as ``rhs(t, y, key)`` with a key unique to each (step, stage)
    evaluation — this reproduces the reference's Bayesian variational layers,
    which draw fresh weight noise at *every* RHS evaluation
    (``lib/in_development/models_bayes.py:30-48``, ``make_z`` per forward).
    """
    if rng is None:
        def f(ctx, stage, t, y):
            out = rhs(t, y)
            if isinstance(out, tuple) and len(out) == 2:
                return out
            return out, None
    else:
        def f(ctx, stage, t, y):
            key = jax.random.fold_in(rng, ctx * stages + stage)
            out = rhs(t, y, key)
            if isinstance(out, tuple) and len(out) == 2:
                return out
            return out, None

    return f


def _stack_stage_aux(*auxs):
    """Stack per-stage aux pytrees along a new leading 'stage' axis."""
    if all(a is None for a in auxs):
        return None
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *auxs)


# ---------------------------------------------------------------------------
# Fixed-step stage functions
# ---------------------------------------------------------------------------

def _lc(y0, dt, ks, coeffs):
    """Tree-aware linear combination ``y0 + dt * sum(c * k)`` — the state may
    be any pytree (e.g. the augmented adjoint system)."""
    def leaf(y, *kls):
        acc = coeffs[0] * kls[0]
        for c, kl in zip(coeffs[1:], kls[1:]):
            acc = acc + c * kl
        return y + dt * acc

    return jax.tree.map(leaf, y0, *ks)


def _euler_step(f, ctx, t0, dt, y0):
    k1, a1 = f(ctx, 0, t0, y0)
    return _lc(y0, dt, [k1], [1.0]), _stack_stage_aux(a1)


def _midpoint_step(f, ctx, t0, dt, y0):
    k1, a1 = f(ctx, 0, t0, y0)
    k2, a2 = f(ctx, 1, t0 + dt * 0.5, _lc(y0, dt, [k1], [0.5]))
    return _lc(y0, dt, [k2], [1.0]), _stack_stage_aux(a1, a2)


def _rk4_38_step(f, ctx, t0, dt, y0):
    """Kutta 3/8 rule — bit-level analogue of torchdiffeq's 'rk4'."""
    one_third = 1.0 / 3.0
    two_thirds = 2.0 / 3.0
    k1, a1 = f(ctx, 0, t0, y0)
    k2, a2 = f(ctx, 1, t0 + dt * one_third, _lc(y0, dt, [k1], [one_third]))
    k3, a3 = f(ctx, 2, t0 + dt * two_thirds,
               _lc(y0, dt, [k2, k1], [1.0, -one_third]))
    k4, a4 = f(ctx, 3, t0 + dt, _lc(y0, dt, [k1, k2, k3], [1.0, -1.0, 1.0]))
    # exact torchdiffeq association: y + dt*(k1 + 3*(k2+k3) + k4)/8
    y1 = jax.tree.map(
        lambda y, l1, l2, l3, l4: y + dt * (l1 + 3.0 * (l2 + l3) + l4) * 0.125,
        y0, k1, k2, k3, k4)
    return y1, _stack_stage_aux(a1, a2, a3, a4)


def _rk4_classic_step(f, ctx, t0, dt, y0):
    k1, a1 = f(ctx, 0, t0, y0)
    k2, a2 = f(ctx, 1, t0 + dt * 0.5, _lc(y0, dt, [k1], [0.5]))
    k3, a3 = f(ctx, 2, t0 + dt * 0.5, _lc(y0, dt, [k2], [0.5]))
    k4, a4 = f(ctx, 3, t0 + dt, _lc(y0, dt, [k3], [1.0]))
    y1 = _lc(y0, dt, [k1, k2, k3, k4],
             [1.0 / 6.0, 2.0 / 6.0, 2.0 / 6.0, 1.0 / 6.0])
    return y1, _stack_stage_aux(a1, a2, a3, a4)


_FIXED_STEPPERS = {
    "euler": _euler_step,
    "midpoint": _midpoint_step,
    "rk4": _rk4_38_step,        # parity with torchdiffeq method='rk4'
    "rk4_38": _rk4_38_step,
    "rk4_classic": _rk4_classic_step,
}

#: number of RHS evaluations per step for each fixed method
STAGES = {"euler": 1, "midpoint": 2, "rk4": 4, "rk4_38": 4, "rk4_classic": 4}


def odeint_grid(
    rhs: RHS,
    y0: jnp.ndarray,
    t: jnp.ndarray,
    *,
    method: str = "rk4",
    substeps: int = 1,
    unroll: int = 1,
    checkpoint: bool = False,
    rng=None,
) -> Tuple[jnp.ndarray, Any]:
    """Integrate ``dy/dt = rhs(t, y)`` on the grid ``t`` with fixed steps.

    Matches the reference's hot loop (``odeint(..., method='rk4',
    options={'step_size': t[1]-t[0]})``, reference ``lib/VAE.py:126,137``):
    one step per consecutive output pair when ``substeps == 1`` (the reference
    always passes ``step_size == t[1]-t[0]`` on a uniform grid, i.e. exactly
    one RK step per interval).

    Args:
      rhs: callable ``(t, y) -> dy`` or ``(t, y) -> (dy, aux)``.
      y0: initial state, any shape.
      t: 1-D output time grid, length ``T >= 1`` (need not be uniform).
      method: one of ``euler | midpoint | rk4 | rk4_38 | rk4_classic``.
      substeps: equal sub-steps per output interval (>=1).
      unroll: scan unroll factor (TPU pipelining knob).
      checkpoint: rematerialize each interval in the backward pass.

    Returns:
      ``(ys, aux)``: ``ys`` has shape ``(T,) + y0.shape`` with ``ys[0] == y0``;
      ``aux`` is the RHS aux pytree stacked with leading dims
      ``(T-1, substeps, stages)`` (``(T-1, stages)`` when ``substeps == 1``),
      or ``None`` if the RHS produces no aux.
    """
    if method not in _FIXED_STEPPERS:
        raise ValueError(f"unknown method {method!r}; options: {sorted(_FIXED_STEPPERS)}")
    step = _FIXED_STEPPERS[method]
    f = _wrap_rhs(rhs, rng=rng, stages=STAGES[method] * substeps)
    # keep the time grid in the state dtype — a wider t would silently
    # promote the scan carry and break carry-type invariance
    state_dtype = jax.tree.leaves(y0)[0].dtype
    t = jnp.asarray(t, dtype=state_dtype)
    if t.ndim != 1:
        raise ValueError("t must be 1-D")

    def interval(y, xs):
        step_idx, t0, dt_total = xs
        if substeps == 1:
            y1, aux = step(f, step_idx, t0, dt_total, y)
        else:
            h = dt_total / substeps

            def sub(y, i):
                return step(f, step_idx * substeps + i,
                            t0 + i.astype(t0.dtype) * h, h, y)

            y1, aux = jax.lax.scan(sub, y, jnp.arange(substeps))
        return y1, (y1, aux)

    if checkpoint:
        interval = jax.checkpoint(interval)

    _, (ys, aux) = jax.lax.scan(
        interval, y0,
        (jnp.arange(t.shape[0] - 1), t[:-1], t[1:] - t[:-1]),
        unroll=unroll,
    )
    ys = jax.tree.map(lambda first, rest: jnp.concatenate([first[None], rest],
                                                          axis=0), y0, ys)
    return ys, aux


# ---------------------------------------------------------------------------
# Adaptive Dormand-Prince 5(4) with PI step-size control
# ---------------------------------------------------------------------------

# Butcher tableaux — Python floats (weakly typed) so the state's dtype is
# never promoted.  Both are 7-stage, order 5(4), FSAL.

# Dormand & Prince 1980
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DP_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40)

# Tsitouras 2011 ("Tsit5") — coefficients from the published paper.
_TS_C = (0.0, 0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0)
_TS_A = [
    [],
    [0.161],
    [-0.008480655492356989, 0.335480655492357],
    [2.8971530571054935, -6.359448489975075, 4.3622954328695815],
    [5.325864828439257, -11.748883564062828, 7.4955393428898365,
     -0.09249506636175525],
    [5.86145544294642, -12.92096931784711, 8.159367898576159,
     -0.071584973281401, -0.028269050394068383],
    [0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742,
     -3.290069515436081, 2.324710524099774],
]
_TS_B5 = (0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742,
          -3.290069515436081, 2.324710524099774, 0.0)
# error-estimate weights btilde = b - b_hat (signed; the error vector is
# err = dt * sum(btilde_i k_i))
_TS_B4 = (-0.00178001105222577714, -0.0008164344596567469,
          0.007880878010261995, -0.1447110071732629, 0.5823571654525552,
          -0.45808210592918697, 0.015151515151515152)

_ADAPTIVE_TABLEAUX = {
    "dopri5": (_DP_C, _DP_A, _DP_B5, _DP_B4, True),
    "tsit5": (_TS_C, _TS_A, _TS_B5, _TS_B4, False),
}


def _adaptive_step(tableau, f, t0, dt, y0, f0):
    """One embedded RK step with FSAL. Returns (y_hi, y_err, f_last)."""
    C, A, B5, B4, err_is_diff = tableau
    ks = [f0]
    for i in range(1, 7):
        yi = y0
        for j, a in enumerate(A[i]):
            yi = yi + dt * a * ks[j]
        ki, _ = f(t0 + C[i] * dt, yi)
        ks.append(ki)
    y5 = y0
    for b, k in zip(B5, ks):
        y5 = y5 + dt * b * k
    y_err = jnp.zeros_like(y0)
    if err_is_diff:
        for b5, b4, k in zip(B5, B4, ks):
            y_err = y_err + dt * (b5 - b4) * k
    else:
        # Tsit5 publishes b_hat = b - b4 directly
        for b4, k in zip(B4, ks):
            y_err = y_err + dt * b4 * k
    return y5, y_err, ks[-1]  # FSAL: k7 = f(t0+dt, y5)


def odeint_adaptive(
    rhs: RHS,
    y0: jnp.ndarray,
    t: jnp.ndarray,
    *,
    method: str = "dopri5",
    rtol: float = 1e-6,
    atol: float = 1e-8,
    max_steps_per_interval: int = 256,
    safety: float = 0.9,
    pid_alpha: float = 0.7 / 5.0,
    pid_beta: float = 0.4 / 5.0,
    pid_gamma: float = 0.0,
    dt0: Optional[float] = None,
    error_norm: str = "global",
) -> jnp.ndarray:
    """Adaptive embedded RK (Dormand-Prince 5(4) or Tsit5) on a grid ``t``.

    XLA-friendly: an outer ``lax.scan`` walks the output intervals; an inner
    bounded ``lax.while_loop`` advances adaptively inside each interval with
    the trial step clamped so it lands exactly on the interval endpoint (no
    dense interpolation needed, shapes stay static).  Step-size selection is
    a PID controller over the last three error estimates:
    ``dt *= safety * err^(-alpha) * err_prev^(beta) * err_prev2^(-gamma)``
    (``gamma=0`` gives the standard PI controller).

    This is the "adaptive RK45/Tsit5 with PID step control in an XLA-friendly
    while_loop" required by the north star (capability the reference lacks —
    it only ever uses fixed-step RK4).

    ``error_norm`` controls how the controller reduces the error estimate
    when ``y0`` carries a leading batch of independent systems (the folded
    sample×batch ensemble):

    * ``"global"`` (default): one RMS over the whole state — one shared
      step sequence; the stiffest ensemble member sets everyone's step.
    * ``"per_system"``: the error estimate is reduced over every axis
      EXCEPT the leading one, and the whole controller state (current
      time, trial ``dt``, PID error history, accept/reject) is carried
      per system inside the ONE ``while_loop`` — each row advances on its
      own step sequence while the RHS still evaluates the full batch each
      iteration (finished/rejected rows are masked frozen).  A stiff
      member no longer shrinks — or exhausts the step budget of — anyone
      else's steps.  Requires an RHS whose rows are independent along the
      leading axis and whose time argument broadcasts against a
      ``(N, 1, …)`` array (true for every model here: the RHS families
      are autonomous and the per-region MLPs never mix ensemble rows).

    Returns ``ys`` of shape ``(T,) + y0.shape``. Aux collection is not
    supported on the adaptive path (step count is data-dependent).
    """
    if method not in _ADAPTIVE_TABLEAUX:
        raise ValueError(f"unknown adaptive method {method!r}; "
                         f"options: {sorted(_ADAPTIVE_TABLEAUX)}")
    if error_norm not in ("global", "per_system"):
        raise ValueError(f"error_norm must be 'global' or 'per_system', "
                         f"got {error_norm!r}")
    per_system = error_norm == "per_system"
    if per_system and y0.ndim < 2:
        raise ValueError(
            "error_norm='per_system' needs a leading batch-of-systems "
            f"axis on y0, got shape {y0.shape}")
    tableau = _ADAPTIVE_TABLEAUX[method]
    _f = _wrap_rhs(rhs)
    f = lambda t, y: _f(0, 0, t, y)
    t = jnp.asarray(t)
    dtype = y0.dtype

    # controller-state shape: scalar for the global norm, (N, 1, …) for the
    # per-system controller (broadcasts against the (N, …) state)
    ctrl_shape = ((y0.shape[0],) + (1,) * (y0.ndim - 1)) if per_system else ()
    reduce_axes = tuple(range(1, y0.ndim)) if per_system else None

    def err_norm(y_err, y0_, y1_):
        scale = atol + rtol * jnp.maximum(jnp.abs(y0_), jnp.abs(y1_))
        sq = jnp.square(y_err / scale)
        if per_system:
            return jnp.sqrt(jnp.mean(sq, axis=reduce_axes)).reshape(ctrl_shape)
        return jnp.sqrt(jnp.mean(sq))

    def interval(carry, t_pair):
        y, f_y, dt, err_prev, err_prev2 = carry
        t0, t1 = t_pair

        def cond(state):
            return jnp.logical_and(jnp.any(state[0] < t1 - 1e-12),
                                   state[6] < max_steps_per_interval)

        def body(state):
            t_cur, y_cur, f_cur, dt_cur, ep, ep2, n = state
            active = t_cur < t1 - 1e-12        # ctrl-shaped (or scalar)
            h = jnp.minimum(dt_cur, (t1 - t_cur).astype(dt_cur.dtype))
            y_new, y_err, f_new = _adaptive_step(tableau, f, t_cur, h,
                                                 y_cur, f_cur)
            err = err_norm(y_err, y_cur, y_new).astype(ep.dtype)
            err = jnp.maximum(err, 1e-10)
            accept = (err <= 1.0) & active
            factor = (safety * err ** (-pid_alpha) * ep ** (pid_beta)
                      * ep2 ** (-pid_gamma))
            factor = jnp.clip(factor, 0.2, 5.0)
            dt_next = jnp.where(
                active, jnp.maximum(h * factor, 1e-8), dt_cur
            ).astype(dt_cur.dtype)
            t_cur = jnp.where(accept, t_cur + h, t_cur).astype(state[0].dtype)
            y_cur = jax.tree.map(lambda a, b: jnp.where(accept, b, a), y_cur, y_new)
            f_cur = jax.tree.map(lambda a, b: jnp.where(accept, b, a), f_cur, f_new)
            ep2 = jnp.where(accept, ep, ep2).astype(state[5].dtype)
            ep = jnp.where(accept, err, ep).astype(state[4].dtype)
            return (t_cur, y_cur, f_cur, dt_next, ep, ep2, n + 1)

        t_start = jnp.broadcast_to(t0, ctrl_shape) if per_system else t0
        t_end, y, f_y, dt, err_prev, err_prev2, _ = jax.lax.while_loop(
            cond, body,
            (t_start, y, f_y, dt, err_prev, err_prev2,
             jnp.asarray(0, jnp.int32))
        )
        return (y, f_y, dt, err_prev, err_prev2), y

    f0, _ = f(t[0], y0)
    if dt0 is None:
        dt_init = jnp.asarray((t[-1] - t[0]) / jnp.maximum(t.shape[0] - 1, 1) / 4.0, dtype)
    else:
        dt_init = jnp.asarray(dt0, dtype)
    ones_ctrl = jnp.ones(ctrl_shape, dtype)
    carry0 = (y0, f0, dt_init * ones_ctrl, ones_ctrl, ones_ctrl)
    _, ys = jax.lax.scan(interval, carry0, (t[:-1], t[1:]))
    return jnp.concatenate([y0[None], ys], axis=0)


def odeint_dopri5(rhs, y0, t, **kw):
    """Adaptive Dormand-Prince 5(4) — see :func:`odeint_adaptive`."""
    kw.pop("method", None)
    # accept legacy pi_* kwarg spellings
    for old, new in (("pi_alpha", "pid_alpha"), ("pi_beta", "pid_beta")):
        if old in kw:
            kw[new] = kw.pop(old)
    return odeint_adaptive(rhs, y0, t, method="dopri5", **kw)


def odeint_tsit5(rhs, y0, t, **kw):
    """Adaptive Tsitouras 5(4) — see :func:`odeint_adaptive`."""
    kw.pop("method", None)
    return odeint_adaptive(rhs, y0, t, method="tsit5", **kw)


def odeint(
    rhs: RHS,
    y0: jnp.ndarray,
    t: jnp.ndarray,
    *,
    method: str = "rk4",
    **options,
):
    """torchdiffeq-flavoured convenience dispatcher.

    ``odeint(f, y0, t, method='rk4', step_size=...)`` mirrors the reference
    call shape (``lib/VAE.py:137``): ``step_size`` is converted to an integer
    substep count per output interval.  Returns only ``ys`` (aux dropped) for
    drop-in use; use :func:`odeint_grid` to collect RHS auxiliaries.
    """
    if method in ("dopri5", "tsit5"):
        return odeint_adaptive(rhs, y0, t, method=method, **options)
    step_size = options.pop("step_size", None)
    substeps = options.pop("substeps", None)
    if substeps is None:
        if step_size is None:
            substeps = 1
        else:
            interval = float(t[1] - t[0])
            substeps = max(int(round(interval / float(step_size))), 1)
    ys, _ = odeint_grid(rhs, y0, t, method=method, substeps=substeps, **options)
    return ys
