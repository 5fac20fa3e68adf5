"""Minimal ``torchdiffeq`` stand-in for running the reference as an oracle.

The reference calls exactly one entry point of torchdiffeq:
``odeint(func, y0, t, method='rk4', options={'step_size': t[1]-t[0]})``
(reference ``lib/VAE.py:137``, ``tuning/tune_node.py:199``).  torchdiffeq's
``'rk4'`` is the 3/8-rule Runge-Kutta step (``rk4_alt_step_func``), and with
``step_size`` equal to the (uniform) grid spacing the fixed-grid integrator
takes exactly one step per interval with no interpolation.  This module
reproduces that semantics with plain torch ops — gradients flow through the
solver graph exactly as in torchdiffeq's non-adjoint ``odeint``.

Used by the oracle-parity tests and the same-data head-to-head script when
the real ``torchdiffeq`` package is not installed: :func:`install` registers
this module under ``sys.modules['torchdiffeq']`` so ``lib/VAE.py`` imports it
transparently.  It is NOT part of the TPU framework's compute path.
"""

from __future__ import annotations

import sys


def odeint(func, y0, t, rtol=None, atol=None, method="rk4", options=None):
    import torch

    if method != "rk4":
        raise NotImplementedError(
            "torchdiffeq shim supports only the reference's method='rk4'")
    step = None if options is None else options.get("step_size")
    dts = t[1:] - t[:-1]
    # 1e-4 relative absorbs f32 last-ulp jitter in grids like arange(44)/7
    # (torchdiffeq steps at the constant step_size and interpolates; the
    # per-interval dt used here differs from that by O(ulp) only)
    if step is not None and bool(torch.any(torch.abs(dts - dts[0]) > 1e-4 * torch.abs(dts[0]))):
        raise NotImplementedError(
            "shim requires a uniform grid (the reference always passes one)")

    ys = [y0]
    y = y0
    for i in range(len(t) - 1):
        t0, dt = t[i], t[i + 1] - t[i]
        k1 = func(t0, y)
        k2 = func(t0 + dt / 3, y + dt * k1 / 3)
        k3 = func(t0 + dt * 2 / 3, y + dt * (k2 - k1 / 3))
        k4 = func(t0 + dt, y + dt * (k1 - k2 + k3))
        y = y + dt * (k1 + 3 * (k2 + k3) + k4) / 8
        ys.append(y)
    return torch.stack(ys)


def install() -> None:
    """Register this module as ``torchdiffeq`` if the real one is absent."""
    if "torchdiffeq" not in sys.modules:
        try:
            import torchdiffeq  # noqa: F401  (real package wins if present)
        except ImportError:
            sys.modules["torchdiffeq"] = sys.modules[__name__]
