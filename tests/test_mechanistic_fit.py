"""BASELINE config 1: mechanistic SIR fit by gradient through the solver.

Recover (beta, gamma) of a synthetic SIR epidemic by differentiating through
the integrator — no encoder, fixed initial condition, both with fixed-step
RK4 (discretize-then-optimize) and the adaptive Dopri5 path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from fiude_tpu.ops import odeint_dopri5, odeint_grid


def sir_field(p, t, y):
    beta, gam = jnp.abs(p[0]), jnp.abs(p[1])
    s, i = y[..., 0], y[..., 1]
    ds = -beta * s * i
    di = beta * s * i - gam * i
    return jnp.stack([ds, di, gam * i], axis=-1)


def make_truth(beta=0.9, gamma=0.5, T=12.0, n=25):
    t = jnp.linspace(0.0, T, n, dtype=jnp.float32)
    y0 = jnp.asarray([0.95, 0.05, 0.0], jnp.float32)
    p_true = jnp.asarray([beta, gamma], jnp.float32)
    ys, _ = odeint_grid(lambda s, y: sir_field(p_true, s, y), y0, t,
                        substeps=8)
    return t, y0, ys


@pytest.mark.parametrize("solver", ["rk4", "dopri5"])
def test_recovers_rates(solver):
    t, y0, truth = make_truth()
    target = truth[:, 1]  # observe the infectious curve

    def loss(p):
        if solver == "rk4":
            ys, _ = odeint_grid(lambda s, y: sir_field(p, s, y), y0, t,
                                substeps=4)
        else:
            # adaptive forward + adjoint backward (the while_loop itself is
            # not reverse-differentiable)
            from fiude_tpu.ops.adjoint import odeint_adjoint
            ys = odeint_adjoint(sir_field, p, y0, t, method="dopri5")
        return jnp.mean(jnp.square(ys[:, 1] - target))

    p = jnp.asarray([0.5, 0.3], jnp.float32)
    opt = optax.adam(5e-2)
    state = opt.init(p)
    step = jax.jit(lambda p, s: _step(loss, opt, p, s))
    for _ in range(200):
        p, state = step(p, state)

    final = np.abs(np.asarray(p))
    assert final[0] == pytest.approx(0.9, abs=0.03)
    assert final[1] == pytest.approx(0.5, abs=0.03)


def _step(loss, opt, p, state):
    g = jax.grad(loss)(p)
    updates, state = opt.update(g, state, p)
    return optax.apply_updates(p, updates), state
