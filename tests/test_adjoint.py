"""Continuous-adjoint gradients vs discretize-then-optimize and analytics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiude_tpu.ops.adjoint import odeint_adjoint
from fiude_tpu.ops.integrate import odeint_grid

jax.config.update("jax_enable_x64", True)


class TestAdjoint:
    def test_forward_matches_plain(self):
        def f(p, t, y):
            return -p["rate"] * y

        params = {"rate": jnp.asarray(1.3, jnp.float64)}
        y0 = jnp.asarray([1.0, 2.0], jnp.float64)
        t = jnp.linspace(0.0, 2.0, 9, dtype=jnp.float64)
        ys_adj = odeint_adjoint(f, params, y0, t)
        ys_ref, _ = odeint_grid(lambda s, y: f(params, s, y), y0, t)
        np.testing.assert_allclose(np.asarray(ys_adj), np.asarray(ys_ref),
                                   rtol=1e-12)

    def test_gradient_matches_analytic(self):
        """d/dk sum_i exp(-k t_i) = sum_i -t_i exp(-k t_i)."""
        t = jnp.linspace(0.0, 1.5, 7, dtype=jnp.float64)

        def loss(k):
            def f(p, s, y):
                return -p * y
            ys = odeint_adjoint(f, k, jnp.ones(1, jnp.float64), t,
                                substeps=8)
            return jnp.sum(ys)

        k0 = jnp.asarray(1.1, jnp.float64)
        g = jax.grad(loss)(k0)
        analytic = float(jnp.sum(-t * jnp.exp(-k0 * t)))
        np.testing.assert_allclose(float(g), analytic, rtol=1e-6)

    def test_gradient_matches_backprop_through_solver(self):
        """SIR with neural-ish params: adjoint grad ~= discretize-then-optimize."""
        def f(p, s, y):
            beta = jnp.abs(p[0])
            gam = jnp.abs(p[1])
            ds = -beta * y[..., 0] * y[..., 1]
            di = beta * y[..., 0] * y[..., 1] - gam * y[..., 1]
            dr = gam * y[..., 1]
            return jnp.stack([ds, di, dr], -1)

        y0 = jnp.asarray([[0.9, 0.1, 0.0]], jnp.float64)
        t = jnp.linspace(0.0, 6.0, 13, dtype=jnp.float64)
        p0 = jnp.asarray([0.8, 0.55], jnp.float64)

        def loss_adj(p):
            return jnp.sum(jnp.square(
                odeint_adjoint(f, p, y0, t, substeps=16)))

        def loss_dto(p):
            ys, _ = odeint_grid(lambda s, y: f(p, s, y), y0, t, substeps=16)
            return jnp.sum(jnp.square(ys))

        g_adj = jax.grad(loss_adj)(p0)
        g_dto = jax.grad(loss_dto)(p0)
        np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_dto),
                                   rtol=1e-5)

    def test_grad_wrt_y0(self):
        def f(p, s, y):
            return -p * y

        t = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float64)
        k = jnp.asarray(0.7, jnp.float64)

        def loss(y0):
            return odeint_adjoint(f, k, y0, t, substeps=8)[-1, 0]

        y0 = jnp.asarray([2.0], jnp.float64)
        g = jax.grad(loss)(y0)
        # d/dy0 y0*exp(-k) = exp(-k)
        np.testing.assert_allclose(float(g[0]), float(jnp.exp(-k)), rtol=1e-6)

    def test_jit(self):
        def f(p, s, y):
            return -p * y

        t = jnp.linspace(0.0, 1.0, 4, dtype=jnp.float64)

        @jax.jit
        def run(k):
            return jnp.sum(odeint_adjoint(f, k, jnp.ones(2, jnp.float64), t))

        v = run(jnp.asarray(1.0, jnp.float64))
        assert np.isfinite(float(v))
