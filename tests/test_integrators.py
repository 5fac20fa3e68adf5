"""Solver core tests: convergence order, exactness, aux collection, grads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiude_tpu.ops import odeint, odeint_grid, odeint_dopri5

jax.config.update("jax_enable_x64", True)


def exp_rhs(t, y):
    return -y


def sir_rhs(t, y):
    beta, gamma = 0.8, 0.55
    s, i, r = y[..., 0], y[..., 1], y[..., 2]
    ds = -beta * s * i
    di = beta * s * i - gamma * i
    dr = gamma * i
    return jnp.stack([ds, di, dr], axis=-1)


class TestFixedGrid:
    def test_exponential_decay_rk4(self):
        t = jnp.linspace(0.0, 2.0, 21, dtype=jnp.float64)
        y0 = jnp.array([1.0, 2.0], dtype=jnp.float64)
        ys, _ = odeint_grid(exp_rhs, y0, t, method="rk4")
        expected = y0[None] * jnp.exp(-t)[:, None]
        np.testing.assert_allclose(ys, expected, rtol=1e-5)

    def test_initial_point_is_y0(self):
        t = jnp.linspace(0.0, 1.0, 5)
        y0 = jnp.array([0.3, 0.7])
        ys, _ = odeint_grid(exp_rhs, y0, t)
        np.testing.assert_array_equal(np.asarray(ys[0]), np.asarray(y0))

    @pytest.mark.parametrize("method,order", [
        ("euler", 1), ("midpoint", 2), ("rk4", 4), ("rk4_classic", 4),
    ])
    def test_convergence_order(self, method, order):
        """Halving the step should cut the error by ~2^order."""
        y0 = jnp.array([1.0], dtype=jnp.float64)
        t_end = 1.0

        def err(n):
            t = jnp.linspace(0.0, t_end, n + 1, dtype=jnp.float64)
            ys, _ = odeint_grid(exp_rhs, y0, t, method=method)
            return float(jnp.abs(ys[-1, 0] - jnp.exp(-t_end)))

        e1, e2 = err(16), err(32)
        rate = np.log2(e1 / e2)
        assert rate > order - 0.3, f"{method}: observed order {rate:.2f}"

    def test_substeps_match_finer_grid(self):
        """k substeps on a coarse grid == one step on a k-times finer grid."""
        y0 = jnp.array([1.0, 0.1, 0.0], dtype=jnp.float64)
        t_coarse = jnp.linspace(0.0, 8.0, 9, dtype=jnp.float64)
        t_fine = jnp.linspace(0.0, 8.0, 57, dtype=jnp.float64)
        ys_sub, _ = odeint_grid(sir_rhs, y0, t_coarse, method="rk4", substeps=7)
        ys_fine, _ = odeint_grid(sir_rhs, y0, t_fine, method="rk4")
        np.testing.assert_allclose(ys_sub, ys_fine[::7], rtol=1e-12, atol=1e-14)

    def test_sir_conservation(self):
        """S+I+R is conserved by the SIR field."""
        y0 = jnp.array([0.9, 0.1, 0.0], dtype=jnp.float64)
        t = jnp.linspace(0.0, 10.0, 71, dtype=jnp.float64)
        ys, _ = odeint_grid(sir_rhs, y0, t, method="rk4")
        totals = jnp.sum(ys, axis=-1)
        np.testing.assert_allclose(totals, 1.0, rtol=1e-10)

    def test_aux_collection_shape_and_order(self):
        """Aux pytrees stack as (T-1, stages) in stage evaluation order."""
        def rhs(t, y):
            return -y, {"t_eval": t}

        t = jnp.linspace(0.0, 1.0, 4, dtype=jnp.float64)
        _, aux = odeint_grid(rhs, jnp.ones(2, dtype=jnp.float64), t, method="rk4")
        assert aux["t_eval"].shape == (3, 4)
        # 3/8-rule stage times: t0, t0+h/3, t0+2h/3, t0+h
        h = float(t[1] - t[0])
        np.testing.assert_allclose(
            aux["t_eval"][0], [0.0, h / 3, 2 * h / 3, h], rtol=1e-12)

    def test_aux_with_substeps(self):
        def rhs(t, y):
            return -y, y

        t = jnp.linspace(0.0, 1.0, 3, dtype=jnp.float64)
        _, aux = odeint_grid(rhs, jnp.ones(5, dtype=jnp.float64), t,
                             method="rk4", substeps=2)
        assert aux.shape == (2, 2, 4, 5)  # (T-1, substeps, stages, state)

    def test_gradient_through_solver(self):
        """Discretize-then-optimize: d y(T) / d theta vs analytic solution."""
        def loss(log_rate):
            rate = jnp.exp(log_rate)

            def rhs(t, y):
                return -rate * y

            t = jnp.linspace(0.0, 1.0, 51, dtype=jnp.float64)
            ys, _ = odeint_grid(rhs, jnp.array([1.0], dtype=jnp.float64), t)
            return ys[-1, 0]

        g = jax.grad(loss)(jnp.asarray(0.0, jnp.float64))
        # d/d(log k) exp(-k) at k=1 -> -k*exp(-k) = -exp(-1)
        np.testing.assert_allclose(float(g), -np.exp(-1.0), rtol=1e-6)

    def test_checkpoint_gradients_match(self):
        def make_loss(ckpt):
            def loss(a):
                def rhs(t, y):
                    return -a * y
                t = jnp.linspace(0.0, 2.0, 30, dtype=jnp.float64)
                ys, _ = odeint_grid(rhs, jnp.ones(3, jnp.float64), t,
                                    checkpoint=ckpt)
                return jnp.sum(ys[-1])
            return loss

        g0 = jax.grad(make_loss(False))(jnp.asarray(1.3, jnp.float64))
        g1 = jax.grad(make_loss(True))(jnp.asarray(1.3, jnp.float64))
        np.testing.assert_allclose(float(g0), float(g1), rtol=1e-12)

    def test_jit_and_vmap(self):
        t = jnp.linspace(0.0, 1.0, 8)
        y0 = jnp.ones((16, 3)) * jnp.array([0.9, 0.1, 0.0])

        @jax.jit
        def run(y0):
            ys, _ = odeint_grid(sir_rhs, y0, t, method="rk4")
            return ys

        ys = run(y0)
        assert ys.shape == (8, 16, 3)
        ys_v = jax.vmap(lambda y: odeint_grid(sir_rhs, y, t, method="rk4")[0])(y0)
        np.testing.assert_allclose(ys_v.transpose(1, 0, 2), ys, rtol=1e-6)


class TestDopri5:
    def test_exponential_accuracy(self):
        t = jnp.linspace(0.0, 3.0, 7, dtype=jnp.float64)
        y0 = jnp.array([1.0], dtype=jnp.float64)
        ys = odeint_dopri5(exp_rhs, y0, t, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(ys[:, 0], jnp.exp(-t), rtol=1e-6)

    def test_sir_vs_fine_rk4(self):
        y0 = jnp.array([0.9, 0.1, 0.0], dtype=jnp.float64)
        t = jnp.linspace(0.0, 12.0, 13, dtype=jnp.float64)
        ys_ad = odeint_dopri5(sir_rhs, y0, t, rtol=1e-9, atol=1e-11)
        t_fine = jnp.linspace(0.0, 12.0, 12 * 200 + 1, dtype=jnp.float64)
        ys_ref, _ = odeint_grid(sir_rhs, y0, t_fine, method="rk4")
        np.testing.assert_allclose(ys_ad, ys_ref[::200], rtol=1e-7, atol=1e-9)

    def test_stiffish_decay_adapts(self):
        """Fast decay handled despite coarse output grid."""
        def rhs(t, y):
            return -50.0 * y

        t = jnp.linspace(0.0, 1.0, 3, dtype=jnp.float64)
        ys = odeint_dopri5(rhs, jnp.array([1.0], jnp.float64), t,
                           rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(ys[:, 0], jnp.exp(-50.0 * t),
                                   rtol=1e-4, atol=1e-8)

    def test_jittable_and_differentiable(self):
        @jax.jit
        def loss(a):
            def rhs(t, y):
                return -a * y
            t = jnp.linspace(0.0, 1.0, 4, dtype=jnp.float64)
            ys = odeint_dopri5(rhs, jnp.ones(1, jnp.float64), t)
            return ys[-1, 0]

        v = loss(jnp.asarray(1.0, jnp.float64))
        np.testing.assert_allclose(float(v), np.exp(-1.0), rtol=1e-5)


class TestDispatcher:
    def test_step_size_option_parity(self):
        """odeint(..., step_size=interval) == one step per interval."""
        t = jnp.arange(0, 5, dtype=jnp.float64)
        y0 = jnp.array([0.9, 0.1, 0.0], jnp.float64)
        a = odeint(sir_rhs, y0, t, method="rk4", step_size=1.0)
        b, _ = odeint_grid(sir_rhs, y0, t, method="rk4", substeps=1)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_step_size_smaller_than_interval(self):
        t = jnp.arange(0, 3, dtype=jnp.float64)
        y0 = jnp.array([1.0], jnp.float64)
        a = odeint(exp_rhs, y0, t, method="rk4", step_size=0.25)
        b, _ = odeint_grid(exp_rhs, y0, t, method="rk4", substeps=4)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPerSystemErrorNorm:
    """odeint_adaptive(error_norm='per_system'): every leading-axis system
    runs its own error estimate and PID step sequence, so one stiff ensemble
    member cannot set (or exhaust) everyone's step budget
    (ops/integrate.py:326-328 global-norm caveat, VERDICT r4 item 7)."""

    def test_matches_global_on_homogeneous_batch(self):
        from fiude_tpu.ops.integrate import odeint_adaptive
        t = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float64)
        y0 = jnp.ones((4, 1), dtype=jnp.float64)  # identical systems
        ys_g = odeint_adaptive(exp_rhs, y0, t, rtol=1e-8, atol=1e-10)
        ys_p = odeint_adaptive(exp_rhs, y0, t, rtol=1e-8, atol=1e-10,
                               error_norm="per_system")
        np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_g),
                                   rtol=1e-9, atol=1e-12)

    def test_stiff_member_does_not_starve_easy_member(self):
        """Heterogeneous batch (decay rates 0.5 and 400) under a tight
        per-interval step budget: the global norm lets the stiff member
        force tiny steps for the whole batch, exhausting the budget before
        the interval ends — the EASY member comes back wrong too.  Per-system
        control keeps the easy member exact."""
        from fiude_tpu.ops.integrate import odeint_adaptive

        rates = jnp.array([[0.5], [400.0]], dtype=jnp.float64)

        def rhs(t, y):
            return -rates * y

        t = jnp.linspace(0.0, 1.0, 2, dtype=jnp.float64)
        y0 = jnp.ones((2, 1), dtype=jnp.float64)
        # 30 steps: plenty for the easy member alone at this tolerance,
        # nowhere near enough when the stiff member drags dt down for both
        kw = dict(rtol=1e-10, atol=1e-12, max_steps_per_interval=30)
        ys_g = odeint_adaptive(rhs, y0, t, **kw)
        ys_p = odeint_adaptive(rhs, y0, t, error_norm="per_system", **kw)

        exact_easy = float(jnp.exp(-0.5))
        err_g = abs(float(ys_g[-1, 0, 0]) - exact_easy)
        err_p = abs(float(ys_p[-1, 0, 0]) - exact_easy)
        assert err_p < 1e-8, f"per-system easy member inaccurate: {err_p}"
        assert err_g > 100 * err_p, (
            f"global norm should have starved the easy member under the "
            f"step cap (err_g={err_g}, err_p={err_p})")

    def test_per_system_jit_and_grad(self):
        from fiude_tpu.ops.integrate import odeint_adaptive

        @jax.jit
        def loss(a):
            def rhs(t, y):
                return -a * y
            t = jnp.linspace(0.0, 1.0, 3, dtype=jnp.float64)
            ys = odeint_adaptive(rhs, jnp.ones((3, 1), jnp.float64), t,
                                 error_norm="per_system")
            return ys[-1].sum()

        v = loss(jnp.asarray(1.0, jnp.float64))
        np.testing.assert_allclose(float(v), 3 * np.exp(-1.0), rtol=1e-5)

    def test_requires_batch_axis(self):
        from fiude_tpu.ops.integrate import odeint_adaptive
        with pytest.raises(ValueError, match="per_system"):
            odeint_adaptive(exp_rhs, jnp.ones((3,), jnp.float64),
                            jnp.linspace(0.0, 1.0, 3, dtype=jnp.float64),
                            error_norm="per_system")


class TestAdaptiveInForecaster:
    def test_dopri5_forward_in_model(self):
        """UDEForecaster(method='dopri5'): adaptive path with grid-point aux."""
        from fiude_tpu.models import UDEForecaster
        import dataclasses as dc
        model = UDEForecaster.build(
            n_regions=1, latent_dim=6, n_qs=3, ode_name="Fp",
            enc_params={"q_sizes": (8,), "ff_sizes": (8,)},
            ode_params={"net_sizes": (8, 8)})
        model = dc.replace(model, method="dopri5")
        params = model.init(jax.jax if False else __import__("jax").random.PRNGKey(0))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (2, 10, 4)).astype(np.float32))
        eps = jnp.asarray(rng.standard_normal((3, 2, 1, 5)).astype(np.float32))
        t = jnp.arange(4, dtype=jnp.float32)
        y, extras = model.apply(params, x, t, eps)
        assert y.shape == (2, 3, 4, 1)
        # aux is evaluated at the accepted output grid points: (T-1, B*S, R, 2)
        assert extras.aux["rates"].shape == (3, 6, 1, 2)
        assert np.all(np.isfinite(np.asarray(y)))
        # close to the fixed-step solution on this smooth problem
        model_rk = dc.replace(model, method="rk4", substeps=8)
        y_rk, _ = model_rk.apply(params, x, t, eps)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_rk),
                                   rtol=1e-3, atol=1e-4)

    def test_dopri5_aux_is_rhs_at_output_grid_points(self):
        """Pin the adaptive path's aux SEMANTICS (models/vae.py:285-291):
        because the accepted step count is data-dependent, the fixed path's
        stage-ordered statistics cannot be collected; instead the aux is the
        RHS auxiliary evaluated at (t[k], latent[t_k]) for k = 1..T-1 —
        exactly one evaluation per accepted output grid point, in grid
        order.  (The reference never runs adaptive, so there is no torch
        oracle; this test pins what the semantics ARE.)"""
        import dataclasses as dc

        from fiude_tpu.models import UDEForecaster
        model = UDEForecaster.build(
            n_regions=1, latent_dim=6, n_qs=3, ode_name="Fp",
            enc_params={"q_sizes": (8,), "ff_sizes": (8,)},
            ode_params={"net_sizes": (8, 8)})
        model = dc.replace(model, method="dopri5")
        params = model.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (2, 10, 4)).astype(np.float32))
        eps = jnp.asarray(rng.standard_normal((3, 2, 1, 5)).astype(np.float32))
        t = jnp.arange(4, dtype=jnp.float32)
        _, extras = model.apply(params, x, t, eps)

        rhs = model.rhs_fn(params.ode, 1.0)
        expected = jax.vmap(lambda ti, yi: rhs(ti, yi)[1])(
            t[1:], extras.latent[1:])
        np.testing.assert_allclose(np.asarray(extras.aux["rates"]),
                                   np.asarray(expected["rates"]),
                                   rtol=1e-6, atol=1e-7)


class TestTsit5:
    def test_exponential_accuracy(self):
        from fiude_tpu.ops import odeint_tsit5
        t = jnp.linspace(0.0, 3.0, 7, dtype=jnp.float64)
        ys = odeint_tsit5(exp_rhs, jnp.array([1.0], jnp.float64), t,
                          rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(ys[:, 0], jnp.exp(-t), rtol=1e-6)

    def test_sir_matches_dopri5(self):
        from fiude_tpu.ops import odeint_tsit5
        y0 = jnp.array([0.9, 0.1, 0.0], dtype=jnp.float64)
        t = jnp.linspace(0.0, 12.0, 13, dtype=jnp.float64)
        ys_ts = odeint_tsit5(sir_rhs, y0, t, rtol=1e-9, atol=1e-11)
        ys_dp = odeint_dopri5(sir_rhs, y0, t, rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(ys_ts), np.asarray(ys_dp),
                                   rtol=1e-7, atol=1e-9)

    def test_pid_third_term(self):
        from fiude_tpu.ops import odeint_adaptive
        t = jnp.linspace(0.0, 2.0, 5, dtype=jnp.float64)
        ys = odeint_adaptive(exp_rhs, jnp.array([1.0], jnp.float64), t,
                             method="dopri5", pid_gamma=0.02)
        np.testing.assert_allclose(ys[:, 0], jnp.exp(-t), rtol=1e-5)
