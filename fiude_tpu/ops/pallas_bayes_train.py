"""Fused full-trajectory *Bayesian* UDE solver for TRAINING: forward +
hand-written backward as one ``jax.custom_vjp`` pair of Pallas TPU kernels.

Training-path counterpart of :mod:`ops.pallas_bayes` (which fuses serving
only) for the variational RHS families CONNb/UONNb/SONNb (reference
``lib/in_development/models_bayes.py:69-265``).  The reference draws fresh
mean-field weight noise ``w = w_mean + z * |w_std|`` at *every* RHS
evaluation (``make_z`` per forward, ``models_bayes.py:30-48``) and backprops
through the draw into both ``w_mean`` and ``w_std``; the XLA path reproduces
that by threading a per-(step, stage) PRNG key through ``lax.scan`` — ~60 ms
per daily-grid step, dispatch-latency-bound.  Here the whole trajectory runs
as ONE forward launch and ONE backward launch:

* **noise reproducibility** — each RHS evaluation ``e`` re-seeds the on-core
  PRNG with ``(seed, e)`` (``pltpu.prng_seed``) and draws the per-weight
  noise tensors in a fixed canonical order, so the backward sweep — which
  visits evaluations in *reverse* — re-derives bit-identical noise without
  storing any of it (O(1) memory for O(T) evaluations' worth of draws);
* **forward** — the deterministic training kernel's math
  (:func:`ops.pallas_train._rhs_forward`) on per-evaluation materialized
  effective weights ``mean + z * stdabs``; streams the state trajectory and
  stage-ordered aux (rates / fa) to HBM exactly like the deterministic pair;
* **backward** — reverse sweep re-materializing each evaluation's weights,
  hand-back-propagating the RK4(3/8) stage combinations and the RHS, and
  accumulating BOTH cotangent sets in VMEM: ``g_mean`` (the plain weight
  cotangent) and ``g_stdabs = g_w ∘ z`` (the reparameterized-noise chain
  rule).  ``|std|``'s sign chain runs outside the kernel via the traceable
  packing (``jnp.abs`` under autodiff).

The kernel PRNG cannot match the XLA path draw-for-draw (different
generator), only in distribution; correctness is pinned by (a) an
injected-noise mode where the caller supplies every evaluation's noise and
``jax.grad`` of a pure-JAX oracle recomputes values AND every cotangent
exactly, and (b) zero-std equivalence with the deterministic fused training
kernel (``tests/test_pallas_bayes_train.py``).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fiude_tpu.ops.pallas_bayes import _kernel_normal
from fiude_tpu.ops.pallas_train import (
    _RATE_SHIFT, _cm_permute_net_traceable, _dot, _elu, _elu_grad,
    _rhs_forward,
)
from fiude_tpu.ops.pallas_ude import _build_plan


def bayes_cm_permute_traceable(params, R: int, L: int, *, has_fp: bool,
                               has_aug: bool):
    """Differentiable CM permutation of Bayes variational params into TWO
    flat weight lists (means, |stds|), each shaped exactly like the
    deterministic :func:`ops.pallas_train.cm_permute_traceable` output.
    Cotangents flow back onto ``w_mean``/``b_mean`` and (through ``jnp.abs``)
    onto ``w_std``/``b_std``."""
    from types import SimpleNamespace
    from fiude_tpu.models.nn import Dense

    def view(take):
        ns = SimpleNamespace()
        if has_fp:
            ns.fp_net = tuple(Dense(w=take(l)[0], b=take(l)[1])
                              for l in params.fp_net)
        if has_aug:
            ns.aug_net = tuple(Dense(w=take(l)[0], b=take(l)[1])
                               for l in params.aug_net)
        return ns

    means = view(lambda l: (l.w_mean, l.b_mean))
    stds = view(lambda l: (jnp.abs(l.w_std), jnp.abs(l.b_std)))

    def flatten(ns):
        flat = []
        if has_fp:
            flat += _cm_permute_net_traceable(ns.fp_net, "rates", R, L)
        if has_aug:
            flat += _cm_permute_net_traceable(ns.aug_net, "aug", R, L)
        return flat

    return flatten(means), flatten(stds)


# ---------------------------------------------------------------------------
# Kernel-side noise / weight materialization
# ---------------------------------------------------------------------------

def _draw_all(e, shapes, noise, seed_i):
    """Noise for every packed weight array at evaluation ``e``, in canonical
    list order.  PRNG mode re-seeds with (seed, e) so the draw is a pure
    function of (seed, e) — the backward re-derives it in reverse order."""
    if noise is not None:
        return [noise[k][e] for k in range(len(shapes))]
    pltpu.prng_seed(seed_i, e)
    return [_kernel_normal(s) for s in shapes]


def _materialize(means, stds, zs):
    return [means[k][:] + zs[k] * stds[k][:] for k in range(len(zs))]


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _make_fwd_kernel(T, R, plan, tile_b, tail_w, mechanistic, has_aug,
                     P, P2, P3, n_arr, n_noise, stats_mode=False):
    def kernel(*refs):
        i = 0
        seed_ref = None
        if n_noise == 0:
            seed_ref = refs[i]; i += 1
        faw_ref, dts_ref = refs[i], refs[i + 1]; i += 2
        mask_ref = None
        if stats_mode:
            mask_ref = refs[i]; i += 1
        z_ref, ztail_ref = refs[i], refs[i + 1]; i += 2
        means = refs[i: i + n_arr]; i += n_arr
        stds = refs[i: i + n_arr]; i += n_arr
        noise = None
        if n_noise:
            noise = refs[i: i + n_noise]; i += n_noise
        rest = list(refs[i:])
        traj_hbm = rest.pop(0)
        if stats_mode:
            stats_ref = rest.pop(0)
            rates_hbm = fa_hbm = None
            scr_rates = sem_rates = scr_fa = sem_fa = None
            scr_traj = rest.pop(0)
            sem_traj = rest.pop(0)
        else:
            rates_hbm = rest.pop(0) if mechanistic else None
            fa_hbm = rest.pop(0) if has_aug else None
            scr_traj = rest.pop(0)
            sem_traj = rest.pop(0)
            scr_rates = rest.pop(0) if mechanistic else None
            sem_rates = rest.pop(0) if mechanistic else None
            scr_fa = rest.pop(0) if has_aug else None
            sem_fa = rest.pop(0) if has_aug else None

        fa_w = faw_ref[0, 0]
        seed_i = seed_ref[0] if seed_ref is not None else 0
        shapes = [m.shape for m in means]
        tile0 = pl.program_id(0) * tile_b
        z_tail = ztail_ref[:]

        def ship_traj(ti, slot):
            return pltpu.make_async_copy(
                scr_traj.at[slot], traj_hbm.at[ti, pl.ds(tile0, tile_b), :],
                sem_traj.at[slot])

        def put_traj(ti, zh):
            slot = jax.lax.rem(ti, 2)

            @pl.when(ti >= 2)
            def _():
                ship_traj(ti - 2, slot).wait()

            scr_traj[slot] = jnp.pad(zh, ((0, 0), (0, P - zh.shape[1])))
            ship_traj(ti, slot).start()

        def ship_aux(scr, sem, hbm, e, slot):
            return pltpu.make_async_copy(
                scr.at[slot], hbm.at[e, pl.ds(tile0, tile_b), :],
                sem.at[slot])

        def put_aux(scr, sem, hbm, e, val, width):
            slot = jax.lax.rem(e, 2)

            @pl.when(e >= 2)
            def _():
                ship_aux(scr, sem, hbm, e - 2, slot).wait()

            scr[slot] = jnp.pad(val, ((0, 0), (0, width - val.shape[1])))
            ship_aux(scr, sem, hbm, e, slot).start()

        cb, cg = _RATE_SHIFT

        def f_eval(zh, e):
            zs = _draw_all(e, shapes, noise, seed_i)
            ws = _materialize(means, stds, zs)
            if tail_w:
                c_tail = _dot(z_tail, ws[1]) + ws[2]
            else:
                c_tail = ws[2]
            return _rhs_forward(zh, c_tail, ws[3:], ws[0], plan,
                                R, fa_w, mechanistic)

        def f_stream(zh, e):
            field, rates, fa = f_eval(zh, e)
            if mechanistic:
                put_aux(scr_rates, sem_rates, rates_hbm, e, rates, P2)
            if has_aug:
                put_aux(scr_fa, sem_fa, fa_hbm, e, fa, P3)
            return field

        def f_stats(zh, e, m, acc):
            """RHS eval folding the aux into masked sufficient statistics
            (see ops.pallas_train) — no HBM aux streams."""
            field, rates, fa = f_eval(zh, e)
            r1b, r1g, r2b, r2g, f2 = acc
            if mechanistic:
                db = rates[:, :R] - cb
                dg = rates[:, R:] - cg
                r1b = r1b + m * jnp.sum(db)
                r1g = r1g + m * jnp.sum(dg)
                r2b = r2b + m * jnp.sum(db * db)
                r2g = r2g + m * jnp.sum(dg * dg)
            if has_aug:
                f2 = f2 + m * jnp.sum(fa * fa)
            return field, (r1b, r1g, r2b, r2g, f2)

        zh = z_ref[:]
        put_traj(0, zh)

        if stats_mode:
            zero = jnp.asarray(0.0, jnp.float32)

            def step(i, carry):
                zh, acc = carry
                e = 4 * i
                dt = dts_ref[0, i]
                m = mask_ref[0, i]
                k1, acc = f_stats(zh, e, m, acc)
                k2, acc = f_stats(zh + dt * k1 * (1.0 / 3.0), e + 1, m, acc)
                k3, acc = f_stats(zh + dt * (k2 - k1 * (1.0 / 3.0)), e + 2,
                                  m, acc)
                k4, acc = f_stats(zh + dt * (k1 - k2 + k3), e + 3, m, acc)
                zh = zh + dt * (k1 + 3.0 * (k2 + k3) + k4) * 0.125
                put_traj(i + 1, zh)
                return zh, acc

            _, acc = jax.lax.fori_loop(0, T - 1, step, (zh, (zero,) * 5))
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            vec = jnp.zeros((1, 128), jnp.float32)
            for k, s in enumerate(acc):
                vec = jnp.where(lanes == k, s, vec)
            stats_ref[0] = vec
        else:
            def step(i, zh):
                e = 4 * i
                dt = dts_ref[0, i]
                k1 = f_stream(zh, e)
                k2 = f_stream(zh + dt * k1 * (1.0 / 3.0), e + 1)
                k3 = f_stream(zh + dt * (k2 - k1 * (1.0 / 3.0)), e + 2)
                k4 = f_stream(zh + dt * (k1 - k2 + k3), e + 3)
                zh = zh + dt * (k1 + 3.0 * (k2 + k3) + k4) * 0.125
                put_traj(i + 1, zh)
                return zh

            jax.lax.fori_loop(0, T - 1, step, zh)

        if T >= 2:
            ship_traj(T - 2, (T - 2) % 2).wait()
        ship_traj(T - 1, (T - 1) % 2).wait()
        if not stats_mode:
            n_e = 4 * (T - 1)
            for back in (2, 1):
                e = n_e - back
                if e >= 0:
                    if mechanistic:
                        ship_aux(scr_rates, sem_rates, rates_hbm, e,
                                 e % 2).wait()
                    if has_aug:
                        ship_aux(scr_fa, sem_fa, fa_hbm, e, e % 2).wait()

    return kernel


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _make_bwd_kernel(T, R, plan, tile_b, tail_w, mechanistic, has_aug,
                     P, P2, P3, n_arr, n_noise, stats_mode=False):
    n_plan = len(plan)

    def kernel(*refs):
        i = 0
        seed_ref = None
        if n_noise == 0:
            seed_ref = refs[i]; i += 1
        faw_ref, dts_ref = refs[i], refs[i + 1]; i += 2
        mask_ref = gstats_ref = None
        if stats_mode:
            mask_ref, gstats_ref = refs[i], refs[i + 1]; i += 2
        ztail_ref = refs[i]; i += 1
        means = refs[i: i + n_arr]; i += n_arr
        stds = refs[i: i + n_arr]; i += n_arr
        noise = None
        if n_noise:
            noise = refs[i: i + n_noise]; i += n_noise
        traj_hbm = refs[i]; i += 1
        gtraj_hbm = refs[i]; i += 1
        grates_hbm = gfa_hbm = None
        if not stats_mode:
            if mechanistic:
                grates_hbm = refs[i]; i += 1
            if has_aug:
                gfa_hbm = refs[i]; i += 1
        gz0_ref, gztail_ref, gfaw_ref = refs[i], refs[i + 1], refs[i + 2]
        i += 3
        gmean_refs = refs[i: i + n_arr]; i += n_arr
        gstd_refs = refs[i: i + n_arr]; i += n_arr
        rest = list(refs[i:])
        scr_z = rest.pop(0); sem_z = rest.pop(0)
        scr_g = rest.pop(0); sem_g = rest.pop(0)
        scr_gr = sem_gr = scr_gf = sem_gf = None
        if not stats_mode:
            if mechanistic:
                scr_gr = rest.pop(0); sem_gr = rest.pop(0)
            if has_aug:
                scr_gf = rest.pop(0); sem_gf = rest.pop(0)

        fa_w = faw_ref[0, 0]
        seed_i = seed_ref[0] if seed_ref is not None else 0
        shapes = [m.shape for m in means]
        tile0 = pl.program_id(0) * tile_b
        z_tail = ztail_ref[:]

        gztail_ref[...] = jnp.zeros(gztail_ref.shape, jnp.float32)
        gfaw_ref[...] = jnp.zeros(gfaw_ref.shape, jnp.float32)
        for ref in gmean_refs:
            ref[...] = jnp.zeros(ref.shape, jnp.float32)
        for ref in gstd_refs:
            ref[...] = jnp.zeros(ref.shape, jnp.float32)

        # double-buffered reverse-sweep prefetch (see ops.pallas_train)
        def row_copy(hbm, scr, sem, idx, slot):
            return pltpu.make_async_copy(
                hbm.at[idx, pl.ds(tile0, tile_b), :], scr.at[slot],
                sem.at[slot])

        def aux_copy(hbm, scr, sem, step_i, slot):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(4 * step_i, 4), pl.ds(tile0, tile_b), :],
                scr.at[slot], sem.at[slot])

        def start_step(i, slot):
            row_copy(traj_hbm, scr_z, sem_z, i, slot).start()
            row_copy(gtraj_hbm, scr_g, sem_g, i, slot).start()
            if scr_gr is not None:
                aux_copy(grates_hbm, scr_gr, sem_gr, i, slot).start()
            if scr_gf is not None:
                aux_copy(gfa_hbm, scr_gf, sem_gf, i, slot).start()

        def wait_step(i, slot):
            row_copy(traj_hbm, scr_z, sem_z, i, slot).wait()
            row_copy(gtraj_hbm, scr_g, sem_g, i, slot).wait()
            if scr_gr is not None:
                aux_copy(grates_hbm, scr_gr, sem_gr, i, slot).wait()
            if scr_gf is not None:
                aux_copy(gfa_hbm, scr_gf, sem_gf, i, slot).wait()

        def dotT(a, b):
            """a^T @ b: contract the batch (row) dim of both operands."""
            return jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def dot_rT(a, w):
            """a @ w^T without materializing the transpose (MXU contracts
            the rhs output dim directly, the q @ k^T pattern)."""
            return jax.lax.dot_general(
                a, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        def acc(k, contrib, zs):
            """Accumulate one evaluation's packed-weight cotangent into both
            variational sets: g_mean += g_w; g_stdabs += g_w ∘ z."""
            gmean_refs[k][...] += contrib
            gstd_refs[k][...] += contrib * zs[k]

        cb, cg = _RATE_SHIFT

        def rhs_vjp(zh, gout, g_rates_e, g_fa_e, ws, zs, m=None):
            """VJP of one RHS evaluation at state head ``zh`` under this
            evaluation's effective weights ``ws`` (noise ``zs``).  In stats
            mode the aux cotangents are reconstructed from the recomputed
            rates/fa and the scalar statistic cotangents (see
            ops.pallas_train)."""
            w0h, w0t, b0 = ws[0], ws[1], ws[2]
            arrs = ws[3:]
            if tail_w:
                c_tail = _dot(z_tail, w0t) + b0
            else:
                c_tail = b0
            _, rates, fa, acts = _rhs_forward(
                zh, c_tail, arrs, w0h, plan, R, fa_w, mechanistic,
                want_acts=True)
            if stats_mode:
                if mechanistic:
                    g1b, g1g = gstats_ref[0, 0], gstats_ref[0, 1]
                    g2b, g2g = gstats_ref[0, 2], gstats_ref[0, 3]
                    db = rates[:, :R] - cb
                    dg = rates[:, R:] - cg
                    g_rates_e = jnp.concatenate(
                        [m * (g1b + 2.0 * db * g2b),
                         m * (g1g + 2.0 * dg * g2g)], axis=-1)
                if has_aug:
                    g_fa_e = m * (2.0 * gstats_ref[0, 4]) * fa
            oor = (zh > 2.0) | (zh < -1.0)
            gfield = jnp.where(oor, 0.0, gout)

            gu_direct = jnp.zeros_like(zh)
            grates = None
            gfa_head = None
            if mechanistic:
                gf_S = gfield[:, :R]
                gf_I = gfield[:, R: 2 * R]
                gf_R = gfield[:, 2 * R:]
                g_plus = gf_I - gf_S
                g_minus = gf_R - gf_I
                S, I = zh[:, :R], zh[:, R: 2 * R]
                beta, gam = rates[:, :R], rates[:, R:]
                gbeta = g_plus * S * I
                ggam = g_minus * I
                gS = g_plus * beta * I
                gI = g_plus * beta * S + g_minus * gam
                gu_direct = jnp.concatenate(
                    [gS, gI, jnp.zeros_like(gf_R)], axis=-1)
                grates = jnp.concatenate([gbeta, ggam], axis=-1)
                if g_rates_e is not None:
                    grates = grates + g_rates_e
                if has_aug:
                    gfa_head = fa_w * gfield
                    gfaw_ref[0, 0] = gfaw_ref[0, 0] + jnp.sum(gfield * fa)
                    if g_fa_e is not None:
                        gfa_head = gfa_head + g_fa_e
            else:
                gfa_head = gfield
                if g_fa_e is not None:
                    gfa_head = gfa_head + g_fa_e

            gh_next = None
            gfa_next = gfa_head
            if mechanistic and n_plan > 0:
                gh_next = jnp.sign(acts[-1]) * grates

            for k in range(n_plan - 1, -1, -1):
                op = plan[k]
                w = arrs[2 * k]
                h_prev = acts[k]
                if op.kind == "packed":
                    if op.aug_done:
                        delta = jnp.concatenate([gh_next, gfa_next],
                                                axis=-1)
                        gfa_next = None
                    else:
                        delta = gh_next
                    if op.act_f == op.act_a:
                        x = _elu(h_prev) if op.act_f else h_prev
                    else:
                        left = h_prev[:, : op.split_in]
                        right = h_prev[:, op.split_in:]
                        x = jnp.concatenate(
                            [_elu(left) if op.act_f else left,
                             _elu(right) if op.act_a else right], axis=-1)
                    acc(3 + 2 * k, dotT(x, delta), zs)
                    acc(4 + 2 * k, jnp.sum(delta, axis=0, keepdims=True),
                        zs)
                    gx = dot_rT(delta, w)
                    if op.act_f == op.act_a:
                        gh_next = gx * _elu_grad(h_prev) if op.act_f else gx
                    else:
                        gl = gx[:, : op.split_in]
                        gr = gx[:, op.split_in:]
                        if op.act_f:
                            gl = gl * _elu_grad(h_prev[:, : op.split_in])
                        if op.act_a:
                            gr = gr * _elu_grad(h_prev[:, op.split_in:])
                        gh_next = jnp.concatenate([gl, gr], axis=-1)
                elif op.kind == "fp":
                    delta = gh_next
                    x = _elu(h_prev) if op.act_f else h_prev
                    acc(3 + 2 * k, dotT(x, delta), zs)
                    acc(4 + 2 * k, jnp.sum(delta, axis=0, keepdims=True),
                        zs)
                    gx = dot_rT(delta, w)
                    gh_next = gx * _elu_grad(h_prev) if op.act_f else gx
                else:  # pure-aug op
                    delta = gfa_next
                    x = _elu(h_prev) if op.act_a else h_prev
                    acc(3 + 2 * k, dotT(x, delta), zs)
                    acc(4 + 2 * k, jnp.sum(delta, axis=0, keepdims=True),
                        zs)
                    gx = dot_rT(delta, w)
                    gfa_next = gx * _elu_grad(h_prev) if op.act_a else gx

            if n_plan == 0:
                delta0 = (jnp.sign(acts[0]) * grates if mechanistic
                          else gfa_next)
            elif mechanistic:
                delta0 = gh_next
            else:
                delta0 = gfa_next

            acc(0, dotT(zh, delta0), zs)
            if tail_w:
                acc(1, dotT(z_tail, delta0), zs)
                gztail_ref[...] += dot_rT(delta0, w0t)
            acc(2, jnp.sum(delta0, axis=0, keepdims=True), zs)
            return dot_rT(delta0, w0h) + gu_direct

        def step_bwd(j, gz):
            i = T - 2 - j
            slot = jax.lax.rem(j, 2)
            dt = dts_ref[0, i]
            wait_step(i, slot)

            @pl.when(i >= 1)
            def _():
                start_step(i - 1, 1 - slot)

            zh = scr_z[slot][:, : 3 * R]
            m = mask_ref[0, i] if stats_mode else None

            def g_r(s):
                return (scr_gr[slot, s][:, : 2 * R]
                        if scr_gr is not None else None)

            def g_f(s):
                return (scr_gf[slot, s][:, : 3 * R]
                        if scr_gf is not None else None)

            # one noise stash per stage evaluation; effective weights are
            # re-materialized from it on use (mul+add, no transcendentals)
            zs = [_draw_all(4 * i + s, shapes, noise, seed_i)
                  for s in range(4)]

            def fwd_eval(u, s):
                ws = _materialize(means, stds, zs[s])
                if tail_w:
                    c_tail = _dot(z_tail, ws[1]) + ws[2]
                else:
                    c_tail = ws[2]
                field, _, _ = _rhs_forward(u, c_tail, ws[3:], ws[0], plan,
                                           R, fa_w, mechanistic)
                return field

            # recompute the stage states from the stored z_i
            k1 = fwd_eval(zh, 0)
            u2 = zh + dt * k1 * (1.0 / 3.0)
            k2 = fwd_eval(u2, 1)
            u3 = zh + dt * (k2 - k1 * (1.0 / 3.0))
            k3 = fwd_eval(u3, 2)
            u4 = zh + dt * (k1 - k2 + k3)

            gk1 = gz * (dt * 0.125)
            gk2 = gz * (dt * 0.375)
            gk3 = gz * (dt * 0.375)
            gk4 = gz * (dt * 0.125)
            gz_new = gz

            gu4 = rhs_vjp(u4, gk4, g_r(3), g_f(3),
                          _materialize(means, stds, zs[3]), zs[3],
                          m)
            gz_new = gz_new + gu4
            gk1 = gk1 + dt * gu4
            gk2 = gk2 - dt * gu4
            gk3 = gk3 + dt * gu4

            gu3 = rhs_vjp(u3, gk3, g_r(2), g_f(2),
                          _materialize(means, stds, zs[2]), zs[2],
                          m)
            gz_new = gz_new + gu3
            gk2 = gk2 + dt * gu3
            gk1 = gk1 - dt * gu3 * (1.0 / 3.0)

            gu2 = rhs_vjp(u2, gk2, g_r(1), g_f(1),
                          _materialize(means, stds, zs[1]), zs[1],
                          m)
            gz_new = gz_new + gu2
            gk1 = gk1 + dt * gu2 * (1.0 / 3.0)

            gu1 = rhs_vjp(zh, gk1, g_r(0), g_f(0),
                          _materialize(means, stds, zs[0]), zs[0],
                          m)
            gz_new = gz_new + gu1

            return gz_new + scr_g[slot][:, : 3 * R]

        cp_last = row_copy(gtraj_hbm, scr_g, sem_g, T - 1, 1)
        cp_last.start()
        start_step(T - 2, 0)
        cp_last.wait()
        gz = scr_g[1][:, : 3 * R]
        gz = jax.lax.fori_loop(0, T - 1, step_bwd, gz)
        gz0_ref[...] = gz

    return kernel


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _get_bayes_train_traj(T, R, L, n_fp_layers, n_aug_layers, tile_b,
                          tile_bwd, interpret, n_noise, stats_mode=False):
    """Build the custom_vjp'ed Bayes trajectory function for one static
    config.  ``n_noise > 0`` enables the injected-noise (test) mode: the
    caller supplies one (4*(T-1),) + shape noise array per packed weight
    array, VMEM-resident (small test shapes only)."""
    mechanistic = n_fp_layers > 0
    has_aug = n_aug_layers > 0
    tail_w = (L - 3) * R
    P = max(128, ((3 * R + 127) // 128) * 128)
    P2 = max(128, ((2 * R + 127) // 128) * 128)
    P3 = max(128, ((3 * R + 127) // 128) * 128)
    n_evals = 4 * (T - 1)
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    full = lambda *_: (0, 0)
    full3 = lambda *_: (0, 0, 0)

    def noise_specs(noise):
        return [pl.BlockSpec(z.shape, full3, memory_space=pltpu.VMEM)
                for z in noise]

    def fwd_impl(plan, z_head, z_tail, means, stds, fa_w, dts, seed, noise,
                 tmask=None):
        B = z_head.shape[0]
        n_arr = len(means)
        n_tiles = B // tile_b
        kernel = _make_fwd_kernel(T, R, plan, tile_b, tail_w,
                                  mechanistic, has_aug, P, P2, P3, n_arr,
                                  n_noise, stats_mode=stats_mode)
        in_specs = []
        inputs = []
        if n_noise == 0:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            inputs.append(seed)
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        inputs += [jnp.reshape(fa_w, (1, 1)).astype(jnp.float32),
                   jnp.reshape(dts, (1, -1)).astype(jnp.float32)]
        if stats_mode:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            inputs.append(jnp.reshape(tmask, (1, -1)).astype(jnp.float32))
        in_specs += [
            pl.BlockSpec((tile_b, 3 * R), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, max(tail_w, 1)), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [z_head, z_tail]
        for w in means + stds:
            in_specs.append(pl.BlockSpec(w.shape, full,
                                         memory_space=pltpu.VMEM))
        inputs += list(means) + list(stds)
        if n_noise:
            in_specs += noise_specs(noise)
            inputs += list(noise)

        out_shape = [jax.ShapeDtypeStruct((T, B, P), jnp.float32)]
        out_specs = [hbm]
        if stats_mode:
            out_shape.append(
                jax.ShapeDtypeStruct((n_tiles, 1, 128), jnp.float32))
            out_specs.append(pl.BlockSpec((1, 1, 128),
                                          lambda i: (i, 0, 0),
                                          memory_space=pltpu.VMEM))
        scratch = [pltpu.VMEM((2, tile_b, P), jnp.float32),
                   pltpu.SemaphoreType.DMA((2,))]
        if not stats_mode:
            if mechanistic:
                out_shape.append(
                    jax.ShapeDtypeStruct((n_evals, B, P2), jnp.float32))
                out_specs.append(hbm)
                scratch += [pltpu.VMEM((2, tile_b, P2), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))]
            if has_aug:
                out_shape.append(
                    jax.ShapeDtypeStruct((n_evals, B, P3), jnp.float32))
                out_specs.append(hbm)
                scratch += [pltpu.VMEM((2, tile_b, P3), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))]

        outs = pl.pallas_call(
            kernel,
            grid=(B // tile_b,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(*inputs)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        outs = list(outs)
        traj = outs.pop(0)
        if stats_mode:
            svec = jnp.sum(outs.pop(0)[:, 0, :], axis=0)     # (128,)
            r1c = svec[0:2] if mechanistic else None
            r2c = svec[2:4] if mechanistic else None
            f2 = svec[4] if has_aug else None
            return traj, r1c, r2c, f2
        rates = outs.pop(0) if mechanistic else None
        fa = outs.pop(0) if has_aug else None
        return traj, rates, fa

    def bwd_impl(plan, z_tail, means, stds, fa_w, dts, seed, noise, traj,
                 g_traj, g_rates, g_fa, tmask=None, gstats=None):
        B = traj.shape[1]
        n_arr = len(means)
        n_tiles = B // tile_bwd
        kernel = _make_bwd_kernel(T, R, plan, tile_bwd, tail_w,
                                  mechanistic, has_aug, P, P2, P3, n_arr,
                                  n_noise, stats_mode=stats_mode)
        in_specs = []
        inputs = []
        if n_noise == 0:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            inputs.append(seed)
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        inputs += [jnp.reshape(fa_w, (1, 1)).astype(jnp.float32),
                   jnp.reshape(dts, (1, -1)).astype(jnp.float32)]
        if stats_mode:
            in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM),
                         pl.BlockSpec(memory_space=pltpu.SMEM)]
            inputs += [jnp.reshape(tmask, (1, -1)).astype(jnp.float32),
                       jnp.reshape(gstats, (1, -1)).astype(jnp.float32)]
        in_specs.append(
            pl.BlockSpec((tile_bwd, max(tail_w, 1)), lambda i: (i, 0),
                         memory_space=pltpu.VMEM))
        inputs.append(z_tail)
        for w in means + stds:
            in_specs.append(pl.BlockSpec(w.shape, full,
                                         memory_space=pltpu.VMEM))
        inputs += list(means) + list(stds)
        if n_noise:
            in_specs += noise_specs(noise)
            inputs += list(noise)
        in_specs += [hbm, hbm]
        inputs += [traj, g_traj]
        if not stats_mode:
            if mechanistic:
                in_specs.append(hbm)
                inputs.append(g_rates)
            if has_aug:
                in_specs.append(hbm)
                inputs.append(g_fa)

        out_shape = [
            jax.ShapeDtypeStruct((B, 3 * R), jnp.float32),
            jax.ShapeDtypeStruct((B, max(tail_w, 1)), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, 128), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((tile_bwd, 3 * R), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_bwd, max(tail_w, 1)), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        for w in means + means:  # gmean blocks then gstd blocks
            out_shape.append(jax.ShapeDtypeStruct((n_tiles,) + w.shape,
                                                  jnp.float32))
            out_specs.append(pl.BlockSpec((1,) + w.shape,
                                          lambda i: (i, 0, 0),
                                          memory_space=pltpu.VMEM))

        scratch = [pltpu.VMEM((2, tile_bwd, P), jnp.float32),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.VMEM((2, tile_bwd, P), jnp.float32),
                   pltpu.SemaphoreType.DMA((2,))]
        if not stats_mode:
            if mechanistic:
                scratch += [pltpu.VMEM((2, 4, tile_bwd, P2), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))]
            if has_aug:
                scratch += [pltpu.VMEM((2, 4, tile_bwd, P3), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))]

        outs = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(*inputs)
        gz0 = outs[0]
        gztail = outs[1]
        gfa_w = jnp.sum(outs[2][:, 0, 0])
        n_arr = len(means)
        gmeans = tuple(jnp.sum(o, axis=0) for o in outs[3: 3 + n_arr])
        gstds = tuple(jnp.sum(o, axis=0) for o in outs[3 + n_arr:])
        return gz0, gztail, gmeans, gstds, gfa_w

    if stats_mode:
        @functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
        def traj_fn(plan, z_head, z_tail, means, stds, fa_w, dts, seed,
                    noise, tmask):
            return fwd_impl(plan, z_head, z_tail, means, stds, fa_w, dts,
                            seed, noise, tmask)

        def traj_fwd(plan, z_head, z_tail, means, stds, fa_w, dts, seed,
                     noise, tmask):
            out = fwd_impl(plan, z_head, z_tail, means, stds, fa_w, dts,
                           seed, noise, tmask)
            return out, (z_tail, means, stds, fa_w, dts, seed, noise, tmask,
                         out[0])

        def traj_bwd(plan, res, g):
            z_tail, means, stds, fa_w, dts, seed, noise, tmask, traj = res
            g_traj, g_r1, g_r2, g_f2 = g
            zer = jnp.zeros((), jnp.float32)
            gs = [zer] * 5
            if g_r1 is not None:
                gs[0], gs[1] = g_r1[0], g_r1[1]
                gs[2], gs[3] = g_r2[0], g_r2[1]
            if g_f2 is not None:
                gs[4] = jnp.asarray(g_f2, jnp.float32)
            gstats = jnp.stack(gs)
            gz0, gztail, gmeans, gstds, gfa_w = bwd_impl(
                plan, z_tail, means, stds, fa_w, dts, seed, noise, traj,
                g_traj, None, None, tmask=tmask, gstats=gstats)
            if not tail_w:
                gztail = jnp.zeros_like(z_tail)
            gnoise = (tuple(jnp.zeros_like(z) for z in noise)
                      if noise is not None else None)
            import numpy as np
            gseed = np.zeros(np.shape(seed), jax.dtypes.float0)
            return (gz0, gztail, gmeans, gstds, gfa_w, jnp.zeros_like(dts),
                    gseed, gnoise, jnp.zeros_like(tmask))

        traj_fn.defvjp(traj_fwd, traj_bwd)
    else:
        @functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
        def traj_fn(plan, z_head, z_tail, means, stds, fa_w, dts, seed,
                    noise):
            return fwd_impl(plan, z_head, z_tail, means, stds, fa_w, dts,
                            seed, noise)

        def traj_fwd(plan, z_head, z_tail, means, stds, fa_w, dts, seed,
                     noise):
            out = fwd_impl(plan, z_head, z_tail, means, stds, fa_w, dts,
                           seed, noise)
            return out, (z_tail, means, stds, fa_w, dts, seed, noise, out[0])

        def traj_bwd(plan, res, g):
            z_tail, means, stds, fa_w, dts, seed, noise, traj = res
            g_traj, g_rates, g_fa = g
            gz0, gztail, gmeans, gstds, gfa_w = bwd_impl(
                plan, z_tail, means, stds, fa_w, dts, seed, noise, traj,
                g_traj, g_rates, g_fa)
            if not tail_w:
                gztail = jnp.zeros_like(z_tail)
            gnoise = (tuple(jnp.zeros_like(z) for z in noise)
                      if noise is not None else None)
            # integer primal (the PRNG seed) takes a float0 cotangent
            import numpy as np
            gseed = np.zeros(np.shape(seed), jax.dtypes.float0)
            return (gz0, gztail, gmeans, gstds, gfa_w, jnp.zeros_like(dts),
                    gseed, gnoise)

        traj_fn.defvjp(traj_fwd, traj_bwd)

    def entry(means_flat, stds_flat, z_cm, fa_w, dts, seed, noise=None,
              tmask=None):
        """means_flat/stds_flat: traceable CM-permuted flat lists (identical
        structure); z_cm: (B, L*R); seed: int32 scalar array; dts: (T-1,)."""
        def pack(flat):
            if n_fp_layers > 0 and n_aug_layers > 0:
                w0 = jnp.concatenate(
                    [flat[0], flat[2 * n_fp_layers]], axis=1)
                b0 = jnp.concatenate(
                    [flat[1], flat[2 * n_fp_layers + 1]], axis=1)
            else:
                w0, b0 = flat[0], flat[1]
            w0h = w0[: 3 * R]
            w0t = w0[3 * R:] if tail_w else jnp.zeros((1, w0.shape[1]),
                                                      jnp.float32)
            plan, arrs = _build_plan(tuple(flat), n_fp_layers, n_aug_layers)
            return plan, (w0h, w0t, b0) + tuple(arrs)

        plan, means = pack(means_flat)
        _, stds = pack(stds_flat)

        B = z_cm.shape[0]
        z_head = z_cm[:, : 3 * R]
        z_tail = z_cm[:, 3 * R:] if tail_w else jnp.zeros((B, 1),
                                                          jnp.float32)
        seed_arr = jnp.reshape(seed, (1,)).astype(jnp.int32)
        if stats_mode:
            traj, r1, r2, f2 = traj_fn(plan, z_head, z_tail, means, stds,
                                       jnp.asarray(fa_w, jnp.float32),
                                       jnp.asarray(dts, jnp.float32),
                                       seed_arr, noise,
                                       jnp.asarray(tmask, jnp.float32))
            return traj[..., : 3 * R], r1, r2, f2
        traj, rates, fa = traj_fn(plan, z_head, z_tail, means, stds,
                                  jnp.asarray(fa_w, jnp.float32),
                                  jnp.asarray(dts, jnp.float32),
                                  seed_arr, noise)
        return traj[..., : 3 * R], \
            (rates[..., : 2 * R] if rates is not None else None), \
            (fa[..., : 3 * R] if fa is not None else None)

    return entry


def fused_bayes_train_trajectory(means_flat, stds_flat, z_cm, fa_w, dts,
                                 seed, *, T, R, L, n_fp_layers, n_aug_layers,
                                 tile_b=1024, tile_bwd=256,
                                 stats_mode: bool = False, tmask=None,
                                 interpret: Optional[bool] = None,
                                 noise: Optional[Sequence] = None):
    """Differentiable fused Bayesian RK4(3/8) trajectory (training path).

    Same contract as :func:`ops.pallas_train.fused_train_trajectory` plus:

      means_flat / stds_flat: the two flat lists from
        :func:`bayes_cm_permute_traceable` (cotangents flow back onto
        ``*_mean`` and, through the packing's ``jnp.abs``, onto ``*_std``).
      seed: int32 scalar (array ok) — each RHS evaluation ``e`` draws its
        weight noise from ``hash(seed, e)`` on-core; vary per train step.
      noise: optional injected per-evaluation noise for parity tests — one
        ``(4*(T-1),) + w.shape`` array per PACKED weight array in canonical
        order (w0h, w0t, b0, then plan (w, b) pairs); VMEM-resident, small
        test shapes only.

    Gradient caveat (matches the reference and the XLA scan path): the noise
    is treated as constant per evaluation — both paths differentiate through
    ``w = mean + z * |std|`` at fixed ``z``, the standard reparameterization
    estimator (reference ``models_bayes.py:30-48``).
    """
    if interpret is None:
        on_tpu = jax.devices()[0].platform == "tpu"
        if on_tpu:
            interpret = False
        else:
            # plain interpret=True cannot lower prng_seed; the Mosaic
            # interpreter stubs prng_random_bits to zeros (mean-weight
            # trajectory) — tests therefore use the injected-noise mode,
            # which needs no PRNG at all and runs exactly.
            interpret = (True if noise is not None
                         else pltpu.InterpretParams())
    if n_fp_layers == 1 and n_aug_layers > 0 or \
            n_aug_layers == 1 and n_fp_layers > 0:
        raise NotImplementedError(
            "single-layer nets mixed with a second net break the fused-L0 "
            "split (no reference architecture does this)")
    B = z_cm.shape[0]
    tile = min(tile_b, B)
    while B % tile != 0:
        tile //= 2
    tbwd = min(tile_bwd, B)
    while B % tbwd != 0:
        tbwd //= 2
    entry = _get_bayes_train_traj(
        int(T), int(R), int(L), int(n_fp_layers), int(n_aug_layers),
        int(tile), int(tbwd), interpret,
        0 if noise is None else len(noise), bool(stats_mode))
    if stats_mode and tmask is None:
        tmask = jnp.ones((int(T) - 1,), jnp.float32)
    return entry(tuple(means_flat), tuple(stds_flat), z_cm, fa_w, dts, seed,
                 noise=tuple(noise) if noise is not None else None,
                 tmask=tmask)
