"""Fused full-trajectory UDE solver for TRAINING: forward + hand-written
backward as one ``jax.custom_vjp`` pair of Pallas TPU kernels.

The reference's hot loop is backprop through the fixed-step solver
(``loss.backward()`` through ``odeint`` — ``lib/VAE.py:137,200-223``).  The
XLA ``lax.scan`` path in :mod:`ops.integrate` autodiffs correctly but issues
~100 small ops per RK step forward and again backward; on the daily
(85-point) grid of the no-interpolation mode (``testing_no_interpolation.py``)
the step is dispatch-latency-bound.  Here the whole trajectory runs as ONE
forward launch and ONE backward launch:

* **forward** — identical math to the serving kernel (compartment-major
  packed weights, VMEM-resident), but streams the integrated state head AND
  the per-evaluation auxiliaries (rates = |head| for the ``kl_p`` loss, fa
  for the Fa-norm penalty — reference ``lib/models.py:137,187``) to HBM;
* **backward** — reverse sweep over the stored trajectory: per step it
  re-evaluates the four RK4(3/8) stages from the stored ``z_i``
  (recompute-not-store), hand-back-propagates the stage combinations and the
  RHS (MLPs, |.| rates head, SIR bilinear field, out-of-range mask), and
  accumulates weight cotangents in VMEM output blocks (summed over batch
  tiles outside).  Aux cotangents (``g_rates``, ``g_fa``) enter at each
  evaluation's heads, exactly where the XLA path's autodiff applies them.

The custom_vjp boundary carries only the *packed* weight arrays; the
permutation/packing into compartment-major block-diagonal form is done with
traceable jnp ops (:func:`cm_permute_traceable` + ``_build_plan``), so XLA
autodiff maps packed-weight cotangents back onto the original parameter
pytree for free (the block-diagonal ``.at[].set`` transpose extracts the
on-diagonal blocks and drops the dense off-diagonal garbage).

Gradient correctness is pinned by tests against ``jax.grad`` of the
``odeint_grid`` scan path (values, aux, and every weight cotangent) —
``tests/test_pallas_train.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fiude_tpu.ops.pallas_ude import _build_plan, _cm_input_perm, _elu


# ---------------------------------------------------------------------------
# Traceable compartment-major permutation (differentiable packing)
# ---------------------------------------------------------------------------

def _out_perm(R: int, k: int) -> np.ndarray:
    perm = np.empty(k * R, dtype=np.int64)
    for kk in range(k):
        for r in range(R):
            perm[kk * R + r] = r * k + kk
    return perm


def _cm_permute_net_traceable(net, head: str, R: int, L: int):
    """jnp version of ``pallas_ude._cm_permute_net`` — index-permutes with
    ``jnp.take`` so the packing is differentiable and weight cotangents flow
    back onto the original layers."""
    in_perm = jnp.asarray(_cm_input_perm(R, L))
    arrs = []
    for li, layer in enumerate(net):
        w = layer.w.astype(jnp.float32)
        b = layer.b.astype(jnp.float32)
        if li == 0:
            w = jnp.take(w, in_perm, axis=0)
        if li == len(net) - 1:
            k = 2 if head == "rates" else 3
            op = jnp.asarray(_out_perm(R, k))
            w = jnp.take(w, op, axis=1)
            b = jnp.take(b, op, axis=0)
        arrs.append(w)
        arrs.append(b.reshape(1, -1))
    return arrs


def cm_permute_traceable(params, R: int, L: int, *, has_fp: bool,
                         has_aug: bool):
    """Differentiable CM permutation of SIRRates/UDE/NeuralAug params into
    the flat weight list the kernels consume."""
    flat = []
    if has_fp:
        flat += _cm_permute_net_traceable(params.fp_net, "rates", R, L)
    if has_aug:
        flat += _cm_permute_net_traceable(params.aug_net, "aug", R, L)
    return flat


# ---------------------------------------------------------------------------
# Shared RHS pieces (kernel-side)
# ---------------------------------------------------------------------------

def _elu_grad(h):
    """d/dh elu(h) without expm1 (Mosaic-safe)."""
    return jnp.where(h > 0, 1.0, jnp.exp(jnp.minimum(h, 0.0)))


def _dot(a, w):
    return jnp.dot(a, w, preferred_element_type=jnp.float32)


def _rhs_forward(zh, c_tail, arrs, w0h, plan, R, fa_w, mechanistic,
                 *, want_acts: bool = False):
    """One RHS evaluation on the state head.

    ``acts[k]`` is the input (pre-activation) of plan op ``k``; ``acts[0]``
    is the fused-L0 output.  Returns (field, rates|None, fa|None[, acts]).
    """
    h = _dot(zh, w0h[:]) + c_tail
    acts = [h] if want_acts else None
    fa = None
    for k, op in enumerate(plan):
        w, b = arrs[2 * k], arrs[2 * k + 1]
        if op.kind == "packed":
            if op.act_f == op.act_a:
                x = _elu(h) if op.act_f else h
            else:
                left, right = h[:, : op.split_in], h[:, op.split_in:]
                x = jnp.concatenate(
                    [_elu(left) if op.act_f else left,
                     _elu(right) if op.act_a else right], axis=-1)
            h = _dot(x, w[:]) + b[:]
            if op.aug_done:
                fa = h[:, op.out_split:]
                h = h[:, : op.out_split]
        elif op.kind == "fp":
            h = _dot(_elu(h) if op.act_f else h, w[:]) + b[:]
        else:  # pure-aug op (aug-only nets)
            fa_in = fa if fa is not None else h
            fa = _dot(_elu(fa_in) if op.act_a else fa_in, w[:]) + b[:]
        if want_acts:
            acts.append(fa if op.kind == "aug" else h)

    if mechanistic:
        rates = jnp.abs(h)
        beta, gam = rates[:, :R], rates[:, R:]
        S, I = zh[:, :R], zh[:, R: 2 * R]
        plus_i = beta * S * I
        minus_i = gam * I
        field = jnp.concatenate([-plus_i, plus_i - minus_i, minus_i],
                                axis=-1)
        if fa is not None:
            field = field + fa_w * fa
    else:
        rates = None
        fa = fa if fa is not None else h
        field = fa
    oor = (zh > 2.0) | (zh < -1.0)
    out = jnp.where(oor, 0.0, field)
    if want_acts:
        return out, rates, fa, acts
    return out, rates, fa


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

#: Static shifts for the in-kernel rate sufficient statistics: the (beta,
#: gamma) prior means (reference lib/VAE.py:99).  Shifted moments are
#: shift-invariant in the variance, so any fixed shift is *correct*; one
#: near the posterior mean avoids the f32 cancellation of sum-of-squares
#: minus squared-sum (same trick as compute_loss_sharded's centering round).
_RATE_SHIFT = (0.8, 0.55)


def _make_fwd_kernel(T, R, plan, tile_b, tail_w, mechanistic, has_aug,
                     P, P2, P3, stats_mode=False):
    def kernel(*refs):
        i = 0
        faw_ref, dts_ref = refs[i], refs[i + 1]; i += 2
        mask_ref = None
        if stats_mode:
            mask_ref = refs[i]; i += 1
        z_ref, ztail_ref = refs[i], refs[i + 1]; i += 2
        n_arr = 3 + 2 * len(plan)
        arrs_all = refs[i: i + n_arr]; i += n_arr
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

        w0h, w0t, b0 = arrs_all[0], arrs_all[1], arrs_all[2]
        arrs = arrs_all[3:]
        fa_w = faw_ref[0, 0]
        tile0 = pl.program_id(0) * tile_b

        if tail_w:
            c_tail = _dot(ztail_ref[:], w0t[:]) + b0[:]
        else:
            c_tail = b0[:]

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

        def f_stream(zh, e):
            field, rates, fa = _rhs_forward(zh, c_tail, arrs, w0h, plan, R,
                                            fa_w, mechanistic)
            if mechanistic:
                put_aux(scr_rates, sem_rates, rates_hbm, e, rates, P2)
            if has_aug:
                put_aux(scr_fa, sem_fa, fa_hbm, e, fa, P3)
            return field

        def f_stats(zh, m, acc):
            """RHS eval folding the aux directly into masked sufficient
            statistics (5 loop-carried f32 scalars) — no HBM aux streams."""
            field, rates, fa = _rhs_forward(zh, c_tail, arrs, w0h, plan, R,
                                            fa_w, mechanistic)
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
                k1, acc = f_stats(zh, m, acc)
                k2, acc = f_stats(zh + dt * k1 * (1.0 / 3.0), m, acc)
                k3, acc = f_stats(zh + dt * (k2 - k1 * (1.0 / 3.0)), m, acc)
                k4, acc = f_stats(zh + dt * (k1 - k2 + k3), m, acc)
                zh = zh + dt * (k1 + 3.0 * (k2 + k3) + k4) * 0.125
                put_traj(i + 1, zh)
                return zh, acc

            _, acc = jax.lax.fori_loop(
                0, T - 1, step, (zh, (zero,) * 5))
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
                     P, P2, P3, stats_mode=False):
    n_plan = len(plan)
    n_arr = 3 + 2 * n_plan

    def kernel(*refs):
        i = 0
        faw_ref, dts_ref = refs[i], refs[i + 1]; i += 2
        mask_ref = gstats_ref = None
        if stats_mode:
            mask_ref, gstats_ref = refs[i], refs[i + 1]; i += 2
        ztail_ref = refs[i]; i += 1
        arrs_all = refs[i: i + n_arr]; i += n_arr
        arrsT_all = refs[i: i + n_arr]; i += n_arr
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
        gw_refs = refs[i: i + n_arr]; i += n_arr
        rest = list(refs[i:])
        scr_z = rest.pop(0); sem_z = rest.pop(0)
        scr_g = rest.pop(0); sem_g = rest.pop(0)
        scr_gr = sem_gr = scr_gf = sem_gf = None
        if not stats_mode:
            if mechanistic:
                scr_gr = rest.pop(0); sem_gr = rest.pop(0)
            if has_aug:
                scr_gf = rest.pop(0); sem_gf = rest.pop(0)

        w0h, w0t, b0 = arrs_all[0], arrs_all[1], arrs_all[2]
        arrs = arrs_all[3:]
        w0hT, w0tT = arrsT_all[0], arrsT_all[1]
        arrsT = arrsT_all[3:]
        fa_w = faw_ref[0, 0]
        tile0 = pl.program_id(0) * tile_b
        z_tail = ztail_ref[:]

        if tail_w:
            c_tail = _dot(z_tail, w0t[:]) + b0[:]
        else:
            c_tail = b0[:]

        # output VMEM blocks are uninitialized — zero the accumulators
        gztail_ref[...] = jnp.zeros(gztail_ref.shape, jnp.float32)
        gfaw_ref[...] = jnp.zeros(gfaw_ref.shape, jnp.float32)
        for ref in gw_refs:
            ref[...] = jnp.zeros(ref.shape, jnp.float32)

        # Double-buffered reverse-sweep prefetch: while step i computes
        # (4 RHS re-evals + VJPs, the long pole), step i-1's four HBM
        # streams (z, g_traj, g_rates, g_fa) are already in flight into the
        # other slot — the serial start->wait fetch pattern costs ~2,700
        # exposed DMA latencies per trajectory otherwise.
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

        cb, cg = _RATE_SHIFT

        def rhs_vjp(zh, gout, g_rates_e, g_fa_e, m=None):
            """VJP of one RHS evaluation at state head ``zh``.  Accumulates
            weight/bias/tail/fa_w cotangents into the output refs; returns
            the state-head cotangent.  In stats mode the aux cotangents are
            reconstructed here from the recomputed rates/fa and the scalar
            sufficient-statistic cotangents (chain rule of the masked
            shifted sums) — no HBM aux-gradient streams exist."""
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

            # ---- backprop the MLP plan in reverse ----
            gh_next = None      # cotangent on the fp-branch running output
            gfa_next = gfa_head  # cotangent on the aug branch output
            if mechanistic and n_plan > 0:
                gh_next = jnp.sign(acts[-1]) * grates

            for k in range(n_plan - 1, -1, -1):
                op = plan[k]
                wT = arrsT[2 * k]
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
                    gw_refs[3 + 2 * k][...] += dotT(x, delta)
                    gw_refs[4 + 2 * k][...] += jnp.sum(delta, axis=0,
                                                       keepdims=True)
                    gx = _dot(delta, wT[:])
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
                    gw_refs[3 + 2 * k][...] += dotT(x, delta)
                    gw_refs[4 + 2 * k][...] += jnp.sum(delta, axis=0,
                                                       keepdims=True)
                    gx = _dot(delta, wT[:])
                    gh_next = gx * _elu_grad(h_prev) if op.act_f else gx
                else:  # pure-aug op
                    delta = gfa_next
                    x = _elu(h_prev) if op.act_a else h_prev
                    gw_refs[3 + 2 * k][...] += dotT(x, delta)
                    gw_refs[4 + 2 * k][...] += jnp.sum(delta, axis=0,
                                                       keepdims=True)
                    gx = _dot(delta, wT[:])
                    gfa_next = gx * _elu_grad(h_prev) if op.act_a else gx

            if n_plan == 0:
                delta0 = (jnp.sign(acts[0]) * grates if mechanistic
                          else gfa_next)
            elif mechanistic:
                delta0 = gh_next
            else:
                delta0 = gfa_next

            gw_refs[0][...] += dotT(zh, delta0)
            if tail_w:
                gw_refs[1][...] += dotT(z_tail, delta0)
                gztail_ref[...] += _dot(delta0, w0tT[:])
            gw_refs[2][...] += jnp.sum(delta0, axis=0, keepdims=True)
            return _dot(delta0, w0hT[:]) + gu_direct

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

            # recompute the stage states from the stored z_i
            k1, _, _ = _rhs_forward(zh, c_tail, arrs, w0h, plan, R, fa_w,
                                    mechanistic)
            u2 = zh + dt * k1 * (1.0 / 3.0)
            k2, _, _ = _rhs_forward(u2, c_tail, arrs, w0h, plan, R, fa_w,
                                    mechanistic)
            u3 = zh + dt * (k2 - k1 * (1.0 / 3.0))
            k3, _, _ = _rhs_forward(u3, c_tail, arrs, w0h, plan, R, fa_w,
                                    mechanistic)
            u4 = zh + dt * (k1 - k2 + k3)

            gk1 = gz * (dt * 0.125)
            gk2 = gz * (dt * 0.375)
            gk3 = gz * (dt * 0.375)
            gk4 = gz * (dt * 0.125)
            gz_new = gz

            gu4 = rhs_vjp(u4, gk4, g_r(3), g_f(3), m)
            gz_new = gz_new + gu4
            gk1 = gk1 + dt * gu4
            gk2 = gk2 - dt * gu4
            gk3 = gk3 + dt * gu4

            gu3 = rhs_vjp(u3, gk3, g_r(2), g_f(2), m)
            gz_new = gz_new + gu3
            gk2 = gk2 + dt * gu3
            gk1 = gk1 - dt * gu3 * (1.0 / 3.0)

            gu2 = rhs_vjp(u2, gk2, g_r(1), g_f(1), m)
            gz_new = gz_new + gu2
            gk1 = gk1 + dt * gu2 * (1.0 / 3.0)

            gu1 = rhs_vjp(zh, gk1, g_r(0), g_f(0), m)
            gz_new = gz_new + gu1

            return gz_new + scr_g[slot][:, : 3 * R]

        # last-point cotangent into slot 1 (step 0 computes out of slot 0),
        # with the first step's streams already in flight behind it
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
def _get_train_traj(T, R, L, n_fp_layers, n_aug_layers, tile_b, tile_bwd,
                    interpret, stats_mode=False):
    """Build the custom_vjp'ed trajectory function for one static config.

    ``tile_bwd`` is the backward kernel's batch tile: the reverse sweep
    holds ~3x the forward's live VMEM set (stage states + 4 stage
    cotangents + the activation stash + weight-cotangent accumulators), so
    at the forward's preferred 1024-row tile it blows the ~16 MiB scoped
    VMEM stack (measured 29.6 MiB on v5e) — it runs at a smaller tile.

    ``stats_mode`` folds the aux reductions into the kernels: instead of
    streaming the (4(T-1), B, *) rates/fa tensors to HBM (and their
    cotangent streams back), the forward emits the masked sufficient
    statistics the loss actually needs (shifted rate sums/sum-of-squares for
    ``kl_p``, sum(fa^2) for ``fa_norm``) and the backward reconstructs each
    evaluation's aux cotangent on the fly from the recomputed rates/fa —
    O(100 MB) of HBM aux traffic per step becomes a few scalars.
    """
    mechanistic = n_fp_layers > 0
    has_aug = n_aug_layers > 0
    tail_w = (L - 3) * R
    P = max(128, ((3 * R + 127) // 128) * 128)
    P2 = max(128, ((2 * R + 127) // 128) * 128)
    P3 = max(128, ((3 * R + 127) // 128) * 128)
    n_evals = 4 * (T - 1)
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    full = lambda *_: (0, 0)

    def fwd_impl(plan, z_head, z_tail, packed, fa_w, dts, tmask=None):
        B = z_head.shape[0]
        kernel = _make_fwd_kernel(T, R, plan, tile_b, tail_w,
                                  mechanistic, has_aug, P, P2, P3,
                                  stats_mode=stats_mode)
        n_tiles = B // tile_b
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        inputs = [jnp.reshape(fa_w, (1, 1)).astype(jnp.float32),
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
        for w in packed:
            in_specs.append(pl.BlockSpec(w.shape, full,
                                         memory_space=pltpu.VMEM))
        inputs += list(packed)
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

    def bwd_impl(plan, z_tail, packed, fa_w, dts, traj, g_traj, g_rates,
                 g_fa, tmask=None, gstats=None):
        B = traj.shape[1]
        n_tiles = B // tile_bwd
        kernel = _make_bwd_kernel(T, R, plan, tile_bwd, tail_w,
                                  mechanistic, has_aug, P, P2, P3,
                                  stats_mode=stats_mode)
        packedT = tuple(jnp.transpose(w) for w in packed)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        inputs = [jnp.reshape(fa_w, (1, 1)).astype(jnp.float32),
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
        for w in packed + packedT:
            in_specs.append(pl.BlockSpec(w.shape, full,
                                         memory_space=pltpu.VMEM))
        in_specs += [hbm, hbm]
        inputs += list(packed) + list(packedT) + [traj, g_traj]
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
        for w in packed:
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
        gws = tuple(jnp.sum(o, axis=0) for o in outs[3:])
        return gz0, gztail, gws, gfa_w

    if stats_mode:
        @functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
        def traj_fn(plan, z_head, z_tail, packed, fa_w, dts, tmask):
            return fwd_impl(plan, z_head, z_tail, packed, fa_w, dts, tmask)

        def traj_fwd(plan, z_head, z_tail, packed, fa_w, dts, tmask):
            out = fwd_impl(plan, z_head, z_tail, packed, fa_w, dts, tmask)
            return out, (z_tail, packed, fa_w, dts, tmask, out[0])

        def traj_bwd(plan, res, g):
            z_tail, packed, fa_w, dts, tmask, traj = res
            g_traj, g_r1, g_r2, g_f2 = g
            zer = jnp.zeros((), jnp.float32)
            gs = [zer] * 5
            if g_r1 is not None:
                gs[0], gs[1] = g_r1[0], g_r1[1]
                gs[2], gs[3] = g_r2[0], g_r2[1]
            if g_f2 is not None:
                gs[4] = jnp.asarray(g_f2, jnp.float32)
            gstats = jnp.stack(gs)
            gz0, gztail, gws, gfa_w = bwd_impl(
                plan, z_tail, packed, fa_w, dts, traj, g_traj, None, None,
                tmask=tmask, gstats=gstats)
            if not tail_w:
                gztail = jnp.zeros_like(z_tail)
            return (gz0, gztail, gws, gfa_w, jnp.zeros_like(dts),
                    jnp.zeros_like(tmask))

        traj_fn.defvjp(traj_fwd, traj_bwd)
    else:
        @functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
        def traj_fn(plan, z_head, z_tail, packed, fa_w, dts):
            return fwd_impl(plan, z_head, z_tail, packed, fa_w, dts)

        def traj_fwd(plan, z_head, z_tail, packed, fa_w, dts):
            out = fwd_impl(plan, z_head, z_tail, packed, fa_w, dts)
            return out, (z_tail, packed, fa_w, dts, out[0])

        def traj_bwd(plan, res, g):
            z_tail, packed, fa_w, dts, traj = res
            g_traj, g_rates, g_fa = g
            gz0, gztail, gws, gfa_w = bwd_impl(plan, z_tail, packed, fa_w,
                                               dts, traj, g_traj, g_rates,
                                               g_fa)
            if not tail_w:
                gztail = jnp.zeros_like(z_tail)
            # no cotangent for the time grid (never optimized; see docstring)
            return gz0, gztail, gws, gfa_w, jnp.zeros_like(dts)

        traj_fn.defvjp(traj_fwd, traj_bwd)

    def entry(weights_flat, z_cm, fa_w, dts, tmask=None):
        """weights_flat: traceable CM-permuted flat list; z_cm: (B, L*R);
        dts: (T-1,) per-interval step sizes (traced)."""
        if n_fp_layers > 0 and n_aug_layers > 0:
            w0 = jnp.concatenate(
                [weights_flat[0], weights_flat[2 * n_fp_layers]], axis=1)
            b0 = jnp.concatenate(
                [weights_flat[1], weights_flat[2 * n_fp_layers + 1]],
                axis=1)
        else:
            w0, b0 = weights_flat[0], weights_flat[1]
        w0h = w0[: 3 * R]
        w0t = w0[3 * R:] if tail_w else jnp.zeros((1, w0.shape[1]),
                                                  jnp.float32)
        plan, arrs = _build_plan(tuple(weights_flat), n_fp_layers,
                                 n_aug_layers)
        packed = (w0h, w0t, b0) + tuple(arrs)

        B = z_cm.shape[0]
        z_head = z_cm[:, : 3 * R]
        z_tail = z_cm[:, 3 * R:] if tail_w else jnp.zeros((B, 1),
                                                          jnp.float32)
        if stats_mode:
            traj, r1, r2, f2 = traj_fn(plan, z_head, z_tail, packed,
                                       jnp.asarray(fa_w, jnp.float32),
                                       jnp.asarray(dts, jnp.float32),
                                       jnp.asarray(tmask, jnp.float32))
            return traj[..., : 3 * R], r1, r2, f2
        traj, rates, fa = traj_fn(plan, z_head, z_tail, packed,
                                  jnp.asarray(fa_w, jnp.float32),
                                  jnp.asarray(dts, jnp.float32))
        return traj[..., : 3 * R], \
            (rates[..., : 2 * R] if rates is not None else None), \
            (fa[..., : 3 * R] if fa is not None else None)

    return entry


#: Public alias of the in-kernel sufficient-statistic shift (the loss needs
#: it to un-shift the first moment: post_mean = RATE_SHIFT + r1/count).
RATE_SHIFT = _RATE_SHIFT


def fused_train_trajectory(weights_flat, z_cm, fa_w, dts, *, T, R, L,
                           n_fp_layers, n_aug_layers, tile_b=1024,
                           tile_bwd=256, stats_mode: bool = False,
                           tmask=None,
                           interpret: Optional[bool] = None):
    """Differentiable fused RK4(3/8) trajectory (training path).

    Args:
      weights_flat: CM-permuted flat weight list from
        :func:`cm_permute_traceable` (traced; cotangents flow back through
        the permutation onto the original params).
      z_cm: (B, L*R) compartment-major initial states (see
        ``pallas_ude.to_cm``); the latent tail (dims >= 3) is carried as a
        constant (zero derivative, reference ``lib/models.py:144``) with a
        correct cotangent.
      fa_w: runtime UDE ramp scalar (differentiable).

    Returns ``(traj_head (T, B, 3R), rates (4(T-1), B, 2R) | None,
    fa (4(T-1), B, 3R) | None)`` in compartment-major layout — use
    :func:`traj_to_model_layout` / :func:`aux_to_model_layout` to recover
    the ``odeint_grid`` contract.

    With ``stats_mode=True`` the aux tensors are never materialized:
    ``tmask`` is the (T-1,) per-interval loss weight (all-ones when
    ``None``) and the return is ``(traj_head, r1 (2,), r2 (2,), f2)`` —
    the masked RATE_SHIFT-shifted rate sums / sums-of-squares and the
    masked ``sum(fa**2)`` the loss epilogue needs (each ``None`` when the
    family lacks that head).  Gradients flow through the statistics.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
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
    entry = _get_train_traj(int(T), int(R), int(L),
                            int(n_fp_layers), int(n_aug_layers), int(tile),
                            int(tbwd), bool(interpret), bool(stats_mode))
    if stats_mode:
        if tmask is None:
            tmask = jnp.ones((int(T) - 1,), jnp.float32)
        return entry(tuple(weights_flat), z_cm, fa_w, dts, tmask)
    return entry(tuple(weights_flat), z_cm, fa_w, dts)


def traj_to_model_layout(traj_head, z_cm, R: int, L: int):
    """(T, B, 3R) CM head + constant tail from z_cm -> (T, B, R, L)
    region-major (the ``odeint_grid`` trajectory layout)."""
    T, B = traj_head.shape[0], traj_head.shape[1]
    head = jnp.transpose(traj_head.reshape(T, B, 3, R), (0, 1, 3, 2))
    if L > 3:
        tail = z_cm[:, 3 * R:].reshape(B, L - 3, R)
        tail = jnp.transpose(tail, (0, 2, 1))
        tail = jnp.broadcast_to(tail[None], (T, B, R, L - 3))
        return jnp.concatenate([head, tail], axis=-1)
    return head


def aux_to_model_layout(rates_cm, fa_cm, T: int, R: int):
    """CM aux streams -> the ``odeint_grid`` aux pytree layout
    (rates (T-1, 4, B, R, 2); fa (T-1, 4, B, R, 3))."""
    aux = {}
    if rates_cm is not None:
        B = rates_cm.shape[1]
        r = rates_cm.reshape(T - 1, 4, B, 2, R)
        aux["rates"] = jnp.transpose(r, (0, 1, 2, 4, 3))
    if fa_cm is not None:
        B = fa_cm.shape[1]
        f = fa_cm.reshape(T - 1, 4, B, 3, R)
        aux["fa"] = jnp.transpose(f, (0, 1, 2, 4, 3))
    return aux
