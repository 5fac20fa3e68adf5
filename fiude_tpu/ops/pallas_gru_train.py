"""Fused Back-GRU encoder for TRAINING: forward + hand-written BPTT as one
``jax.custom_vjp`` pair of Pallas TPU kernels.

The encoder is the dominant cost of the weekly-grid training step once the
trajectory solve is fused (measured 7.4 ms fwd+bwd through the XLA scan on
one v5e chip vs 6.2 ms for the whole rest of the step): backprop through 42
sequential GRU steps of (32, 256)-sized matmuls is pure dispatch overhead.
Reference workload: ``lib/models.py:69-104`` (flip, stacked GRU sweep, FF
head) inside ``loss.backward()`` (``lib/VAE.py:204``).

Design (mirrors :mod:`ops.pallas_train`):

* **forward** — the serving kernel (:func:`pallas_gru._make_kernel`)
  unchanged: one launch, all weights VMEM-resident.
* **backward** — ONE launch that (a) re-runs the forward sweep storing every
  layer's hidden-state sequence in VMEM scratch (recompute-not-store: gate
  values are re-derived per step in the reverse sweep), (b) backpropagates
  the FF head, then (c) sweeps t = T-1..0 carrying per-layer hidden-state
  cotangents, accumulating every weight/bias cotangent in VMEM output
  blocks.  Weight-gradient matmuls contract the batch dimension via
  ``dot_general`` so no transposed weight copies are materialized.
* The lane padding/packing into per-gate 128-aligned blocks is done with
  traceable jnp ops, so XLA autodiff maps packed-weight cotangents back
  onto the original ``GRUParams``/``Dense`` pytrees for free.

The input ``x`` is training DATA — its cotangent is not computed (the
backward returns zeros for it).  Do not differentiate through this module
with respect to ``x``.

Gradient parity vs ``jax.grad`` of ``BackGRUEncoder.apply`` (every weight
and bias cotangent) is pinned by ``tests/test_pallas_gru_train.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fiude_tpu.ops.pallas_gru import _ceil128, _make_kernel


# ---------------------------------------------------------------------------
# Traceable lane padding (differentiable packing)
# ---------------------------------------------------------------------------

def _pad_gru_layer_traceable(p, in_pad: int):
    """Lane-pad one GRUParams into per-gate 128-aligned blocks with jnp ops
    (differentiable version of ``pallas_gru._pad_gru_layer``)."""
    I, H3 = p.w_ih.shape
    H = H3 // 3
    Hp = _ceil128(H)
    f32 = jnp.float32
    w_ih = jnp.zeros((in_pad, 3 * Hp), f32)
    w_hh = jnp.zeros((Hp, 3 * Hp), f32)
    b_ih = jnp.zeros((1, 3 * Hp), f32)
    b_hh = jnp.zeros((1, 3 * Hp), f32)
    for g in range(3):
        sl = slice(g * H, (g + 1) * H)
        w_ih = w_ih.at[:I, g * Hp: g * Hp + H].set(p.w_ih[:, sl].astype(f32))
        w_hh = w_hh.at[:H, g * Hp: g * Hp + H].set(p.w_hh[:, sl].astype(f32))
        b_ih = b_ih.at[0, g * Hp: g * Hp + H].set(p.b_ih[sl].astype(f32))
        b_hh = b_hh.at[0, g * Hp: g * Hp + H].set(p.b_hh[sl].astype(f32))
    return (w_ih, w_hh, b_ih, b_hh), Hp


def _pad_dense_traceable(layer, in_pad: int, out_pad: int):
    w = layer.w.astype(jnp.float32)
    b = layer.b.astype(jnp.float32)
    wp = jnp.zeros((in_pad, out_pad), jnp.float32)
    wp = wp.at[: w.shape[0], : w.shape[1]].set(w)
    bp = jnp.zeros((1, out_pad), jnp.float32)
    bp = bp.at[0, : b.shape[0]].set(b)
    return wp, bp


def pack_encoder_traceable(encoder, enc_params):
    """Differentiable padding of BackGRU encoder params into the flat array
    tuple both kernels consume.  Returns (arrs, Hps, in_pad, out_pad)."""
    in_pad = _ceil128(encoder.input_size)
    arrs = []
    Hps = []
    ip = in_pad
    for p in enc_params.grus:
        (w_ih, w_hh, b_ih, b_hh), Hp = _pad_gru_layer_traceable(p, ip)
        arrs += [w_ih, w_hh, b_ih, b_hh]
        Hps.append(Hp)
        ip = Hp
    fin = Hps[-1]
    out_pad = None
    ff = enc_params.ff
    for i, layer in enumerate(ff):
        fout = (_ceil128(encoder.out_features) if i == len(ff) - 1
                else _ceil128(layer.w.shape[1]))
        w, b = _pad_dense_traceable(layer, fin, fout)
        arrs += [w, b]
        fin = fout
        out_pad = fout
    return tuple(arrs), tuple(Hps), in_pad, out_pad


def fits_vmem(encoder, *, batch: int, seq_len: int,
              cap_bytes: int = 13 * 2 ** 20) -> bool:
    """Whether the BACKWARD kernel's VMEM working set fits on one core.

    The reverse sweep holds the input, both weight copies (values +
    cotangent accumulators), the head cotangent, and every layer's full
    hidden-state stash ((T+1) x B_pad x Hp scratch) resident; Mosaic's
    scoped-VMEM stack is ~16 MiB, so callers fall back to the XLA scan
    above this estimate (same guard idea as the serving kernel's
    ``vmem_cap`` in ops/pallas_gru.py)."""
    B_pad = max(8, ((batch + 7) // 8) * 8)
    T = seq_len
    in_pad = _ceil128(encoder.input_size)
    Hps = [_ceil128(h) for h in encoder.q_sizes]

    floats = T * B_pad * in_pad                            # x stash
    weights = 0
    ip = in_pad
    for Hp in Hps:
        weights += ip * 3 * Hp + Hp * 3 * Hp + 2 * 3 * Hp
        ip = Hp
    fin = Hps[-1]
    ff_outs = [_ceil128(s) for s in encoder.ff_sizes] \
        + [_ceil128(encoder.out_features)]
    for fout in ff_outs:
        weights += fin * fout + fout
        fin = fout
    floats += 2 * weights                                  # arrs + gouts
    floats += B_pad * ff_outs[-1]                          # g_pad
    floats += sum((T + 1) * B_pad * Hp for Hp in Hps)      # state scratch
    floats += 12 * B_pad * max(Hps)                        # live gate temps
    return floats * 4 <= cap_bytes


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _make_bwd_kernel(T, B_pad, n_layers, n_ff, Hps):
    n_gru_arr = 4 * n_layers
    n_arr = n_gru_arr + 2 * n_ff

    def kernel(*refs):
        x_ref = refs[0]
        arrs = refs[1: 1 + n_arr]
        g_ref = refs[1 + n_arr]
        gouts = refs[2 + n_arr: 2 + 2 * n_arr]
        states = refs[2 + 2 * n_arr:]          # per-layer ((T+1)*B_pad, Hp)

        gru_w = arrs[:n_gru_arr]
        ff_w = arrs[n_gru_arr:]
        g_gru = gouts[:n_gru_arr]
        g_ff = gouts[n_gru_arr:]

        def dot(a, w):
            return jnp.dot(a, w, preferred_element_type=jnp.float32)

        def dotT(a, b):
            """a^T @ b (contract the batch/row dim)."""
            return jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def dotBT(a, w):
            """a @ w^T (contract the last dim of both)."""
            return jax.lax.dot_general(
                a, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        for ref in gouts:
            ref[...] = jnp.zeros(ref.shape, jnp.float32)

        def rows(ref, t):
            return ref[pl.ds(t * B_pad, B_pad), :]

        def gates(l, h_in, prev):
            w_ih, w_hh = gru_w[4 * l][:], gru_w[4 * l + 1][:]
            b_ih, b_hh = gru_w[4 * l + 2][:], gru_w[4 * l + 3][:]
            Hp = Hps[l]
            gx = dot(h_in, w_ih) + b_ih
            gh = dot(prev, w_hh) + b_hh
            r = jax.nn.sigmoid(gx[:, :Hp] + gh[:, :Hp])
            z = jax.nn.sigmoid(gx[:, Hp: 2 * Hp] + gh[:, Hp: 2 * Hp])
            ghn = gh[:, 2 * Hp:]
            n = jnp.tanh(gx[:, 2 * Hp:] + r * ghn)
            return r, z, n, ghn

        # ---- forward sweep, storing every layer's state sequence ----
        for l in range(n_layers):
            states[l][pl.ds(0, B_pad), :] = jnp.zeros((B_pad, Hps[l]),
                                                      jnp.float32)

        def fstep(t, _):
            h_in = rows(x_ref, t)
            for l in range(n_layers):
                prev = rows(states[l], t)
                r, z, n, _ = gates(l, h_in, prev)
                h = (1.0 - z) * n + z * prev
                states[l][pl.ds((t + 1) * B_pad, B_pad), :] = h
                h_in = h
            return 0

        jax.lax.fori_loop(0, T, fstep, 0)

        # ---- FF head: forward (keep pre-activations) then backward ----
        h_last = rows(states[n_layers - 1], T)
        pres = []
        h = dot(h_last, ff_w[0][:]) + ff_w[1][:]
        pres.append(h)
        for k in range(1, n_ff - 1):
            h = dot(jnp.maximum(pres[-1], 0.0), ff_w[2 * k][:]) \
                + ff_w[2 * k + 1][:]
            pres.append(h)

        g = g_ref[:]
        if n_ff > 1:
            k = n_ff - 1
            g_ff[2 * k][...] += dotT(pres[-1], g)
            g_ff[2 * k + 1][...] += jnp.sum(g, axis=0, keepdims=True)
            g = dotBT(g, ff_w[2 * k][:])
        for k in range(n_ff - 2, 0, -1):
            a = jnp.maximum(pres[k - 1], 0.0)
            g_ff[2 * k][...] += dotT(a, g)
            g_ff[2 * k + 1][...] += jnp.sum(g, axis=0, keepdims=True)
            g = dotBT(g, ff_w[2 * k][:]) * (pres[k - 1] > 0)
        g_ff[0][...] += dotT(h_last, g)
        g_ff[1][...] += jnp.sum(g, axis=0, keepdims=True)
        gh_last = dotBT(g, ff_w[0][:])

        # ---- BPTT sweep t = T-1 .. 0 ----
        ghs0 = tuple(
            gh_last if l == n_layers - 1
            else jnp.zeros((B_pad, Hps[l]), jnp.float32)
            for l in range(n_layers))

        def bstep(j, ghs):
            t = T - 1 - j
            x_t = rows(x_ref, t)
            ghs = list(ghs)
            new_ghs = [None] * n_layers
            for l in range(n_layers - 1, -1, -1):
                Hp = Hps[l]
                prev = rows(states[l], t)
                h_in = x_t if l == 0 else rows(states[l - 1], t + 1)
                r, z, n, ghn = gates(l, h_in, prev)
                g = ghs[l]
                gz_pre = g * (prev - n) * z * (1.0 - z)
                gn_pre = g * (1.0 - z) * (1.0 - n * n)
                gr_pre = gn_pre * ghn * r * (1.0 - r)
                ggx = jnp.concatenate([gr_pre, gz_pre, gn_pre], axis=-1)
                ggh = jnp.concatenate([gr_pre, gz_pre, gn_pre * r], axis=-1)
                g_gru[4 * l][...] += dotT(h_in, ggx)
                g_gru[4 * l + 1][...] += dotT(prev, ggh)
                g_gru[4 * l + 2][...] += jnp.sum(ggx, axis=0, keepdims=True)
                g_gru[4 * l + 3][...] += jnp.sum(ggh, axis=0, keepdims=True)
                new_ghs[l] = g * z + dotBT(ggh, gru_w[4 * l + 1][:])
                if l > 0:
                    ghs[l - 1] = ghs[l - 1] + dotBT(ggx, gru_w[4 * l][:])
            return tuple(new_ghs)

        jax.lax.fori_loop(0, T, bstep, ghs0)

    return kernel


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _get_enc_train(T, B, B_pad, n_layers, n_ff, Hps, in_pad, out_pad,
                   out_features, interpret):
    full = lambda *_: (0, 0)

    def fwd_impl(x_tm, arrs):
        kernel = _make_kernel(T, B, n_layers, n_ff, Hps, B_pad)
        in_specs = [pl.BlockSpec(x_tm.shape, full, memory_space=pltpu.VMEM)]
        for a in arrs:
            in_specs.append(pl.BlockSpec(a.shape, full,
                                         memory_space=pltpu.VMEM))
        y = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((B_pad, out_pad), full,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B_pad, out_pad), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((x_tm.shape[0], arrs[0].shape[1]), jnp.float32),
            ],
            interpret=interpret,
        )(x_tm, *arrs)
        return y[:B, :out_features]

    def bwd_impl(x_tm, arrs, g):
        g_pad = jnp.zeros((B_pad, out_pad), jnp.float32)
        g_pad = g_pad.at[:B, :out_features].set(g.astype(jnp.float32))
        kernel = _make_bwd_kernel(T, B_pad, n_layers, n_ff, Hps)
        in_specs = [pl.BlockSpec(x_tm.shape, full, memory_space=pltpu.VMEM)]
        for a in arrs:
            in_specs.append(pl.BlockSpec(a.shape, full,
                                         memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((B_pad, out_pad), full,
                                     memory_space=pltpu.VMEM))
        out_shape = [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                     for a in arrs]
        out_specs = [pl.BlockSpec(a.shape, full, memory_space=pltpu.VMEM)
                     for a in arrs]
        scratch = [pltpu.VMEM(((T + 1) * B_pad, Hp), jnp.float32)
                   for Hp in Hps]
        outs = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(x_tm, *arrs, g_pad)
        return tuple(outs)

    @jax.custom_vjp
    def enc_fn(x_tm, arrs):
        return fwd_impl(x_tm, arrs)

    def enc_fwd(x_tm, arrs):
        return fwd_impl(x_tm, arrs), (x_tm, arrs)

    def enc_bwd(res, g):
        x_tm, arrs = res
        gws = bwd_impl(x_tm, arrs, g)
        # x is training data — no input cotangent (see module docstring)
        return jnp.zeros_like(x_tm), gws

    enc_fn.defvjp(enc_fwd, enc_bwd)
    return enc_fn


def fused_backgru_train_apply(encoder, enc_params, x,
                              interpret: Optional[bool] = None):
    """Differentiable fused Back-GRU encoder apply: drop-in for
    ``BackGRUEncoder.apply`` on the training path (same (mean, std)
    contract; weight cotangents flow through the traceable packing).

    Reference workload: ``lib/models.py:88-104`` under ``loss.backward()``.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, T, I = x.shape
    B_pad = max(8, ((B + 7) // 8) * 8)
    arrs, Hps, in_pad, out_pad = pack_encoder_traceable(encoder, enc_params)

    x_tm = jnp.flip(x, axis=1).transpose(1, 0, 2)
    x_tm = jnp.pad(x_tm, ((0, 0), (0, B_pad - B), (0, in_pad - I)))
    x_tm = x_tm.reshape(T * B_pad, in_pad).astype(jnp.float32)

    fn = _get_enc_train(int(T), int(B), int(B_pad),
                        len(enc_params.grus), len(enc_params.ff),
                        tuple(int(h) for h in Hps), int(in_pad),
                        int(out_pad), int(encoder.out_features),
                        bool(interpret))
    h = fn(x_tm, arrs)

    from fiude_tpu.models.encoders import _split_mean_std, sir_scaler_vector
    scaler = sir_scaler_vector(encoder.sir_scaler, encoder.latent_dim,
                               h.dtype)
    return _split_mean_std(h, encoder.n_regions, encoder.latent_dim, scaler,
                           encoder.uncertainty)
