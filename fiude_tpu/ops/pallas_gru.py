"""Fused Back-GRU encoder as a single Pallas TPU kernel (serving path).

The encoder forward (reference ``lib/models.py:69-104``: flip, stacked GRU
sweep, FF head) is scan-dispatch-bound as XLA ops: 42 sequential steps of
(32, 256)-sized matmuls measured ~3.7 ms — comparable to the whole fused
trajectory solve.  This kernel runs the entire encoder in ONE launch:

* layer 0's input projection for all timesteps is one large MXU matmul
  inside the kernel (time-major (T*B, I) layout so each step reads a
  contiguous (B, 3H) row block);
* the recurrence runs as a ``fori_loop`` with every weight VMEM-resident;
* the FF head (reference ordering: activation between hidden layers only)
  finishes in the same launch.

Lane alignment: every feature dim is zero-padded to a multiple of 128
host-side.  Gate blocks are padded *per gate* (layout ``[r | z | n]`` with
each block ``Hp = ceil128(H)`` wide) so the in-kernel gate slicing stays on
lane boundaries.  Padded hidden lanes stay exactly zero through the
recurrence: ``h'_pad = (1-sigmoid(0)) * tanh(0) + sigmoid(0) * 0 = 0``.

Inference-only (no custom VJP); training uses ``ops.gru``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil128(n: int) -> int:
    return max(128, ((n + 127) // 128) * 128)


def _pad_gru_layer(p, in_pad: int):
    """(w_ih, w_hh, b_ih, b_hh) -> lane-padded arrays with per-gate blocks.

    Input ``w_ih`` (I, 3H) torch-gate-stacked [r|z|n]; output (in_pad, 3*Hp)
    with each gate occupying its own 128-aligned block.
    """
    I, H3 = p.w_ih.shape
    H = H3 // 3
    Hp = _ceil128(H)
    w_ih = np.zeros((in_pad, 3 * Hp), np.float32)
    w_hh = np.zeros((Hp, 3 * Hp), np.float32)
    b_ih = np.zeros((1, 3 * Hp), np.float32)
    b_hh = np.zeros((1, 3 * Hp), np.float32)
    for g in range(3):
        w_ih[:I, g * Hp: g * Hp + H] = np.asarray(p.w_ih[:, g * H:(g + 1) * H])
        w_hh[:H, g * Hp: g * Hp + H] = np.asarray(p.w_hh[:, g * H:(g + 1) * H])
        b_ih[0, g * Hp: g * Hp + H] = np.asarray(p.b_ih[g * H:(g + 1) * H])
        b_hh[0, g * Hp: g * Hp + H] = np.asarray(p.b_hh[g * H:(g + 1) * H])
    return (jnp.asarray(w_ih), jnp.asarray(w_hh),
            jnp.asarray(b_ih), jnp.asarray(b_hh)), Hp


def _pad_dense(w, b, in_pad: int, out_pad: int):
    wp = np.zeros((in_pad, out_pad), np.float32)
    bp = np.zeros((1, out_pad), np.float32)
    wa, ba = np.asarray(w, np.float32), np.asarray(b, np.float32)
    wp[: wa.shape[0], : wa.shape[1]] = wa
    bp[0, : ba.shape[0]] = ba
    return jnp.asarray(wp), jnp.asarray(bp)


def _make_kernel(T: int, B: int, n_layers: int, n_ff: int, Hps, B_pad: int):
    def kernel(*refs):
        x_ref = refs[0]
        gru_refs = refs[1: 1 + 4 * n_layers]
        ff_refs = refs[1 + 4 * n_layers: 1 + 4 * n_layers + 2 * n_ff]
        out_ref, xproj_ref = refs[-2], refs[-1]

        def dot(a, w):
            return jnp.dot(a, w[:], preferred_element_type=jnp.float32)

        # layer 0 input projection for ALL timesteps: one MXU pass, staged
        # through VMEM scratch (Mosaic can only dynamically slice a Ref)
        w_ih0, b_ih0 = gru_refs[0], gru_refs[2]
        xproj_ref[:] = dot(x_ref[:], w_ih0) + b_ih0[:]  # (T*B_pad, 3*Hp0)

        def gru_gates(gates_x, h, w_hh, b_hh, Hp):
            gh = jnp.dot(h, w_hh[:], preferred_element_type=jnp.float32) \
                + b_hh[:]
            r = jax.nn.sigmoid(gates_x[:, :Hp] + gh[:, :Hp])
            z = jax.nn.sigmoid(gates_x[:, Hp:2 * Hp] + gh[:, Hp:2 * Hp])
            n = jnp.tanh(gates_x[:, 2 * Hp:] + r * gh[:, 2 * Hp:])
            return (1.0 - z) * n + z * h

        def step(t, hs):
            xp0 = xproj_ref[pl.ds(t * B_pad, B_pad), :]
            new_hs = []
            h = gru_gates(xp0, hs[0], gru_refs[1], gru_refs[3], Hps[0])
            new_hs.append(h)
            for l in range(1, n_layers):
                w_ih, w_hh = gru_refs[4 * l], gru_refs[4 * l + 1]
                b_ih, b_hh = gru_refs[4 * l + 2], gru_refs[4 * l + 3]
                xp = dot(h, w_ih) + b_ih[:]
                h = gru_gates(xp, hs[l], w_hh, b_hh, Hps[l])
                new_hs.append(h)
            return tuple(new_hs)

        hs0 = tuple(jnp.zeros((B_pad, Hp), jnp.float32) for Hp in Hps)
        hs = jax.lax.fori_loop(0, T, step, hs0)

        # FF head, reference ordering (models/nn.py:mlp_apply): activation
        # between hidden layers only, final two layers back-to-back linear
        h = hs[-1]
        h = dot(h, ff_refs[0]) + ff_refs[1][:]
        for k in range(1, n_ff - 1):
            h = dot(jnp.maximum(h, 0.0), ff_refs[2 * k]) + ff_refs[2 * k + 1][:]
        if n_ff > 1:
            h = dot(h, ff_refs[2 * (n_ff - 1)]) + ff_refs[2 * n_ff - 1][:]
        out_ref[:] = h

    return kernel


@functools.partial(jax.jit, static_argnames=("T", "B", "n_layers", "n_ff",
                                             "Hps", "out_features", "B_pad",
                                             "interpret"))
def _fused_backgru(x_tm, arrs, *, T, B, n_layers, n_ff, Hps, out_features,
                   B_pad, interpret):
    out_pad = arrs[-2].shape[1]
    kernel = _make_kernel(T, B, n_layers, n_ff, Hps, B_pad)
    full = lambda *_: tuple(0 for _ in range(2))
    in_specs = [pl.BlockSpec(x_tm.shape, full, memory_space=pltpu.VMEM)]
    for a in arrs:
        in_specs.append(pl.BlockSpec(a.shape, full, memory_space=pltpu.VMEM))
    flops = 2 * T * B_pad * x_tm.shape[1] * arrs[0].shape[1]
    for a in arrs[4::2]:
        flops += 2 * T * B_pad * a.shape[0] * a.shape[1]
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
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_tm.size * 4 + sum(a.size for a in arrs) * 4,
            transcendentals=3 * T * B_pad * sum(Hps),
        ),
        interpret=interpret,
    )(x_tm, *arrs)
    return y[:B, :out_features]


class FusedBackGRUEncoder:
    """One-launch serving encoder for :class:`~fiude_tpu.models.encoders.
    BackGRUEncoder` (and the generic legacy stack): pad + pack weights once,
    then ``__call__(x) -> (mean, std)`` numerically matching the XLA path.

    VMEM budget: the hoisted (T*B, 3*Hp0) projection plus all weights must
    fit on-chip; construction raises when the estimate exceeds ``vmem_cap``
    (callers fall back to the `ops.gru` scan path).
    """

    def __init__(self, encoder, enc_params, *,
                 interpret: Optional[bool] = None,
                 vmem_cap: int = 13 * 1024 * 1024):
        self.encoder = encoder
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        self.interpret = interpret

        self.in_pad = _ceil128(encoder.input_size)
        arrs = []
        Hps = []
        in_pad = self.in_pad
        for p in enc_params.grus:
            (w_ih, w_hh, b_ih, b_hh), Hp = _pad_gru_layer(p, in_pad)
            arrs += [w_ih, w_hh, b_ih, b_hh]
            Hps.append(Hp)
            in_pad = Hp
        self.n_layers = len(enc_params.grus)
        self.Hps = tuple(Hps)

        self.out_features = encoder.out_features
        ff = enc_params.ff
        self.n_ff = len(ff)
        fin = Hps[-1]
        for i, layer in enumerate(ff):
            fout = (_ceil128(self.out_features) if i == len(ff) - 1
                    else _ceil128(layer.w.shape[1]))
            w, b = _pad_dense(layer.w, layer.b, fin, fout)
            arrs += [w, b]
            fin = fout
        self.arrs = tuple(arrs)
        self.weight_bytes = sum(int(np.prod(a.shape)) for a in arrs) * 4
        self.vmem_cap = vmem_cap

    def _check_vmem(self, T: int, B_pad: int):
        est = (self.weight_bytes
               + T * B_pad * (self.in_pad + 3 * self.Hps[0]) * 4
               + B_pad * _ceil128(self.out_features) * 4)
        if est > self.vmem_cap:
            raise ValueError(
                f"fused encoder VMEM estimate {est/2**20:.1f} MiB exceeds "
                f"cap {self.vmem_cap/2**20:.1f} MiB (T={T}, B={B_pad}); use "
                "the ops.gru scan path")

    def __call__(self, x: jnp.ndarray):
        """x: (B, T, input_size) -> (mean, std) like ``encoder.apply``."""
        enc = self.encoder
        B, T, I = x.shape
        B_pad = max(8, ((B + 7) // 8) * 8)
        self._check_vmem(T, B_pad)
        # flip (reference lib/models.py:89) + time-major + pad lanes/rows
        x_tm = jnp.flip(x, axis=1).transpose(1, 0, 2)        # (T, B, I)
        x_tm = jnp.pad(x_tm, ((0, 0), (0, B_pad - B), (0, self.in_pad - I)))
        x_tm = x_tm.reshape(T * B_pad, self.in_pad).astype(jnp.float32)
        h = _fused_backgru(x_tm, self.arrs, T=T, B=B,
                           n_layers=self.n_layers, n_ff=self.n_ff,
                           Hps=self.Hps, out_features=self.out_features,
                           B_pad=B_pad, interpret=self.interpret)
        from fiude_tpu.models.encoders import (
            _split_mean_std, sir_scaler_vector,
        )
        scaler = sir_scaler_vector(enc.sir_scaler, enc.latent_dim, h.dtype)
        return _split_mean_std(h, enc.n_regions, enc.latent_dim, scaler,
                               enc.uncertainty)
