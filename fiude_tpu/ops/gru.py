"""GRU / LSTM recurrence as MXU-friendly `lax.scan` programs.

Replaces ``torch.nn.GRU`` / ``torch.nn.LSTM`` used by every encoder in the
reference (``lib/models.py:69-72``, ``lib/Old/old_models.py``,
``tuning/tune_node.py:38``).  Gate conventions are bit-for-bit torch
(cuDNN layout):

GRU (``torch.nn.GRU``):
    r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
    z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh  (W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) * n + z * h
with ``w_ih = [W_ir; W_iz; W_in]`` stacked along the output dim (3H, I).

LSTM (``torch.nn.LSTM``): gates stacked [i, f, g, o].

TPU-first structure: the input projection ``x_t @ w_ih.T`` for *all*
timesteps is hoisted out of the scan as one large (T*B, I) x (I, 3H) matmul
that tiles onto the MXU; only the small recurrent matmul (B, H) x (H, 3H)
stays inside the scan.  Weights are stored transposed (I, 3H) so no
transposes appear in the hot loop.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class GRUParams(NamedTuple):
    """One GRU layer. ``w_ih``: (I, 3H) — torch's ``weight_ih_l0`` transposed."""
    w_ih: jnp.ndarray
    w_hh: jnp.ndarray  # (H, 3H)
    b_ih: jnp.ndarray  # (3H,)
    b_hh: jnp.ndarray  # (3H,)


class LSTMParams(NamedTuple):
    w_ih: jnp.ndarray  # (I, 4H)
    w_hh: jnp.ndarray  # (H, 4H)
    b_ih: jnp.ndarray  # (4H,)
    b_hh: jnp.ndarray  # (4H,)


def init_gru(key, input_size: int, hidden_size: int, dtype=jnp.float32) -> GRUParams:
    """torch default init: U(-1/sqrt(H), 1/sqrt(H)) for every tensor."""
    k = 1.0 / jnp.sqrt(jnp.asarray(hidden_size, jnp.float32))
    keys = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -k, k)
    return GRUParams(
        w_ih=u(keys[0], (input_size, 3 * hidden_size)),
        w_hh=u(keys[1], (hidden_size, 3 * hidden_size)),
        b_ih=u(keys[2], (3 * hidden_size,)),
        b_hh=u(keys[3], (3 * hidden_size,)),
    )


def init_lstm(key, input_size: int, hidden_size: int, dtype=jnp.float32) -> LSTMParams:
    k = 1.0 / jnp.sqrt(jnp.asarray(hidden_size, jnp.float32))
    keys = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -k, k)
    return LSTMParams(
        w_ih=u(keys[0], (input_size, 4 * hidden_size)),
        w_hh=u(keys[1], (hidden_size, 4 * hidden_size)),
        b_ih=u(keys[2], (4 * hidden_size,)),
        b_hh=u(keys[3], (4 * hidden_size,)),
    )


def gru_cell(params: GRUParams, h, x_proj):
    """One GRU step given the precomputed input projection ``x @ w_ih + b_ih``."""
    hidden = h.shape[-1]
    h_proj = h @ params.w_hh + params.b_hh
    xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
    hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def gru(
    params: GRUParams,
    x: jnp.ndarray,
    h0: Optional[jnp.ndarray] = None,
    *,
    reverse: bool = False,
    unroll: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run a GRU over ``x`` of shape (B, T, I) -> (outputs (B, T, H), h_T).

    ``reverse=True`` sweeps the sequence right-to-left and returns outputs
    aligned to the original time order (torch ``bidirectional`` convention).
    """
    batch, seq, _ = x.shape
    hidden = params.w_hh.shape[0]
    if h0 is None:
        h0 = jnp.zeros((batch, hidden), x.dtype)

    # Hoisted input projection: one big MXU matmul over all timesteps.
    x_proj = x.reshape(batch * seq, -1) @ params.w_ih + params.b_ih
    x_proj = x_proj.reshape(batch, seq, 3 * hidden).transpose(1, 0, 2)  # (T,B,3H)

    def step(h, xp):
        h_new = gru_cell(params, h, xp)
        return h_new, h_new

    h_t, outs = jax.lax.scan(step, h0, x_proj, reverse=reverse, unroll=unroll)
    return outs.transpose(1, 0, 2), h_t


def gru_stack_last(params_list, x: jnp.ndarray, *, unroll: int = 1):
    """Stacked GRU sweep returning the LAST layer's FINAL hidden state.

    All layers advance inside one `lax.scan` step (layer l at time t needs
    only layer l-1 at t and layer l at t-1), halving scan dispatch count vs
    running layer-by-layer; only layer 0's input projection is hoisted to a
    bulk MXU matmul.  The Back-GRU encoder reads exactly this value
    (reference lib/models.py:91-94: last timestep of the last layer), so no
    per-step outputs are materialized at all.
    """
    batch, seq, _ = x.shape
    p0 = params_list[0]
    h0s = tuple(jnp.zeros((batch, p.w_hh.shape[0]), x.dtype)
                for p in params_list)

    x_proj = x.reshape(batch * seq, -1) @ p0.w_ih + p0.b_ih
    x_proj = x_proj.reshape(batch, seq, -1).transpose(1, 0, 2)

    def step(hs, xp0):
        new_hs = [gru_cell(p0, hs[0], xp0)]
        for l, p in enumerate(params_list[1:], start=1):
            xp = new_hs[-1] @ p.w_ih + p.b_ih
            new_hs.append(gru_cell(p, hs[l], xp))
        return tuple(new_hs), None

    hs, _ = jax.lax.scan(step, h0s, x_proj, unroll=unroll)
    return hs[-1]


def bigru(fwd: GRUParams, bwd: GRUParams, x, unroll: int = 1):
    """Bidirectional GRU: concat of forward and backward outputs (B, T, 2H)."""
    out_f, h_f = gru(fwd, x, unroll=unroll)
    out_b, h_b = gru(bwd, x, reverse=True, unroll=unroll)
    return jnp.concatenate([out_f, out_b], axis=-1), (h_f, h_b)


def lstm_cell(params: LSTMParams, carry, x_proj):
    h, c = carry
    h_proj = h @ params.w_hh + params.b_hh
    gates = x_proj + h_proj
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return (h_new, c_new)


def lstm(
    params: LSTMParams,
    x: jnp.ndarray,
    carry0=None,
    *,
    reverse: bool = False,
    unroll: int = 1,
):
    """LSTM over (B, T, I) -> (outputs (B, T, H), (h_T, c_T))."""
    batch, seq, _ = x.shape
    hidden = params.w_hh.shape[0]
    if carry0 is None:
        carry0 = (jnp.zeros((batch, hidden), x.dtype),
                  jnp.zeros((batch, hidden), x.dtype))

    x_proj = x.reshape(batch * seq, -1) @ params.w_ih + params.b_ih
    x_proj = x_proj.reshape(batch, seq, 4 * hidden).transpose(1, 0, 2)

    def step(carry, xp):
        carry = lstm_cell(params, carry, xp)
        return carry, carry[0]

    carry_t, outs = jax.lax.scan(step, carry0, x_proj, reverse=reverse, unroll=unroll)
    return outs.transpose(1, 0, 2), carry_t


def bilstm(fwd: LSTMParams, bwd: LSTMParams, x, unroll: int = 1):
    out_f, cf = lstm(fwd, x, unroll=unroll)
    out_b, cb = lstm(bwd, x, reverse=True, unroll=unroll)
    return jnp.concatenate([out_f, out_b], axis=-1), (cf, cb)


def gru_params_from_torch(weight_ih, weight_hh, bias_ih, bias_hh) -> GRUParams:
    """Build GRUParams from torch ``GRU`` tensors (numpy arrays)."""
    return GRUParams(
        w_ih=jnp.asarray(weight_ih).T,
        w_hh=jnp.asarray(weight_hh).T,
        b_ih=jnp.asarray(bias_ih),
        b_hh=jnp.asarray(bias_hh),
    )


def lstm_params_from_torch(weight_ih, weight_hh, bias_ih, bias_hh) -> LSTMParams:
    return LSTMParams(
        w_ih=jnp.asarray(weight_ih).T,
        w_hh=jnp.asarray(weight_hh).T,
        b_ih=jnp.asarray(bias_ih),
        b_hh=jnp.asarray(bias_hh),
    )
