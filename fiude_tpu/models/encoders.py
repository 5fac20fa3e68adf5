"""Variational sequence encoders: surveillance window -> latent IC distribution.

Four encoder families for capability parity with the reference:

* :class:`BackGRUEncoder` — time-reversed stacked GRU, the live encoder
  (reference ``lib/models.py:53-107``): flip the window, run stacked
  unidirectional GRUs, take the last hidden output, feed a ReLU-MLP head,
  split into (mean, std), ``std = |std| * SIR_scaler``.
* :class:`BiGRUEncoder` — split queries/ILI streams, bidirectional GRU stack
  on queries + unidirectional on ILI truncated 14 steps
  (reference ``lib/Old/old_models.py:372-435``).
* :class:`MISOGRUEncoder` — same topology as BiGRU variant (reference
  ``lib/Old/old_models.py:319-370``).
* :class:`BiLSTMEncoder` — bidirectional LSTM read at position -14
  (reference ``tuning/tune_node.py:25-61``).
* :class:`GenericEncoder` — the legacy generic CustomRNN+FFNetwork stack
  (reference ``lib/Old/old_models.py:9-39,144-186``): optional time
  reversal, stacked GRUs read at the last step, a *standard* ReLU MLP head
  (activation before the final projection, unlike the live encoder's
  two-consecutive-linear quirk).

All are (config dataclass, init fn, pure apply fn) triples.  The SIR scaler
is a non-trainable buffer derived from config (it multiplies the std head:
[0.1, 0.05, 1.0, 1.0, ...] per latent dim), so it lives in the config, not
the param pytree — keeping the optimizer away from it.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from fiude_tpu.models.nn import Dense, init_dense, relu_mlp, relu_mlp_standard
from fiude_tpu.ops.gru import (
    GRUParams,
    LSTMParams,
    bigru,
    bilstm,
    gru,
    init_gru,
    init_lstm,
    lstm,
)


def sir_scaler_vector(sir_scaler: Sequence[float], latent_dim: int,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Extend the per-dim std scaler to latent_dim by repeating the last entry
    (reference lib/models.py:63-67). Shape (1, latent_dim)."""
    s = list(sir_scaler)
    if latent_dim > len(s):
        s = s + [s[-1]] * (latent_dim - len(s))
    return jnp.asarray(s[:latent_dim], dtype).reshape(1, -1)


def _ff_sizes_chain(in_size: int, ff_sizes: Sequence[int], out_size: int):
    return [in_size] + list(ff_sizes) + [out_size]


def _init_ff(key, in_size, ff_sizes, out_size, dtype):
    sizes = _ff_sizes_chain(in_size, ff_sizes, out_size)
    keys = jax.random.split(key, len(sizes) - 1)
    return tuple(init_dense(k, sizes[i], sizes[i + 1], dtype)
                 for i, k in enumerate(keys))


def _split_mean_std(h, n_regions, latent_dim, scaler, uncertainty):
    """Split head output into (mean, std·scaler); reference lib/models.py:98-104."""
    if not uncertainty:
        return h.reshape(-1, n_regions, latent_dim), None
    mean, std = jnp.split(h, 2, axis=-1)
    mean = mean.reshape(-1, n_regions, latent_dim)
    std = std.reshape(-1, n_regions, latent_dim)
    std = jnp.abs(std) * scaler  # broadcast (1, L) over regions
    return mean, std


# ---------------------------------------------------------------------------
# Back-GRU (the live encoder)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BackGRUEncoder:
    """Config for the time-reversed stacked-GRU encoder."""
    n_regions: int
    n_qs: int = 9
    latent_dim: int = 6
    q_sizes: Tuple[int, ...] = (128, 64)
    ff_sizes: Tuple[int, ...] = (32,)
    sir_scaler: Tuple[float, ...] = (0.1, 0.05, 1.0)
    uncertainty: bool = True
    dtype: str = "float32"
    scan_unroll: int = 4  # GRU time-scan unroll (TPU pipelining knob)

    @property
    def input_size(self) -> int:
        return self.n_regions * (self.n_qs + 1)

    @property
    def out_features(self) -> int:
        mult = 2 if self.uncertainty else 1
        return mult * self.n_regions * self.latent_dim

    def init(self, key) -> "BackGRUEncoderParams":
        dtype = jnp.dtype(self.dtype)
        keys = jax.random.split(key, len(self.q_sizes) + 1)
        grus = []
        in_size = self.input_size
        for i, h in enumerate(self.q_sizes):
            grus.append(init_gru(keys[i], in_size, h, dtype))
            in_size = h
        ff = _init_ff(keys[-1], self.q_sizes[-1], self.ff_sizes,
                      self.out_features, dtype)
        return BackGRUEncoderParams(grus=tuple(grus), ff=ff)

    def apply(self, params: "BackGRUEncoderParams", x: jnp.ndarray):
        """x: (B, T, n_regions*(n_qs+1)) -> (mean, std) each (B, R, L)."""
        scaler = sir_scaler_vector(self.sir_scaler, self.latent_dim, x.dtype)
        x = jnp.flip(x, axis=1)  # reference lib/models.py:89
        # fused multi-layer scan; only the final hidden is needed
        from fiude_tpu.ops.gru import gru_stack_last
        h = gru_stack_last(params.grus, x, unroll=self.scan_unroll)
        h = relu_mlp(params.ff, h)
        return _split_mean_std(h, self.n_regions, self.latent_dim, scaler,
                               self.uncertainty)


class BackGRUEncoderParams(NamedTuple):
    grus: Tuple[GRUParams, ...]
    ff: Tuple[Dense, ...]


# ---------------------------------------------------------------------------
# Generic legacy encoder (CustomRNN + FFNetwork)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GenericEncoder:
    """Legacy generic encoder (reference ``lib/Old/old_models.py:9-39``):
    stacked GRUs over the (optionally time-reversed) window, last hidden
    step into a standard ReLU MLP head appended with a ``2*R*L`` projection
    (``:13``), split into (mean, |std|*SIR_scaler)."""
    rnn_input_size: int
    n_regions: int
    latent_dim: int = 6
    rnn_hidden_sizes: Tuple[int, ...] = (64,)
    ff_hidden_sizes: Tuple[int, ...] = (32,)
    sir_scaler: Tuple[float, ...] = (0.1, 0.05, 1.0)
    reverse: bool = True
    uncertainty: bool = True
    dtype: str = "float32"
    scan_unroll: int = 4

    @property
    def out_features(self) -> int:
        return 2 * self.n_regions * self.latent_dim

    def init(self, key) -> "GenericEncoderParams":
        dtype = jnp.dtype(self.dtype)
        keys = jax.random.split(key, len(self.rnn_hidden_sizes) + 1)
        grus = []
        in_size = self.rnn_input_size
        for i, h in enumerate(self.rnn_hidden_sizes):
            grus.append(init_gru(keys[i], in_size, h, dtype))
            in_size = h
        sizes = ([self.rnn_hidden_sizes[-1]] + list(self.ff_hidden_sizes)
                 + [self.out_features])
        ff = tuple(init_dense(jax.random.fold_in(keys[-1], i),
                              sizes[i], sizes[i + 1], dtype)
                   for i in range(len(sizes) - 1))
        return GenericEncoderParams(grus=tuple(grus), ff=ff)

    def apply(self, params: "GenericEncoderParams", x: jnp.ndarray):
        """x: (B, T, rnn_input_size) -> (mean, std) each (B, R, L)."""
        scaler = sir_scaler_vector(self.sir_scaler, self.latent_dim, x.dtype)
        if self.reverse:
            x = jnp.flip(x, axis=1)
        from fiude_tpu.ops.gru import gru_stack_last
        h = gru_stack_last(params.grus, x, unroll=self.scan_unroll)
        h = relu_mlp_standard(params.ff, h)
        return _split_mean_std(h, self.n_regions, self.latent_dim, scaler,
                               self.uncertainty)


class GenericEncoderParams(NamedTuple):
    grus: Tuple[GRUParams, ...]
    ff: Tuple[Dense, ...]


# ---------------------------------------------------------------------------
# BiGRU / MISO-GRU (two-stream variants)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BiGRUEncoder:
    """Two-stream encoder: bidirectional GRU stack on queries + unidirectional
    GRU stack on ILI (reference lib/Old/old_models.py:372-435).  The ILI
    stream drops the trailing ``ili_trunc`` (=14, the reporting lag) steps."""
    n_regions: int
    n_qs: int = 10
    latent_dim: int = 6
    q_sizes: Tuple[int, ...] = (128, 64)
    ili_sizes: Tuple[int, ...] = (32, 16)
    ff_sizes: Tuple[int, ...] = (64, 32)
    sir_scaler: Tuple[float, ...] = (0.1, 0.05, 1.0)
    ili_trunc: int = 14
    uncertainty: bool = True
    dtype: str = "float32"

    @property
    def out_features(self) -> int:
        mult = 2 if self.uncertainty else 1
        return mult * self.n_regions * self.latent_dim

    def init(self, key) -> "BiGRUEncoderParams":
        dtype = jnp.dtype(self.dtype)
        k_i, k_q, k_ff = jax.random.split(key, 3)

        i_layers = []
        in_size = self.n_regions
        for i, h in enumerate(self.ili_sizes):
            i_layers.append(init_gru(jax.random.fold_in(k_i, i), in_size, h, dtype))
            in_size = h

        q_layers = []
        in_size = self.n_regions * self.n_qs
        for i, h in enumerate(self.q_sizes):
            kf, kb = jax.random.split(jax.random.fold_in(k_q, i))
            q_layers.append((init_gru(kf, in_size, h, dtype),
                             init_gru(kb, in_size, h, dtype)))
            in_size = 2 * h

        ff = _init_ff(k_ff, 2 * self.q_sizes[-1] + self.ili_sizes[-1],
                      self.ff_sizes, self.out_features, dtype)
        return BiGRUEncoderParams(i_layers=tuple(i_layers),
                                  q_layers=tuple(q_layers), ff=ff)

    def apply(self, params: "BiGRUEncoderParams", x: jnp.ndarray):
        scaler = sir_scaler_vector(self.sir_scaler, self.latent_dim, x.dtype)
        x_qs = x[:, :, : -self.n_regions]
        x_ili = x[:, : -self.ili_trunc, -self.n_regions:]

        for g in params.i_layers:
            x_ili, _ = gru(g, x_ili)
        for fwd, bwd in params.q_layers:
            x_qs, _ = bigru(fwd, bwd, x_qs)

        h = jnp.concatenate([x_ili[:, -1, :], x_qs[:, -1, :]], axis=-1)
        h = relu_mlp(params.ff, h)
        return _split_mean_std(h, self.n_regions, self.latent_dim, scaler,
                               self.uncertainty)


class BiGRUEncoderParams(NamedTuple):
    i_layers: Tuple[GRUParams, ...]
    q_layers: Tuple[Tuple[GRUParams, GRUParams], ...]
    ff: Tuple[Dense, ...]


#: MISO-GRU has the same topology as the BiGRU encoder in the reference
#: (lib/Old/old_models.py:319-370 vs :372-435 differ only in name).
MISOGRUEncoder = BiGRUEncoder


# ---------------------------------------------------------------------------
# BiLSTM (tuning/tune_node.py variant)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BiLSTMEncoder:
    """Bidirectional LSTM encoder read at timestep -14
    (reference tuning/tune_node.py:25-61; single-region only there)."""
    input_size: int
    hidden_size: int
    num_layers: int = 1
    latent_dim: int = 6
    n_regions: int = 1
    sir_scaler: Tuple[float, ...] = (0.1, 0.05, 1.0)
    read_offset: int = -14
    uncertainty: bool = True
    dtype: str = "float32"

    def init(self, key) -> "BiLSTMEncoderParams":
        dtype = jnp.dtype(self.dtype)
        layers = []
        in_size = self.input_size
        for i in range(self.num_layers):
            kf, kb = jax.random.split(jax.random.fold_in(key, i))
            layers.append((init_lstm(kf, in_size, self.hidden_size, dtype),
                           init_lstm(kb, in_size, self.hidden_size, dtype)))
            in_size = 2 * self.hidden_size
        fc = init_dense(jax.random.fold_in(key, 1000),
                        2 * self.hidden_size, 2 * self.latent_dim, dtype)
        return BiLSTMEncoderParams(layers=tuple(layers), fc=fc)

    def apply(self, params: "BiLSTMEncoderParams", x: jnp.ndarray):
        scaler = sir_scaler_vector(self.sir_scaler, self.latent_dim, x.dtype)
        for fwd, bwd in params.layers:
            x, _ = bilstm(fwd, bwd, x)
        h = x[:, self.read_offset, :]
        h = h @ params.fc.w + params.fc.b
        mean, std = jnp.split(h, 2, axis=-1)
        mean = mean.reshape(-1, self.latent_dim)
        std = jnp.abs(std.reshape(-1, self.latent_dim)) * scaler
        # reference returns (B, 1, L) via unsqueeze(-2)
        return mean[:, None, :], std[:, None, :]


class BiLSTMEncoderParams(NamedTuple):
    layers: Tuple[Tuple[LSTMParams, LSTMParams], ...]
    fc: Dense
