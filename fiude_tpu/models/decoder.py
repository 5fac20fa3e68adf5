"""Linear decoder: latent SIR block -> per-region ILI readout.

Parity with reference ``lib/models.py:26-51``: reads only the first
``latent_dim`` (=3 when the RHS is SIR-structured) dims, flattens regions x
latent into one linear map of shape (n_regions*3 -> n_regions*input_dim),
weights initialized N(0, 0.1^2) with zero bias (``lib/utils.py:69-73``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from fiude_tpu.models.nn import Dense, init_dense_normal


@dataclasses.dataclass(frozen=True)
class LinearDecoder:
    n_regions: int
    latent_dim: int = 3
    input_dim: int = 1
    sir_only: bool = True  # reference ``Fp=True`` forces latent_dim = 3
    dtype: str = "float32"

    @property
    def read_dims(self) -> int:
        return 3 if self.sir_only else self.latent_dim

    def init(self, key) -> "LinearDecoderParams":
        return LinearDecoderParams(
            out=init_dense_normal(key, self.n_regions * self.read_dims,
                                  self.n_regions * self.input_dim,
                                  std=0.1, dtype=jnp.dtype(self.dtype)))

    def apply(self, params: "LinearDecoderParams", data: jnp.ndarray):
        """data: (..., n_regions, >=read_dims) -> (..., n_regions*input_dim)."""
        data = data[..., : self.read_dims]
        lead = data.shape[:-2]
        flat = data.reshape(lead + (self.n_regions * self.read_dims,))
        return flat @ params.out.w + params.out.b


class LinearDecoderParams(NamedTuple):
    out: Dense
