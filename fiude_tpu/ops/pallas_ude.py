"""Fused full-trajectory UDE solver as a single Pallas TPU kernel.

The serving-path hot loop — 85 RK4(3/8) steps x 4 RHS MLP evaluations x
decode — runs ONE kernel launch per forecast instead of ~680 XLA ops:
the ensemble state tile, both MLP weight sets and the decoder stay resident
in VMEM for the whole trajectory, eliminating every intermediate HBM
round-trip.  Measured ~9 ms as a `lax.scan` (latency-bound at ~26 us per
tiny-matmul RHS eval), vs ~1 ms speed-of-light for the same FLOPs.

Layout trick: the model's state is (batch, regions, latent) flattened
region-major (r*L + c).  SIR arithmetic (dS=-bSI, ...) on that layout needs
per-region strided gathers — hostile to the 8x128 VPU.  The kernel instead
uses a *compartment-major* layout (c*R + r): S, I, R occupy contiguous
column blocks [0:R], [R:2R], [2R:3R], so the mechanistic field is pure
block-slice arithmetic.  Weights are permuted host-side once
(:func:`cm_permute`) — the permuted network is mathematically identical.

Gradients are NOT defined for the fused kernel (inference/serving only);
training uses the `lax.scan` path in ``ops.integrate``.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Host-side weight permutation into compartment-major layout
# ---------------------------------------------------------------------------

def _cm_input_perm(R: int, L: int) -> np.ndarray:
    """perm[c*R + r] = r*L + c: gathers region-major features into CM order."""
    perm = np.empty(R * L, dtype=np.int64)
    for c in range(L):
        for r in range(R):
            perm[c * R + r] = r * L + c
    return perm


def cm_permute(params, R: int, L: int, *, has_aug: bool):
    """Permute UDE/SIRRates params into the kernel's compartment-major layout.

    Returns a flat list of 2-D float32 arrays:
    [fp_w0, fp_b0, ..., fp_wk, fp_bk] (+ aug list) — first-layer rows input-
    permuted; rate head output reordered to [beta(R) | gamma(R)]; aug head
    output to [c0(R) | c1(R) | c2(R)].
    """
    in_perm = _cm_input_perm(R, L)

    def permute_net(net, head: str):
        arrs = []
        for li, layer in enumerate(net):
            w = np.asarray(layer.w, np.float32)
            b = np.asarray(layer.b, np.float32)
            if li == 0:
                w = w[in_perm]
            if li == len(net) - 1:
                k = 2 if head == "rates" else 3
                out_perm = np.empty(k * R, dtype=np.int64)
                for kk in range(k):
                    for r in range(R):
                        out_perm[kk * R + r] = r * k + kk
                w = w[:, out_perm]
                b = b[out_perm]
            arrs.append(jnp.asarray(w))
            arrs.append(jnp.asarray(b.reshape(1, -1)))
        return arrs

    flat = permute_net(params.fp_net, "rates")
    if has_aug:
        flat += permute_net(params.aug_net, "aug")
    return flat


def cm_permute_decoder(dec_params, R: int):
    """Decoder reads latent[..., :3] flattened region-major (r*3 + c);
    permute its input rows to CM ([S(R) | I(R) | Rcomp(R)])."""
    w = np.asarray(dec_params.out.w, np.float32)   # (3R, R_out)
    b = np.asarray(dec_params.out.b, np.float32)
    perm = np.empty(3 * R, dtype=np.int64)
    for c in range(3):
        for r in range(R):
            perm[c * R + r] = r * 3 + c
    return jnp.asarray(w[perm]), jnp.asarray(b.reshape(1, -1))


def to_cm(z: jnp.ndarray) -> jnp.ndarray:
    """(B, R, L) region-major state -> (B, L*R) compartment-major."""
    B, R, L = z.shape
    return jnp.transpose(z, (0, 2, 1)).reshape(B, L * R)


def from_cm(z_cm: jnp.ndarray, R: int, L: int) -> jnp.ndarray:
    B = z_cm.shape[0]
    return jnp.transpose(z_cm.reshape(B, L, R), (0, 2, 1))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _elu(x):
    """ELU without expm1 (unsupported by the Mosaic TPU lowering)."""
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _mlp(z, weights, start: int, n_layers: int):
    """Reference MLP ordering (L0, (ELU, Li)*, L_out) on VMEM-resident
    weights; refs are (w, b) pairs flattened in ``weights``."""
    h = jnp.dot(z, weights[start][:], preferred_element_type=jnp.float32) \
        + weights[start + 1][:]
    for li in range(1, n_layers - 1):
        h = jnp.dot(_elu(h), weights[start + 2 * li][:],
                    preferred_element_type=jnp.float32) \
            + weights[start + 2 * li + 1][:]
    return jnp.dot(h, weights[start + 2 * (n_layers - 1)][:],
                   preferred_element_type=jnp.float32) \
        + weights[start + 2 * (n_layers - 1) + 1][:]


def _make_kernel(T: int, dt: float, R: int, L: int,
                 n_fp_layers: int, n_aug_layers: int, fa_w: float,
                 tile_b: int):
    has_aug = n_aug_layers > 0
    D = L * R

    def rhs(z, weights):
        rates = jnp.abs(_mlp(z, weights, 0, n_fp_layers))   # (tb, 2R) [b|g]
        beta, gam = rates[:, :R], rates[:, R:]
        S, I = z[:, :R], z[:, R: 2 * R]
        plus_i = beta * S * I
        minus_i = gam * I
        field = jnp.concatenate(
            [-plus_i, plus_i - minus_i, minus_i], axis=-1)   # (tb, 3R)
        if has_aug:
            fa = _mlp(z, weights, 2 * n_fp_layers, n_aug_layers)
            field = field + fa_w * fa
        dz = jnp.concatenate(
            [field, jnp.zeros((z.shape[0], D - 3 * R), z.dtype)], axis=-1)
        out_of_range = (z > 2.0) | (z < -1.0)
        return jnp.where(out_of_range, 0.0, dz)

    def kernel(*refs):
        z_ref = refs[0]
        weights = refs[1:-5]
        dec_w, dec_b, out_hbm = refs[-5], refs[-4], refs[-3]
        scratch, sem = refs[-2], refs[-1]
        tile0 = pl.program_id(0) * tile_b

        def decode_and_ship(ti, z):
            """Decode in VMEM, stream one (tile_b, R_out) step to HBM."""
            scratch[:] = jnp.dot(z[:, : 3 * R], dec_w[:],
                                 preferred_element_type=jnp.float32) + dec_b[:]
            dma = pltpu.make_async_copy(
                scratch, out_hbm.at[ti, pl.ds(tile0, tile_b), :], sem)
            dma.start()
            dma.wait()

        z = z_ref[:]
        decode_and_ship(0, z)

        def step(i, z):
            k1 = rhs(z, weights)
            k2 = rhs(z + dt * k1 * (1.0 / 3.0), weights)
            k3 = rhs(z + dt * (k2 - k1 * (1.0 / 3.0)), weights)
            k4 = rhs(z + dt * (k1 - k2 + k3), weights)
            z = z + dt * (k1 + 3.0 * (k2 + k3) + k4) * 0.125
            decode_and_ship(i + 1, z)
            return z

        jax.lax.fori_loop(0, T - 1, step, z)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("T", "dt", "R", "L", "n_fp_layers", "n_aug_layers",
                     "fa_w", "tile_b", "interpret"))
def fused_trajectory_decode(
    z0_cm: jnp.ndarray,
    weights: Tuple[jnp.ndarray, ...],
    dec_w: jnp.ndarray,
    dec_b: jnp.ndarray,
    *,
    T: int,
    dt: float,
    R: int,
    L: int,
    n_fp_layers: int,
    n_aug_layers: int,
    fa_w: float = 1.0,
    tile_b: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the full RK4(3/8) trajectory + decode in one Pallas kernel.

    z0_cm: (B, L*R) compartment-major initial states; returns (T, B, R_out).
    """
    B, D = z0_cm.shape
    R_out = dec_w.shape[1]
    tile_b = min(tile_b, B)
    assert B % tile_b == 0, f"batch {B} not divisible by tile {tile_b}"

    # Lane-align the decoded output: per-step DMA slices must be multiples of
    # the 128-lane tiling, so the kernel writes (T, B, R_pad) and the caller
    # drops the zero columns.
    R_pad = max(128, ((R_out + 127) // 128) * 128)
    if R_pad != R_out:
        dec_w = jnp.pad(dec_w, ((0, 0), (0, R_pad - R_out)))
        dec_b = jnp.pad(dec_b, ((0, 0), (0, R_pad - R_out)))

    kernel = _make_kernel(T, dt, R, L, n_fp_layers, n_aug_layers, fa_w,
                          tile_b)

    full = lambda *_: (0, 0)
    in_specs = [pl.BlockSpec((tile_b, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for wgt in weights:
        in_specs.append(pl.BlockSpec(wgt.shape, full, memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(dec_w.shape, full, memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(dec_b.shape, full, memory_space=pltpu.VMEM))

    flops_per_eval = 0
    for k in range(0, 2 * (n_fp_layers + n_aug_layers), 2):
        w = weights[k]
        flops_per_eval += 2 * tile_b * w.shape[0] * w.shape[1]

    hbm_space = getattr(pltpu, "HBM", getattr(pltpu, "ANY", None))
    y = pl.pallas_call(
        kernel,
        grid=(B // tile_b,),
        in_specs=in_specs,
        # the (T, B, R_pad) trajectory stays in HBM; each decoded step
        # streams out via per-step DMA, so VMEM only ever holds one
        # (tile_b, R_pad) slab
        out_specs=pl.BlockSpec(memory_space=hbm_space),
        out_shape=jax.ShapeDtypeStruct((T, B, R_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_b, R_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * (T - 1) * flops_per_eval * (B // tile_b),
            bytes_accessed=B * D * 4 + T * B * R_pad * 4,
            transcendentals=4 * (T - 1) * B * 64,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(z0_cm, *weights, dec_w, dec_b)
    return y[..., :R_out]


# ---------------------------------------------------------------------------
# Model-level wrapper
# ---------------------------------------------------------------------------

class FusedForecaster:
    """Serving-path forecaster: encoder/reparam in XLA + fused Pallas solve.

    Produces the same (B, S, T, R) Monte-Carlo forecast as
    ``UDEForecaster.apply`` (modulo float reassociation) with the entire ODE
    trajectory fused into one kernel.  Build once per (model, params):
    weight permutation happens at construction.
    """

    def __init__(self, model, params, *, fa_w: float = 1.0,
                 tile_b: int = 256, interpret: Optional[bool] = None):
        from fiude_tpu.models.rhs import SIRRates, UDE
        if not isinstance(model.ode, (SIRRates, UDE)):
            raise TypeError("fused path supports SIRRates/UDE RHS only")
        self.model = model
        self.params = params
        self.fa_w = float(fa_w)
        self.tile_b = tile_b
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        self.interpret = interpret
        has_aug = isinstance(model.ode, UDE)
        self.weights = tuple(cm_permute(params.ode, model.n_regions,
                                        model.latent_dim, has_aug=has_aug))
        self.dec_w, self.dec_b = cm_permute_decoder(params.dec,
                                                    model.n_regions)
        self.n_fp_layers = len(params.ode.fp_net)
        self.n_aug_layers = len(params.ode.aug_net) if has_aug else 0

    def __call__(self, x, t, eps):
        from fiude_tpu.models.vae import reparam
        model = self.model
        t = np.asarray(t)
        dt = float(t[1] - t[0])
        n_samples, batch = eps.shape[0], eps.shape[1]

        mean, std = model.encoder.apply(self.params.enc, x)
        z = reparam(eps, std, mean) + jnp.asarray(model.ic_jitter, jnp.float32)
        z_cm = to_cm(z)
        B = z_cm.shape[0]
        tile = self.tile_b
        while B % tile != 0:
            tile //= 2
        y = fused_trajectory_decode(
            z_cm, self.weights, self.dec_w, self.dec_b,
            T=len(t), dt=dt, R=model.n_regions, L=model.latent_dim,
            n_fp_layers=self.n_fp_layers, n_aug_layers=self.n_aug_layers,
            fa_w=self.fa_w, tile_b=tile, interpret=self.interpret)
        T = y.shape[0]
        y = y.reshape(T, n_samples, batch, model.n_regions)
        return jnp.transpose(y, (2, 1, 0, 3))
