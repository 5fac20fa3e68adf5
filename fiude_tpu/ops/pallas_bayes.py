"""Fused full-trajectory *Bayesian* UDE solver as a single Pallas TPU kernel.

Serving-path counterpart of :mod:`ops.pallas_ude` for the variational RHS
families (``Bayes_Fp``/CONNb and ``Bayes_FaFp``/UONNb — reference
``lib/in_development/models_bayes.py:69-128,185-265``).  The reference draws
fresh mean-field weight noise ``w = w_mean + z * |w_std|`` at *every* RHS
evaluation (``make_z`` per forward, ``models_bayes.py:30-48``); the XLA path
reproduces that by threading a per-(step, stage) PRNG key through the
integrator.  Here the whole trajectory — T x 4 RK4(3/8) stages, each with a
fresh weight draw — runs as ONE kernel launch:

* mean and |std| weight tensors (compartment-major, depth-packed exactly as
  the deterministic kernel) stay VMEM-resident;
* per evaluation, the on-core PRNG (``pltpu.prng_seed``/``prng_random_bits``)
  generates standard-normal noise via Box-Muller (``jnp.log``/``jnp.cos``
  lower fine on Mosaic) and the effective weights are materialized in VMEM —
  an O(weights) VPU cost, negligible next to the O(batch x weights) matmul;
* every batch-tile program seeds with the same scalar, so all tiles draw the
  SAME weight sequence — matching the reference, where one forward's noise is
  shared across the whole (folded MC x batch) ensemble.

The kernel cannot match the XLA path draw-for-draw (different PRNG), only in
distribution; correctness is pinned by (a) an injected-noise mode where the
caller supplies every evaluation's noise and a pure-JAX oracle recomputes the
trajectory exactly, and (b) zero-std equivalence with the deterministic fused
kernel.  The injected-noise mode holds the full (n_evals, ...) noise tensors
in VMEM, so it is for small test shapes only; serving uses the PRNG mode.

Unlike the deterministic kernel, the frozen latent tail's first-layer
contribution CANNOT be hoisted out of the loop (W0 is resampled per eval),
so the tail matmul runs per evaluation.
"""

from __future__ import annotations

import functools
from types import SimpleNamespace
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fiude_tpu.ops.pallas_ude import (
    _build_plan, _elu, cm_permute, cm_permute_aug_only, cm_permute_decoder,
    to_cm,
)


def bayes_cm_weights(params, R: int, L: int, *, has_aug: bool,
                     aug_only: bool = False):
    """Split Bayes variational params into (means, |stds|) flat CM-permuted
    weight lists, each shaped exactly like the deterministic kernel's
    ``cm_permute`` output.  Permuting mean and std by the same index maps
    preserves ``perm(mean + z*|std|) == perm(mean) + perm(z)*perm(|std|)``.
    ``aug_only`` handles the Fa/SONNb family (no mechanistic net)."""
    from fiude_tpu.models.nn import Dense

    def dense_net(net, take):
        return tuple(Dense(w=take(l)[0], b=take(l)[1]) for l in net)

    def wrap(take):
        ns = SimpleNamespace()
        if hasattr(params, "fp_net"):
            ns.fp_net = dense_net(params.fp_net, take)
        if aug_only or has_aug:
            ns.aug_net = dense_net(params.aug_net, take)
        return ns

    means = wrap(lambda l: (l.w_mean, l.b_mean))
    stds = wrap(lambda l: (jnp.abs(l.w_std), jnp.abs(l.b_std)))
    if aug_only:
        mean_flat = tuple(cm_permute_aug_only(means, R, L))
        std_flat = tuple(cm_permute_aug_only(stds, R, L))
    else:
        mean_flat = tuple(cm_permute(means, R, L, has_aug=has_aug))
        std_flat = tuple(cm_permute(stds, R, L, has_aug=has_aug))
    return mean_flat, std_flat


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

_TWO_PI = float(2.0 * np.pi)


def _kernel_normal(shape):
    """Standard-normal draw from the on-core PRNG via Box-Muller.

    The mantissa trick maps 23 random bits to [1, 2); ``1 - u`` gives (0, 1]
    so the log argument is never 0."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u1 = 2.0 - pltpu.bitcast((b1 >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    u2 = pltpu.bitcast((b2 >> 9) | jnp.uint32(0x3F800000), jnp.float32) - 1.0
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


def _make_bayes_kernel(T: int, dt: float, R: int, plan, fa_w: float,
                       tile_b: int, tail_w: int, n_noise: int,
                       compute_dtype=jnp.float32, mechanistic: bool = True):
    """n_noise = 0 -> on-core PRNG mode (seed scalar input);
    n_noise > 0 -> injected-noise mode (one (n_evals, in, out) ref per
    weight array, in materialization order)."""
    cd = compute_dtype
    n_plan = len(plan)

    def dot(a, w):
        return jnp.dot(a.astype(cd), w.astype(cd),
                       preferred_element_type=jnp.float32)

    def kernel(*refs):
        i = 0
        if n_noise == 0:
            seed_ref = refs[i]; i += 1
        z_ref, ztail_ref = refs[i], refs[i + 1]; i += 2
        half = 3 + 2 * n_plan  # w0h, w0t, b0 + plan (w, b) pairs
        means = refs[i: i + half]
        stds = refs[i + half: i + 2 * half]
        i += 2 * half
        noise = None
        if n_noise:
            noise = refs[i: i + n_noise]; i += n_noise
        dec_w, dec_b = refs[i], refs[i + 1]
        out_hbm, scratch, sem = refs[i + 2], refs[i + 3], refs[i + 4]

        if n_noise == 0:
            # One seed for every batch-tile program: all tiles draw the same
            # weight sequence (noise is shared across the folded ensemble).
            pltpu.prng_seed(seed_ref[0])

        def draw(e, k, ref):
            """Noise for weight array k at evaluation e.  Odd shapes incl.
            (1, W) bias rows lower fine through prng_random_bits (measured
            on-device)."""
            if noise is not None:
                return noise[k][e]
            return _kernel_normal(ref.shape)

        def materialize(e):
            """Effective weights for one RHS evaluation."""
            return [means[k][:] + draw(e, k, means[k]) * stds[k][:]
                    for k in range(len(means))]

        def rhs(zh, e):
            w = materialize(e)
            w0h, w0t, b0 = w[0], w[1], w[2]
            h = dot(zh, w0h) + b0
            if tail_w:
                h = h + dot(ztail_ref[:], w0t)
            fa = None
            for k, op in enumerate(plan):
                wk, bk = w[3 + 2 * k], w[3 + 2 * k + 1]
                if op.kind == "packed":
                    if op.act_f == op.act_a:
                        x = _elu(h) if op.act_f else h
                    else:
                        left = h[:, : op.split_in]
                        right = h[:, op.split_in:]
                        x = jnp.concatenate(
                            [_elu(left) if op.act_f else left,
                             _elu(right) if op.act_a else right], axis=-1)
                    h = dot(x, wk) + bk
                    if op.aug_done:
                        fa = h[:, op.out_split:]
                        h = h[:, : op.out_split]
                elif op.kind == "fp":
                    h = dot(_elu(h) if op.act_f else h, wk) + bk
                else:
                    fa_in = fa if fa is not None else h
                    fa = dot(_elu(fa_in) if op.act_a else fa_in, wk) + bk

            if mechanistic:
                rates = jnp.abs(h)
                beta, gam = rates[:, :R], rates[:, R:]
                S, I = zh[:, :R], zh[:, R: 2 * R]
                plus_i = beta * S * I
                minus_i = gam * I
                field = jnp.concatenate(
                    [-plus_i, plus_i - minus_i, minus_i], axis=-1)
                if fa is not None:
                    field = field + fa_w * fa
            else:  # Bayes_Fa / SONNb: the augmentation is the whole field
                field = fa if fa is not None else h
            out_of_range = (zh > 2.0) | (zh < -1.0)
            return jnp.where(out_of_range, 0.0, field)

        tile0 = pl.program_id(0) * tile_b

        def ship(ti, slot):
            return pltpu.make_async_copy(
                scratch.at[slot], out_hbm.at[ti, pl.ds(tile0, tile_b), :],
                sem.at[slot])

        def decode_and_ship(ti, zh):
            slot = jax.lax.rem(ti, 2)

            @pl.when(ti >= 2)
            def _():
                ship(ti - 2, slot).wait()

            scratch[slot] = jnp.dot(zh, dec_w[:],
                                    preferred_element_type=jnp.float32) \
                + dec_b[:]
            ship(ti, slot).start()

        zh = z_ref[:]
        decode_and_ship(0, zh)

        def step(i, zh):
            e = 4 * i
            k1 = rhs(zh, e)
            k2 = rhs(zh + dt * k1 * (1.0 / 3.0), e + 1)
            k3 = rhs(zh + dt * (k2 - k1 * (1.0 / 3.0)), e + 2)
            k4 = rhs(zh + dt * (k1 - k2 + k3), e + 3)
            zh = zh + dt * (k1 + 3.0 * (k2 + k3) + k4) * 0.125
            decode_and_ship(i + 1, zh)
            return zh

        jax.lax.fori_loop(0, T - 1, step, zh)

        if T >= 2:
            ship(T - 2, (T - 2) % 2).wait()
        ship(T - 1, (T - 1) % 2).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("T", "dt", "R", "L", "n_fp_layers", "n_aug_layers",
                     "fa_w", "tile_b", "interpret", "compute_dtype"))
def fused_bayes_trajectory_decode(
    z0_cm: jnp.ndarray,
    mean_weights: Tuple[jnp.ndarray, ...],
    std_weights: Tuple[jnp.ndarray, ...],
    dec_w: jnp.ndarray,
    dec_b: jnp.ndarray,
    seed,
    *,
    T: int,
    dt: float,
    R: int,
    L: int,
    n_fp_layers: int,
    n_aug_layers: int,
    fa_w: float = 1.0,
    tile_b: int = 1024,
    interpret: bool = False,
    compute_dtype: str = "float32",
    noise: Optional[Sequence[jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Full Bayesian RK4(3/8) trajectory + decode in one Pallas kernel.

    z0_cm: (B, L*R) compartment-major initial states; returns (T, B, R_out).
    ``seed``: int32 scalar seeding the on-core PRNG (ignored when ``noise``
    is given).  ``noise``: optional injected evaluation noise — one
    (4*(T-1), in, out) array per weight tensor in materialization order
    (w0_head, w0_tail, b0[1, W], then packed plan (w, b) pairs); test-only.
    """
    B, D = z0_cm.shape
    R_out = dec_w.shape[1]
    tile_b = min(tile_b, B)
    assert B % tile_b == 0, f"batch {B} not divisible by tile {tile_b}"

    def packed_l0(ws):
        if n_fp_layers > 0 and n_aug_layers > 0:
            w0 = jnp.concatenate([ws[0], ws[2 * n_fp_layers]], axis=1)
            b0 = jnp.concatenate([ws[1], ws[2 * n_fp_layers + 1]], axis=1)
        else:  # single-net families (Fp-only or aug-only) own slot 0
            w0, b0 = ws[0], ws[1]
        return w0, b0

    w0_m, b0_m = packed_l0(mean_weights)
    w0_s, b0_s = packed_l0(std_weights)

    tail_w = D - 3 * R
    if tail_w:
        z_tail = z0_cm[:, 3 * R:]
    else:
        z_tail = jnp.zeros((B, 1), z0_cm.dtype)
    z_head = z0_cm[:, : 3 * R]

    def split_l0(w0, b0):
        head = w0[: 3 * R]
        tail = w0[3 * R:] if tail_w else jnp.zeros((1, w0.shape[1]), w0.dtype)
        return head, tail, b0

    plan, mean_arrs = _build_plan(mean_weights, n_fp_layers, n_aug_layers)
    _, std_arrs = _build_plan(std_weights, n_fp_layers, n_aug_layers)

    means = list(split_l0(w0_m, b0_m)) + list(mean_arrs)
    stds = list(split_l0(w0_s, b0_s)) + list(std_arrs)

    R_pad = max(128, ((R_out + 127) // 128) * 128)
    if R_pad != R_out:
        dec_w = jnp.pad(dec_w, ((0, 0), (0, R_pad - R_out)))
        dec_b = jnp.pad(dec_b, ((0, 0), (0, R_pad - R_out)))

    n_noise = len(noise) if noise is not None else 0
    if n_noise:
        assert n_noise == len(means), \
            f"need {len(means)} noise arrays, got {n_noise}"
        n_evals = 4 * (T - 1)
        for z, m in zip(noise, means):
            assert z.shape == (n_evals,) + m.shape, \
                f"noise {z.shape} != {(n_evals,) + m.shape}"

    kernel = _make_bayes_kernel(
        T, dt, R, plan, fa_w, tile_b, tail_w, n_noise,
        compute_dtype=jnp.dtype(compute_dtype),
        mechanistic=n_fp_layers > 0)

    full = lambda *_: tuple([0] * 2)
    full3 = lambda *_: (0, 0, 0)
    in_specs = []
    inputs = []
    if n_noise == 0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray([seed], jnp.int32)
                      if jnp.ndim(seed) == 0 else seed.astype(jnp.int32))
    in_specs += [
        pl.BlockSpec((tile_b, 3 * R), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_b, z_tail.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs += [z_head, z_tail]
    for arr in means + stds:
        in_specs.append(pl.BlockSpec(arr.shape, full, memory_space=pltpu.VMEM))
        inputs.append(arr)
    if n_noise:
        for z in noise:
            in_specs.append(pl.BlockSpec(z.shape, full3,
                                         memory_space=pltpu.VMEM))
            inputs.append(z)
    in_specs.append(pl.BlockSpec(dec_w.shape, full, memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(dec_b.shape, full, memory_space=pltpu.VMEM))
    inputs += [dec_w, dec_b]

    flops_per_eval = 2 * tile_b * w0_m.shape[0] * w0_m.shape[1]
    for k in range(0, len(mean_arrs), 2):
        w = mean_arrs[k]
        flops_per_eval += 2 * tile_b * w.shape[0] * w.shape[1]

    y = pl.pallas_call(
        kernel,
        grid=(B // tile_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((T, B, R_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile_b, R_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * (T - 1) * flops_per_eval * (B // tile_b),
            bytes_accessed=B * D * 4 + T * B * R_pad * 4,
            transcendentals=4 * (T - 1) * B * 64,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*inputs)
    return y[..., :R_out]


# ---------------------------------------------------------------------------
# Model-level wrapper
# ---------------------------------------------------------------------------

class FusedBayesForecaster:
    """Serving-path forecaster for the Bayes RHS families: encoder/reparam in
    XLA + fused variational trajectory kernel (fresh weight noise per RHS
    evaluation, generated on-core).

    Same (B, S, T, R) output contract as ``UDEForecaster.apply``; equal in
    distribution (not draw-for-draw — the kernel PRNG differs from
    ``jax.random``).  ``seed`` varies the weight-noise stream per call.
    """

    def __init__(self, model, params, *, fa_w: float = 1.0,
                 tile_b: int = 1024, interpret: Optional[bool] = None,
                 compute_dtype: str = "float32"):
        from fiude_tpu.models.bayes import (
            BayesNeuralAug, BayesSIRRates, BayesUDE,
        )
        if not isinstance(model.ode,
                          (BayesSIRRates, BayesUDE, BayesNeuralAug)):
            raise TypeError("fused Bayes path supports BayesSIRRates/"
                            "BayesUDE/BayesNeuralAug only")
        self.model = model
        self.params = params
        self.fa_w = float(fa_w)
        self.tile_b = tile_b
        self.compute_dtype = compute_dtype
        if interpret is None:
            # Off-TPU the kernel needs the Mosaic interpreter (plain
            # interpret=True cannot lower prng_seed); note that interpreter
            # stubs prng_random_bits to zeros, so CPU runs produce the
            # mean-weight forecast — fine for tests, not for sampling.
            on_tpu = jax.devices()[0].platform == "tpu"
            interpret = False if on_tpu else pltpu.InterpretParams()
        self.interpret = interpret
        aug_only = isinstance(model.ode, BayesNeuralAug)
        has_aug = isinstance(model.ode, BayesUDE)
        self.mean_weights, self.std_weights = bayes_cm_weights(
            params.ode, model.n_regions, model.latent_dim,
            has_aug=has_aug, aug_only=aug_only)
        self.dec_w, self.dec_b = cm_permute_decoder(params.dec,
                                                    model.n_regions)
        self.n_fp_layers = 0 if aug_only else len(params.ode.fp_net)
        self.n_aug_layers = (len(params.ode.aug_net)
                             if (has_aug or aug_only) else 0)
        self._pipelines = {}

    def _pipeline(self, T: int, dt: float, tile: int):
        """One jitted program for the whole serving path (encode -> reparam
        -> fused kernel -> ensemble transpose).  Without this the prologue
        runs op-by-op from Python — ~600 ms/call through the axon dispatch
        tunnel vs ~4 ms compiled."""
        key = (T, dt, tile)
        fn = self._pipelines.get(key)
        if fn is not None:
            return fn
        from fiude_tpu.models.vae import reparam
        model = self.model

        def pipeline(enc_params, x, eps, seed):
            n_samples, batch = eps.shape[0], eps.shape[1]
            mean, std = model.encoder.apply(enc_params, x)
            z = reparam(eps, std, mean) \
                + jnp.asarray(model.ic_jitter, jnp.float32)
            y = fused_bayes_trajectory_decode(
                to_cm(z), self.mean_weights, self.std_weights,
                self.dec_w, self.dec_b, seed,
                T=T, dt=dt, R=model.n_regions, L=model.latent_dim,
                n_fp_layers=self.n_fp_layers,
                n_aug_layers=self.n_aug_layers,
                fa_w=self.fa_w, tile_b=tile, interpret=self.interpret,
                compute_dtype=self.compute_dtype)
            y = y.reshape(T, n_samples, batch, model.n_regions)
            return jnp.transpose(y, (2, 1, 0, 3))

        fn = jax.jit(pipeline)
        self._pipelines[key] = fn
        return fn

    def __call__(self, x, t, eps, seed: int = 0):
        t = np.asarray(t)
        dts = np.diff(t)
        assert np.allclose(dts, dts[0], rtol=1e-5), \
            "fused path requires a uniform time grid"
        dt = float(t[1] - t[0])
        B = eps.shape[0] * eps.shape[1]
        tile = self.tile_b
        while B % tile != 0:
            tile //= 2
        return self._pipeline(len(t), dt, tile)(
            self.params.enc, x, eps, jnp.asarray([seed], jnp.int32))
