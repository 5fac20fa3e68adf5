"""The flagship model: variational encoder -> SIR latent UDE -> linear decoder.

Pure-functional re-design of the reference's ``VAE`` orchestrator forward
path (``lib/VAE.py:35-140``).  One call is one jittable program:

    eps ~ N(0,1)^(S,B,R,Le)          (caller-supplied or rng-drawn)
    mean, std = encoder(x)            Le = latent_dim - 1
    z = reparam(eps, std, mean)       simplex: R := 1 - |S| - |I|; fold S into B
    z += 1e-5
    latent, aux = odeint_grid(rhs, z, t, method='rk4')   # hot loop
    y = decoder(latent[..., :3])      -> (B, S, T, R)

Monte-Carlo samples are folded into the batch axis exactly like the
reference (``lib/models.py:23``) because the RHS MLP flattens
(regions x latent) — this keeps every MLP layer one large (S*B, F) matmul on
the MXU instead of S small ones.

Latent-dimension plumbing parity (reference ``lib/VAE.py:63-89``): the
encoder emits ``latent_dim - 1`` dims; the simplex reparam restores the R
compartment; the decoder reads 3 dims.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fiude_tpu.models.decoder import LinearDecoder, LinearDecoderParams
from fiude_tpu.models.encoders import BackGRUEncoder
from fiude_tpu.models.rhs import NeuralAug, SIRRates, UDE
from fiude_tpu.ops.integrate import odeint_grid


def reparam(eps, std, mean, *, uncertainty: bool = True):
    """Sample latent ICs and project (S, I) onto the SIR simplex.

    Reference ``lib/models.py:16-24``: ``z = eps*std + mean``;
    ``z = [|z_S|, |z_I|, 1 - |z_S| - |z_I|, z_rest]``; the MC-sample dim is
    folded into the batch: (S, B, R, Le) -> (S*B, R, Le+1).
    """
    if uncertainty:
        z = eps * std + mean
    else:
        z = jnp.broadcast_to(mean, eps.shape)
    head = jnp.abs(z[..., :2])
    r = 1.0 - jnp.sum(head, axis=-1, keepdims=True)
    z = jnp.concatenate([head, r, z[..., 2:]], axis=-1)
    return z.reshape((z.shape[0] * z.shape[1],) + z.shape[2:])


def make_prior(mean, *, latent_dim: int, z_prior=(0.1, 0.01)):
    """Latent IC prior: S,I anchored at the encoder mean with tight stds,
    remaining dims standard normal (reference ``lib/models.py:9-14``).

    Returns (prior_mean, prior_std) broadcastable against ``mean``.
    """
    dtype = mean.dtype
    prior_mean = jnp.concatenate(
        [mean[..., :2], jnp.zeros_like(mean[..., 2:])], axis=-1)
    std = jnp.concatenate([
        jnp.asarray(z_prior, dtype),
        jnp.ones((latent_dim - len(z_prior) - 1,), dtype),
    ])
    prior_std = jnp.broadcast_to(jnp.abs(std), prior_mean.shape)
    return prior_mean, prior_std


@dataclasses.dataclass(frozen=True)
class UDEForecaster:
    """Config for the full encoder/ODE/decoder stack.

    ``ode`` is one of the RHS configs (SIRRates | NeuralAug | UDE); the
    encoder latent dim is ``latent_dim - 1`` (simplex restores one dim),
    matching the reference constructor quirk where the ``ode_type='Fa'``
    branch is effectively dead (reference ``lib/VAE.py:72-76`` is keyed on
    the *argument* default 'Fp', not the instance attribute).
    """
    encoder: BackGRUEncoder
    ode: Any
    decoder: LinearDecoder
    latent_dim: int = 8
    n_regions: int = 1
    uncertainty: bool = True
    method: str = "rk4"
    substeps: int = 1
    checkpoint_solver: bool = False
    solver_unroll: int = 1  # scan unroll factor (TPU pipelining knob)
    ic_jitter: float = 1e-5
    # run the training-path trajectory (forward AND backward) as fused
    # Pallas kernels (ops/pallas_train.py; Bayes families via
    # ops/pallas_bayes_train.py); rk4 only
    fused_train: bool = False
    # with fused_train: reduce the loss's aux epilogue (kl_p rate moments,
    # fa_norm) to sufficient statistics on-core instead of streaming the
    # (4(T-1), B, *) aux tensors through HBM both ways; ``extras.aux``
    # becomes {"rate_stats": (r1, r2, count), "fa_sq": f2} which
    # train/losses.py consumes directly (deterministic AND Bayes families)
    fused_stats: bool = False

    @classmethod
    def build(cls, *, n_regions: int, latent_dim: int, n_qs: int,
              ode_name: str = "FaFp",
              encoder_name: str = "back_gru",
              enc_params: Optional[Dict[str, Any]] = None,
              ode_params: Optional[Dict[str, Any]] = None,
              dec_params: Optional[Dict[str, Any]] = None,
              uncertainty: bool = True,
              dtype: str = "float32",
              **kwargs) -> "UDEForecaster":
        """Mirror of the reference's VAE(...) constructor plumbing
        (lib/VAE.py:36-89) with config dicts per sub-module."""
        enc_params = dict(enc_params or {})
        ode_params = dict(ode_params or {})
        dec_params = dict(dec_params or {})
        # Accept reference kwarg aliases.
        if "SIR_scaler" in enc_params:
            enc_params["sir_scaler"] = tuple(enc_params.pop("SIR_scaler"))
        for k in ("q_sizes", "ff_sizes"):
            if k in enc_params:
                enc_params[k] = tuple(enc_params[k])
        for k in ("net_sizes", "aug_net_sizes"):
            if k in ode_params:
                ode_params[k] = tuple(ode_params[k])

        ld_enc = latent_dim - 1
        if encoder_name in ("back_gru", "Encoder_Back_GRU"):
            encoder = BackGRUEncoder(n_regions=n_regions, n_qs=n_qs,
                                     latent_dim=ld_enc,
                                     uncertainty=uncertainty,
                                     dtype=dtype, **enc_params)
        elif encoder_name in ("bigru", "miso_gru", "Encoder_BiDirectionalGRU",
                              "Encoder_MISO_GRU"):
            from fiude_tpu.models.encoders import BiGRUEncoder
            encoder = BiGRUEncoder(n_regions=n_regions, n_qs=n_qs,
                                   latent_dim=ld_enc, uncertainty=uncertainty,
                                   dtype=dtype, **enc_params)
        elif encoder_name in ("generic", "Encoder"):
            from fiude_tpu.models.encoders import GenericEncoder
            enc_params.setdefault("rnn_input_size", n_regions * (n_qs + 1))
            if "rnn_hidden_sizes" not in enc_params and "q_sizes" in enc_params:
                enc_params["rnn_hidden_sizes"] = tuple(enc_params.pop("q_sizes"))
            if "ff_hidden_sizes" not in enc_params and "ff_sizes" in enc_params:
                enc_params["ff_hidden_sizes"] = tuple(enc_params.pop("ff_sizes"))
            for k in ("rnn_hidden_sizes", "ff_hidden_sizes"):
                if k in enc_params:
                    enc_params[k] = tuple(enc_params[k])
            encoder = GenericEncoder(n_regions=n_regions, latent_dim=ld_enc,
                                     uncertainty=uncertainty, dtype=dtype,
                                     **enc_params)
        elif encoder_name in ("bilstm", "Encoder_BiDirectionalLSTM"):
            from fiude_tpu.models.encoders import BiLSTMEncoder
            enc_params.setdefault("input_size", n_regions * (n_qs + 1))
            enc_params.setdefault("hidden_size", 64)
            enc_params.pop("q_sizes", None)
            enc_params.pop("ff_sizes", None)
            encoder = BiLSTMEncoder(n_regions=n_regions, latent_dim=ld_enc,
                                    uncertainty=uncertainty, dtype=dtype,
                                    **enc_params)
        else:
            raise ValueError(f"unknown encoder {encoder_name!r}")
        from fiude_tpu.models.bayes import BayesNeuralAug, BayesSIRRates, BayesUDE
        rhs_cls = {"Fp": SIRRates, "CONN": SIRRates,
                   "Fa": NeuralAug, "SONN": NeuralAug,
                   "FaFp": UDE, "UONN": UDE,
                   "Bayes_Fp": BayesSIRRates, "CONNb": BayesSIRRates,
                   "Bayes_Fa": BayesNeuralAug, "SONNb": BayesNeuralAug,
                   "Bayes_FaFp": BayesUDE, "UONNb": BayesUDE}[ode_name]
        # Reference RHS constructors take **kwargs and ignore extras
        # (lib/models.py:110,159,200) — filter to accepted fields.
        fields = {f.name for f in dataclasses.fields(rhs_cls)}
        ode_params = {k: v for k, v in ode_params.items() if k in fields}
        ode = rhs_cls(n_regions=n_regions, latent_dim=latent_dim,
                      dtype=dtype, **ode_params)
        decoder = LinearDecoder(n_regions=n_regions, latent_dim=3,
                                input_dim=1, dtype=dtype, **dec_params)
        return cls(encoder=encoder, ode=ode, decoder=decoder,
                   latent_dim=latent_dim, n_regions=n_regions,
                   uncertainty=uncertainty, **kwargs)

    # -- params ------------------------------------------------------------

    def init(self, key) -> "UDEForecasterParams":
        k_enc, k_ode, k_dec = jax.random.split(key, 3)
        return UDEForecasterParams(
            enc=self.encoder.init(k_enc),
            ode=self.ode.init(k_ode),
            dec=self.decoder.init(k_dec),
        )

    # -- forward -----------------------------------------------------------

    def sample_eps(self, key, batch_size: int, n_samples: int,
                   dtype=jnp.float32):
        return jax.random.normal(
            key, (n_samples, batch_size, self.n_regions,
                  self.encoder.latent_dim), dtype)

    @property
    def is_bayes(self) -> bool:
        return getattr(self.ode, "uncertainty", "none") == "bayes"

    def rhs_fn(self, ode_params, fa_w):
        """Bind RHS params (+ fa_w for the UDE) into an (t, y[, key]) ->
        (dy, aux); Bayes variants take a per-evaluation PRNG key."""
        from fiude_tpu.models.bayes import BayesUDE
        if isinstance(self.ode, UDE):
            return lambda t, y: self.ode.apply(ode_params, t, y, fa_w=fa_w)
        if isinstance(self.ode, BayesUDE):
            return lambda t, y, k: self.ode.apply(ode_params, t, y, k, fa_w=fa_w)
        if self.is_bayes:
            return lambda t, y, k: self.ode.apply(ode_params, t, y, k)
        return lambda t, y: self.ode.apply(ode_params, t, y)

    def _encode(self, enc_params, x):
        """Encoder forward on the encoder params subtree; with
        ``fused_train`` and a Back-GRU encoder the fused Pallas fwd+BPTT
        pair (ops/pallas_gru_train.py) replaces the XLA scan — the encoder
        dominates the weekly-grid training step once the trajectory solve
        is fused.  Falls back to the scan when the backward kernel's VMEM
        working set would not fit (large batch/window)."""
        from fiude_tpu.models.encoders import BackGRUEncoder
        if self.fused_train and isinstance(self.encoder, BackGRUEncoder):
            from fiude_tpu.ops.pallas_gru_train import (
                fits_vmem, fused_backgru_train_apply,
            )
            if fits_vmem(self.encoder, batch=x.shape[0], seq_len=x.shape[1]):
                return fused_backgru_train_apply(self.encoder, enc_params, x)
        return self.encoder.apply(enc_params, x)

    def apply(self, params: "UDEForecasterParams", x, t, eps, *,
              fa_w=1.0, rng=None,
              time_mask=None) -> Tuple[jnp.ndarray, "ForwardExtras"]:
        """Forward pass.

        Args:
          params: UDEForecasterParams pytree.
          x: (B, T_in, features) surveillance window.
          t: (T,) output time grid (weeks).
          eps: (S, B, R, Le) standard-normal draws (use :meth:`sample_eps`).
          fa_w: UDE ramp weight (ignored for Fp/Fa).
          rng: PRNG key for Bayes-variational weight noise (one fresh draw
            per RHS evaluation); ignored for non-Bayes RHS.
          time_mask: optional (T-1,) per-interval loss weights (the padded
            curriculum) — consumed only by the ``fused_stats`` path, which
            must fold the mask into its on-core reductions; every other
            path applies it in the loss instead.

        Returns:
          y_pred: (B, S, T, n_regions) MC forecast ensemble.
          extras: encoder stats, latent trajectory, stage-ordered RHS aux.
        """
        n_samples, batch = eps.shape[0], eps.shape[1]
        enc_out = self._encode(params.enc, x)
        if self.uncertainty:
            mean, std = enc_out
            z = reparam(eps, std, mean, uncertainty=True)
        else:
            mean = enc_out[0] if isinstance(enc_out, tuple) else enc_out
            std = None
            n_samples = 1
            eps = eps[:1]
            z = reparam(eps, None, mean, uncertainty=False)
        z = z + jnp.asarray(self.ic_jitter, z.dtype)

        if self.is_bayes and rng is None:
            rng = jax.random.PRNGKey(0)
        if self.method in ("dopri5", "tsit5"):
            if self.is_bayes:
                raise ValueError(
                    "adaptive methods do not support Bayes RHS variants: "
                    "fresh per-evaluation weight noise needs the fixed-stage "
                    "path (use method='rk4')")
            # Train through the adaptive forward with the continuous adjoint
            # (the adaptive while_loop is not reverse-differentiable).  The
            # RHS params and fa_w ride as explicit adjoint params so no
            # tracer is closed over inside the custom_vjp.
            from fiude_tpu.ops.adjoint import odeint_adjoint
            latent = odeint_adjoint(
                lambda pw, s, y: self.rhs_fn(pw[0], pw[1])(s, y)[0],
                (params.ode, fa_w), z, t, method=self.method)
            rhs = self.rhs_fn(params.ode, fa_w)
            # The adaptive step count is data-dependent, so the fixed path's
            # stage-ordered aux (reference lib/models.py:137,187) cannot be
            # collected. Evaluate the RHS aux at the accepted output grid
            # points instead — leading dim (T-1,) lines up with the padded-
            # curriculum time_mask, so kl_p / fa_norm / reg_loss configs
            # work on every solver.
            aux = jax.vmap(lambda ti, yi: rhs(ti, yi)[1])(t[1:], latent[1:])
        elif (self.fused_train and self.method == "rk4"
              and self.substeps == 1):
            # fused Pallas trajectory with a hand-written backward kernel —
            # identical contract to odeint_grid (trajectory + stage-ordered
            # aux, all differentiable).  Bayes families route to the
            # variational kernel pair (per-evaluation weight noise re-derived
            # from (seed, eval) on-core in both passes).
            from fiude_tpu.ops.pallas_train import (
                aux_to_model_layout, cm_permute_traceable,
                fused_train_trajectory, traj_to_model_layout,
            )
            from fiude_tpu.ops.pallas_ude import to_cm
            has_fp = hasattr(params.ode, "fp_net")
            has_aug = hasattr(params.ode, "aug_net")
            z_cm = to_cm(z)
            traj_kwargs = dict(
                T=t.shape[0], R=self.n_regions, L=self.latent_dim,
                n_fp_layers=len(params.ode.fp_net) if has_fp else 0,
                n_aug_layers=len(params.ode.aug_net) if has_aug else 0)
            if self.fused_stats:
                tmask = (jnp.ones((t.shape[0] - 1,), jnp.float32)
                         if time_mask is None
                         else jnp.asarray(time_mask, jnp.float32))
                stats_kwargs = dict(stats_mode=True, tmask=tmask)
            else:
                stats_kwargs = {}
            if self.is_bayes:
                if jax.default_backend() != "tpu":
                    import warnings
                    warnings.warn(
                        "Bayes fused_train on a non-TPU backend runs under "
                        "the Mosaic interpreter, whose on-core PRNG is "
                        "stubbed to zeros: variational weight noise is zero "
                        "and w_std gets no reparameterization gradient. Use "
                        "fused_train=False (the XLA scan path) for real "
                        "CPU/GPU training.", stacklevel=2)
                from fiude_tpu.ops.pallas_bayes_train import (
                    bayes_cm_permute_traceable, fused_bayes_train_trajectory,
                )
                means_flat, stds_flat = bayes_cm_permute_traceable(
                    params.ode, self.n_regions, self.latent_dim,
                    has_fp=has_fp, has_aug=has_aug)
                seed = jax.random.randint(rng, (), 0, jnp.int32(2 ** 31 - 1),
                                          dtype=jnp.int32)
                outs = fused_bayes_train_trajectory(
                    means_flat, stds_flat, z_cm, fa_w, t[1:] - t[:-1],
                    seed, **stats_kwargs, **traj_kwargs)
            else:
                flat = cm_permute_traceable(
                    params.ode, self.n_regions, self.latent_dim,
                    has_fp=has_fp, has_aug=has_aug)
                outs = fused_train_trajectory(
                    flat, z_cm, fa_w, t[1:] - t[:-1], **stats_kwargs,
                    **traj_kwargs)
            latent = traj_to_model_layout(outs[0], z_cm, self.n_regions,
                                          self.latent_dim)
            if self.fused_stats:
                _, r1, r2, f2 = outs
                cnt = 4.0 * z_cm.shape[0] * self.n_regions * jnp.sum(tmask)
                stats_aux = {}
                if r1 is not None:
                    stats_aux["rate_stats"] = (r1, r2, cnt)
                if f2 is not None:
                    stats_aux["fa_sq"] = f2
                aux = stats_aux or None
            else:
                _, rates_cm, fa_cm = outs
                aux = aux_to_model_layout(rates_cm, fa_cm, t.shape[0],
                                          self.n_regions) or None
        else:
            latent, aux = odeint_grid(
                self.rhs_fn(params.ode, fa_w), z, t,
                method=self.method, substeps=self.substeps,
                checkpoint=self.checkpoint_solver, unroll=self.solver_unroll,
                rng=rng if self.is_bayes else None,
            )
        y = self.decoder.apply(params.dec, latent)           # (T, S*B, R)
        T = y.shape[0]
        y = y.reshape(T, n_samples, batch, self.n_regions)
        y_pred = jnp.transpose(y, (2, 1, 0, 3))               # (B, S, T, R)
        return y_pred, ForwardExtras(mean=mean, std=std, latent=latent,
                                     aux=aux)


class UDEForecasterParams(NamedTuple):
    enc: Any
    ode: Any
    dec: LinearDecoderParams


class ForwardExtras(NamedTuple):
    mean: jnp.ndarray
    std: Optional[jnp.ndarray]
    latent: jnp.ndarray
    aux: Any
