"""The gated multi-term VAE loss stack (reference ``lib/VAE.py:142-198``).

Every term is a pure function of forward outputs; gating is config-driven
(:class:`LossConfig` mirrors the reference ``training_info`` dicts,
``run_ode.py:71-78``).  All semantics preserved:

* **nll** — Gaussian NLL of the MC ensemble: std over the sample axis is
  *unbiased* (torch default), entries where ``y == -1`` are masked to zero
  but still counted in the mean (reference ``lib/train_functions.py:81-90``).
* **mse** — vs the ensemble, broadcast over samples.
* **kl_z** — ``kl_w * KL(prior(mean) || N(mean, std)).sum(-1).mean() / len_tr``
  with the cyclical annealed weight (reference ``lib/VAE.py:166-168``).
* **kl_p** — ``KL(N(prior_means, prior_stds) || empirical rate posterior)``
  averaged over the 2 rate dims (reference ``lib/train_functions.py:77-80``).
* **fa_norm** — Frobenius norm of every Fa evaluation along the trajectory
  (reference ``lib/VAE.py:179-183``).
* **reg_loss** — ``0.1 * sum`` of out-of-[0,1] penalties over the S,I,R
  trajectory (reference ``lib/VAE.py:185-189``, ``train_functions.py:116-126``).
* **anneal** — cyclical (reset every ``reset_pos`` steps) cosine/linear/
  sigmoid ramp (reference ``lib/train_functions.py:17-44``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from fiude_tpu.models.rhs import empirical_rate_posterior
from fiude_tpu.models.vae import make_prior
from fiude_tpu.ops.stats import kl_normal, normal_logpdf


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss gating, mirroring the reference's per-model ``training_info``."""
    nll: bool = True
    mse: bool = False
    kl_z: bool = True
    kl_p: bool = True
    fa_norm: float = 0.0       # weight; 0 disables (reference uses 1e-1)
    reg_loss: bool = True
    anneal: bool = True
    ode_kl_w: float = 1.0      # weight on variational-layer KL (Bayes RHS)


#: Reference model-family presets (run_ode.py:71-78).
TRAINING_INFO = {
    "UONN": LossConfig(nll=True, mse=False, kl_z=True, kl_p=True,
                       fa_norm=1e-1, reg_loss=True, anneal=True),
    "CONN": LossConfig(nll=True, mse=False, kl_z=True, kl_p=True,
                       fa_norm=0.0, reg_loss=True, anneal=True),
    "SONN": LossConfig(nll=True, mse=False, kl_z=True, kl_p=False,
                       fa_norm=0.0, reg_loss=False, anneal=True),
    "UONNb": LossConfig(nll=True, mse=False, kl_z=True, kl_p=True,
                        fa_norm=1e-1, reg_loss=True, anneal=True),
    "CONNb": LossConfig(nll=True, mse=False, kl_z=True, kl_p=True,
                        fa_norm=0.0, reg_loss=True, anneal=True),
    "SONNb": LossConfig(nll=True, mse=False, kl_z=True, kl_p=False,
                        fa_norm=0.0, reg_loss=False, anneal=True),
}


@dataclasses.dataclass(frozen=True)
class AnnealConfig:
    """Cyclical KL-annealing schedule (reference lib/VAE.py:91-97 defaults)."""
    anneal: bool = True
    reset_pos: int = 10000
    split: float = 0.5
    lower: float = 0.0
    upper: float = 1.0
    kind: str = "cosine"


def kl_annealing(step, cfg: AnnealConfig):
    """Annealed KL weight at (1-indexed) train step; jnp-traceable.

    Parity with reference lib/train_functions.py:17-44 including the
    ``while step > reset_pos: step -= reset_pos`` wrap (so step lands in
    (0, reset_pos]).
    """
    if not cfg.anneal:
        return jnp.asarray(1.0, jnp.float32)
    step = jnp.asarray(step, jnp.float32)
    s = jnp.mod(step - 1.0, float(cfg.reset_pos)) + 1.0
    half = float(int(cfg.reset_pos * cfg.split))
    frac = s / half
    if cfg.kind == "linear":
        ramp = frac * (cfg.upper - cfg.lower) + cfg.lower
    elif cfg.kind == "sigmoid":
        ramp = cfg.lower + (cfg.upper - cfg.lower) / (1.0 + jnp.exp(-10.0 * (frac - 0.5)))
    elif cfg.kind == "cosine":
        # 0.5*(1-cos(pi f)) == sin^2(pi f / 2), but the sin^2 form avoids the
        # catastrophic f32 cancellation of 1-cos at small steps (the reference
        # computes this in f64 host numpy, train_functions.py:43; the sin^2
        # value matches it to ~1e-7 relative even in f32)
        ramp = cfg.lower + jnp.square(jnp.sin(jnp.pi / 2 * frac)) * (cfg.upper - cfg.lower)
    else:
        raise ValueError(f"unknown anneal kind {cfg.kind!r}")
    return jnp.where(s >= half, cfg.upper, ramp)


def nll_loss(y_pred, y, mean: bool = True, eval_mask=None):
    """MC-ensemble Gaussian NLL with -1 masking.

    y_pred: (B, S, T, R); y: (B, T, R).  Unbiased std over the sample axis
    (torch default); masked entries contribute 0 but remain in the mean's
    denominator — both quirks preserved (lib/train_functions.py:81-90).

    ``eval_mask``: optional (T,) 0/1 — padded-curriculum columns beyond the
    active horizon are excluded from numerator AND denominator, reproducing
    the exact-mode mean over ``y[:, eval_pts]``.
    """
    y_std = jnp.std(y_pred, axis=1, ddof=1)
    y_mean = jnp.mean(y_pred, axis=1)
    nll = -normal_logpdf(y, y_mean, y_std)
    mask = (y != -1.0).astype(nll.dtype)
    nll = nll * mask
    if not mean:
        return nll
    if eval_mask is None:
        return jnp.mean(nll)
    w = eval_mask.astype(nll.dtype).reshape(1, -1, 1)
    denom = y.shape[0] * y.shape[2] * jnp.sum(eval_mask.astype(nll.dtype))
    return jnp.sum(nll * w) / denom


def mse_loss(y_pred, y, eval_mask=None):
    """Mean squared error vs every ensemble member (lib/VAE.py:155)."""
    se = jnp.square(y_pred - y[:, None])
    if eval_mask is None:
        return jnp.mean(se)
    w = eval_mask.astype(se.dtype).reshape(1, 1, -1, 1)
    denom = (se.shape[0] * se.shape[1] * se.shape[3]
             * jnp.sum(eval_mask.astype(se.dtype)))
    return jnp.sum(se * w) / denom


def kl_z_loss(mean, std, *, latent_dim: int, len_tr: int, z_prior=(0.1, 0.01)):
    """KL(IC prior || encoder posterior), per reference lib/VAE.py:167."""
    pm, ps = make_prior(mean, latent_dim=latent_dim, z_prior=z_prior)
    return jnp.mean(jnp.sum(kl_normal(pm, ps, mean, std), axis=-1)) / len_tr


def kl_params_loss(rates_aux, *, prior_means=(0.8, 0.55), prior_stds=(0.2, 0.2),
                   mask=None):
    """KL(rate prior || empirical (beta,gamma) posterior).

    ``rates_aux``: stacked rates from the solver aux, any leading dims +
    trailing (n_regions, 2).  ``mask``: optional per-leading-step weights for
    the padded-curriculum path.
    """
    if mask is None:
        post_mean, post_std = empirical_rate_posterior(rates_aux)
    else:
        from fiude_tpu.ops.stats import masked_mean_std
        flat = rates_aux.reshape(-1, 2)
        m = jnp.broadcast_to(
            mask.reshape(mask.shape + (1,) * (rates_aux.ndim - mask.ndim)),
            rates_aux.shape).reshape(-1, 2)
        post_mean, post_std = masked_mean_std(flat, m, axis=0)
    pm = jnp.asarray(prior_means, rates_aux.dtype)
    ps = jnp.asarray(prior_stds, rates_aux.dtype)
    return jnp.mean(kl_normal(pm, ps, post_mean, post_std))


def fa_norm_loss(fa_aux, mask=None):
    """Frobenius norm of all Fa evaluations (lib/VAE.py:180)."""
    if mask is None:
        return jnp.sqrt(jnp.sum(jnp.square(fa_aux)))
    m = jnp.broadcast_to(
        mask.reshape(mask.shape + (1,) * (fa_aux.ndim - mask.ndim)),
        fa_aux.shape)
    return jnp.sqrt(jnp.sum(jnp.square(fa_aux) * m))


def latent_init_loss(x, mask=None):
    """Sum of |x| where x<0 plus |1-x| where x>1 (train_functions.py:116-126)."""
    penalty = jnp.where(x < 0, jnp.abs(x), 0.0) + jnp.where(x > 1, jnp.abs(1.0 - x), 0.0)
    if mask is not None:
        m = jnp.broadcast_to(
            mask.reshape(mask.shape + (1,) * (penalty.ndim - mask.ndim)),
            penalty.shape)
        penalty = penalty * m
    return jnp.sum(penalty)


def compute_loss(
    loss_cfg: LossConfig,
    y_pred,
    y_true,
    extras,
    *,
    kl_w,
    latent_dim: int,
    len_tr: int,
    prior_params: Optional[Dict[str, Any]] = None,
    ode_kl=None,
    time_mask=None,
    eval_mask=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Assemble the gated loss; returns (scalar loss, metrics dict).

    ``time_mask``: optional (T-1,) step weights for the padded-curriculum
    path — masks solver aux (kl_p / fa_norm) and the latent trajectory
    (reg_loss) beyond the active horizon; ``eval_mask``: optional (T,) 0/1
    masking nll/mse output columns the same way.  Both ``None`` reproduces
    the reference's exact-horizon behavior.
    """
    prior_params = prior_params or {"means": [0.8, 0.55], "stds": [0.2, 0.2]}
    zero = jnp.asarray(0.0, y_pred.dtype)
    loss = zero
    metrics: Dict[str, jnp.ndarray] = {}

    aux = extras.aux if hasattr(extras, "aux") else None
    stage_mask = None
    latent_mask = None
    if time_mask is not None:
        stage_mask = time_mask  # (T-1,) broadcasts over stage/batch dims
        latent_mask = jnp.concatenate(
            [jnp.ones((1,), time_mask.dtype), time_mask])

    if loss_cfg.mse:
        mse = mse_loss(y_pred, y_true, eval_mask=eval_mask)
        loss = loss + mse
        metrics["mse"] = mse
    if loss_cfg.nll:
        nll = nll_loss(y_pred, y_true, eval_mask=eval_mask)
        loss = loss + nll
        metrics["nll"] = nll
    if loss_cfg.kl_z:
        klz = kl_w * kl_z_loss(extras.mean, extras.std, latent_dim=latent_dim,
                               len_tr=len_tr)
        loss = loss + klz
        metrics["kl_latent"] = klz
    if loss_cfg.kl_p:
        klp = kl_params_loss(aux["rates"],
                             prior_means=prior_params["means"],
                             prior_stds=prior_params["stds"],
                             mask=stage_mask)
        loss = loss + klp
        metrics["kl_params"] = klp
    if loss_cfg.fa_norm and loss_cfg.fa_norm > 0:
        norm = fa_norm_loss(aux["fa"], mask=stage_mask)
        loss = loss + loss_cfg.fa_norm * norm
        metrics["Fa_norm"] = norm
    if loss_cfg.reg_loss:
        reg = 0.1 * latent_init_loss(extras.latent[..., :3], mask=latent_mask)
        loss = loss + reg
        metrics["reg_loss"] = reg
    if ode_kl is not None:
        okl = loss_cfg.ode_kl_w * ode_kl
        loss = loss + okl
        metrics["ode_kl"] = okl

    metrics["loss"] = loss
    metrics["kl_w"] = jnp.asarray(kl_w, y_pred.dtype)
    return loss, metrics
