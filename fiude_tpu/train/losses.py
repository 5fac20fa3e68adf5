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

import jax
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


def kl_params_from_stats(r1, r2, count, *, prior_means=(0.8, 0.55),
                         prior_stds=(0.2, 0.2)):
    """:func:`kl_params_loss` from kernel-reduced sufficient statistics.

    ``r1``/``r2`` are the masked sums and sums-of-squares of the
    RATE_SHIFT-shifted (beta, gamma) evaluations (fused stats mode,
    ``ops/pallas_train.py``); ``count`` is the masked element count per
    column.  Shifted moments are shift-invariant in the variance, so this
    reproduces :func:`ops.stats.masked_mean_std` (ddof=1) exactly.
    """
    from fiude_tpu.ops.pallas_train import RATE_SHIFT
    cnt = jnp.maximum(count, 1.0)
    shift = jnp.asarray(RATE_SHIFT, r1.dtype)
    post_mean = shift + r1 / cnt
    sq = r2 - jnp.square(r1) / cnt
    post_std = jnp.sqrt(jnp.maximum(sq, 0.0) / jnp.maximum(count - 1.0, 1.0))
    pm = jnp.asarray(prior_means, r1.dtype)
    ps = jnp.asarray(prior_stds, r1.dtype)
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


def compute_loss_sharded(
    loss_cfg: LossConfig,
    y_pred,
    y_true,
    extras,
    *,
    axis: str,
    kl_w,
    latent_dim: int,
    len_tr: int,
    prior_params: Optional[Dict[str, Any]] = None,
    time_mask=None,
    eval_mask=None,
    ode_kl=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """:func:`compute_loss` with the MC-sample axis sharded over mesh axis
    ``axis`` (for use inside ``shard_map``; the training analogue of
    :mod:`fiude_tpu.parallel.serving`).

    ``ode_kl`` (Bayes variational-layer KL, reference
    ``lib/in_development/models_bayes.py:118-128``) is a replicated,
    params-only term: like ``kl_z`` it is added once to the full-ensemble
    loss and rides the same divide-by-``n_shards`` / psum-the-grads
    contract.

    ``y_pred`` carries only this device's sample shard (B, S_local, T, R);
    ``extras.latent``/``extras.aux`` carry the matching folded-row shard;
    ``y_true`` and ``extras.mean/std`` are replicated.  Cross-sample
    statistics (ensemble moments for the NLL, the empirical rate posterior,
    the Fa/reg reductions) are assembled from sufficient statistics in TWO
    small ``psum`` rounds — the stop-gradient centering round (which also
    carries ``n_dev``) and the live stats round — each a single collective
    of a few KB instead of gathering the (B, S, T, R) ensemble.

    Gradient contract (pinned by ``tests/test_parallel.py``): under
    ``shard_map(..., check_vma=False)`` the transpose of ``psum`` is
    ``psum``, so a cotangent crossing k psums is scaled by ``n_shards**k``.
    Every cross-device path here crosses exactly ONE psum, and the returned
    loss is the full-ensemble loss divided by ``n_shards`` — differentiate
    it per device and ``psum`` the grads to get exactly the single-device
    gradient (replicated-input terms like kl_z are correct under the same
    recipe).  Returned metrics are full-ensemble values.

    An f32-stable two-pass: a FIRST, ``stop_gradient``-ed psum round
    computes the exact cross-shard means used as centering shifts (the
    shifted-moment value is shift-invariant, so gradients computed with the
    shift held constant are exact, and every differentiable path still
    crosses only the one live psum); the second round psums the centered
    sufficient statistics.
    """
    prior_params = prior_params or {"means": [0.8, 0.55], "stds": [0.2, 0.2]}
    zero = jnp.asarray(0.0, y_pred.dtype)

    aux = extras.aux if hasattr(extras, "aux") else None
    stage_mask = None
    latent_mask = None
    if time_mask is not None:
        stage_mask = time_mask
        latent_mask = jnp.concatenate(
            [jnp.ones((1,), time_mask.dtype), time_mask])

    s_local = y_pred.shape[1]
    stats: Dict[str, jnp.ndarray] = {"one": jnp.asarray(1.0, jnp.float32)}

    d = y_pred - y_true[:, None]                       # (B, S_l, T, R)

    # -- centering round (no gradient; exact up to the shift's own f32) ----
    center: Dict[str, jnp.ndarray] = {}
    rmask = None
    aux_stats = isinstance(aux, dict) and ("rate_stats" in aux
                                           or "fa_sq" in aux)
    if loss_cfg.nll:
        center["d1"] = jnp.sum(d, axis=1)
        center["one"] = jnp.asarray(1.0, jnp.float32)  # n_dev, same round
    if loss_cfg.kl_p and not aux_stats:
        rates = aux["rates"]
        rflat = rates.reshape(-1, 2)
        if stage_mask is None:
            rmask = jnp.ones(rflat.shape[:1] + (1,), rates.dtype)
        else:
            rmask = jnp.broadcast_to(
                stage_mask.reshape(
                    stage_mask.shape + (1,) * (rates.ndim - stage_mask.ndim)),
                rates.shape).reshape(-1, 2)
        center["r1"] = jnp.sum(rflat * rmask, axis=0)
        center["rc"] = jnp.sum(jnp.broadcast_to(rmask, rflat.shape), axis=0)
    if center:
        center = jax.lax.stop_gradient(
            jax.lax.psum(jax.lax.stop_gradient(center), axis))

    if loss_cfg.nll:
        n_dev = center["one"]
        c_d = center["d1"] / (s_local * n_dev)
        dc = d - c_d[:, None]
        stats["d1"] = jnp.sum(dc, axis=1)
        stats["d2"] = jnp.sum(jnp.square(dc), axis=1)
    if loss_cfg.mse:
        stats["dsq"] = jnp.sum(jnp.square(d), axis=1)
    if loss_cfg.kl_p:
        if aux_stats:
            # fused stats mode: the kernel reduced this shard's masked
            # RATE_SHIFT-shifted moments on-core; psum them like any other
            # sufficient statistic (the shift is a fixed constant, so no
            # centering round is needed)
            r1_l, r2_l, rc_l = aux["rate_stats"]
            stats["r1"] = r1_l
            stats["r2"] = r2_l
            stats["rc"] = jnp.broadcast_to(rc_l, (2,)).astype(jnp.float32)
        else:
            c_r = center["r1"] / jnp.maximum(center["rc"], 1.0)
            rcent = rflat - c_r
            stats["r1"] = jnp.sum(rcent * rmask, axis=0)
            stats["r2"] = jnp.sum(jnp.square(rcent) * rmask, axis=0)
            stats["rc"] = jnp.sum(jnp.broadcast_to(rmask, rflat.shape),
                                  axis=0)
    if loss_cfg.fa_norm and loss_cfg.fa_norm > 0:
        if aux_stats:
            stats["f2"] = aux["fa_sq"]
        elif stage_mask is None:
            stats["f2"] = jnp.sum(jnp.square(aux["fa"]))
        else:
            fa = aux["fa"]
            fm = jnp.broadcast_to(
                stage_mask.reshape(
                    stage_mask.shape + (1,) * (fa.ndim - stage_mask.ndim)),
                fa.shape)
            stats["f2"] = jnp.sum(jnp.square(fa) * fm)
    if loss_cfg.reg_loss:
        stats["reg"] = latent_init_loss(extras.latent[..., :3],
                                        mask=latent_mask)

    stats = jax.lax.psum(stats, axis)                  # the ONE psum round
    n_shards = stats["one"].astype(y_pred.dtype)
    s_total = s_local * n_shards

    loss = zero
    metrics: Dict[str, jnp.ndarray] = {}

    if loss_cfg.mse:
        if eval_mask is None:
            denom = s_total * d.shape[0] * d.shape[2] * d.shape[3]
            mse = jnp.sum(stats["dsq"]) / denom
        else:
            w = eval_mask.astype(y_pred.dtype).reshape(1, -1, 1)
            denom = (s_total * d.shape[0] * d.shape[3]
                     * jnp.sum(eval_mask.astype(y_pred.dtype)))
            mse = jnp.sum(stats["dsq"] * w) / denom
        loss = loss + mse
        metrics["mse"] = mse
    if loss_cfg.nll:
        mc = stats["d1"] / s_total                     # residual past center
        mean_d = c_d + mc                              # (B, T, R)
        var = (stats["d2"] - s_total * jnp.square(mc)) \
            / (s_total - 1.0)                          # unbiased, centered
        var = jnp.maximum(var, 1e-30)
        # -logpdf(y; y+mean_d, sqrt(var)) elementwise
        nll = 0.5 * jnp.log(2.0 * jnp.pi * var) \
            + jnp.square(mean_d) / (2.0 * var)
        mask = (y_true != -1.0).astype(nll.dtype)
        nll = nll * mask
        if eval_mask is None:
            nll = jnp.mean(nll)
        else:
            w = eval_mask.astype(nll.dtype).reshape(1, -1, 1)
            denom = (y_true.shape[0] * y_true.shape[2]
                     * jnp.sum(eval_mask.astype(nll.dtype)))
            nll = jnp.sum(nll * w) / denom
        loss = loss + nll
        metrics["nll"] = nll
    if loss_cfg.kl_z:
        klz = kl_w * kl_z_loss(extras.mean, extras.std, latent_dim=latent_dim,
                               len_tr=len_tr)
        loss = loss + klz
        metrics["kl_latent"] = klz
    if loss_cfg.kl_p:
        if aux_stats:
            from fiude_tpu.ops.pallas_train import RATE_SHIFT
            c_r = jnp.asarray(RATE_SHIFT, y_pred.dtype)
        cnt = stats["rc"]
        post_mean = c_r + stats["r1"] / jnp.maximum(cnt, 1.0)
        sq = stats["r2"] - jnp.square(stats["r1"]) / jnp.maximum(cnt, 1.0)
        post_std = jnp.sqrt(jnp.maximum(sq, 0.0)
                            / jnp.maximum(cnt - 1.0, 1.0))
        pm = jnp.asarray(prior_params["means"], y_pred.dtype)
        ps = jnp.asarray(prior_params["stds"], y_pred.dtype)
        klp = jnp.mean(kl_normal(pm, ps, post_mean, post_std))
        loss = loss + klp
        metrics["kl_params"] = klp
    if loss_cfg.fa_norm and loss_cfg.fa_norm > 0:
        norm = jnp.sqrt(stats["f2"])
        loss = loss + loss_cfg.fa_norm * norm
        metrics["Fa_norm"] = norm
    if loss_cfg.reg_loss:
        reg = 0.1 * stats["reg"]
        loss = loss + reg
        metrics["reg_loss"] = reg
    if ode_kl is not None:
        okl = loss_cfg.ode_kl_w * ode_kl
        loss = loss + okl
        metrics["ode_kl"] = okl

    metrics["loss"] = loss
    metrics["kl_w"] = jnp.asarray(kl_w, y_pred.dtype)
    return loss / n_shards, metrics


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
        if isinstance(aux, dict) and "rate_stats" in aux:
            # fused stats mode (ops/pallas_train.py stats_mode): the kernel
            # already reduced the masked shifted rate moments on-core
            klp = kl_params_from_stats(
                *aux["rate_stats"], prior_means=prior_params["means"],
                prior_stds=prior_params["stds"])
        else:
            klp = kl_params_loss(aux["rates"],
                                 prior_means=prior_params["means"],
                                 prior_stds=prior_params["stds"],
                                 mask=stage_mask)
        loss = loss + klp
        metrics["kl_params"] = klp
    if loss_cfg.fa_norm and loss_cfg.fa_norm > 0:
        if isinstance(aux, dict) and "fa_sq" in aux:
            norm = jnp.sqrt(aux["fa_sq"])
        else:
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
