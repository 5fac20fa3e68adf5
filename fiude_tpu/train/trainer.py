"""Training orchestrator: the TPU-native re-design of the reference ``VAE``
trainer (``lib/VAE.py:35-334``).

Everything data-dependent that torch does eagerly becomes compiled control
flow:

* the **grad-norm skip rule** — apply the optimizer step only when the global
  grad norm is below ``grad_lim``, unless 4 consecutive skips accumulated or
  we are in the first 3 epochs (reference ``lib/VAE.py:205-212``) — runs as a
  predicated tree-select inside the jitted step, with the skip counter carried
  in :class:`TrainState`;
* **KL annealing** is computed from the carried ``tr_step`` inside jit;
* the **horizon curriculum** (reference ``run_ode.py:147-164``) is supported
  in two modes: ``"exact"`` (integrate only the active horizon; one
  re-compile per curriculum stage — reference-parity) and ``"padded"``
  (always integrate the max horizon, mask losses beyond the active stage; a
  single compilation for the whole schedule — TPU-friendly);
* Monte-Carlo draws are jax PRNG streams, one split per step.

The optimizer is optax Adam wrapped in ``inject_hyperparams`` so the warm-up
schedule (reference ``lib/VAE.py:13-18``) and exponential LR decay
(``lib/utils.py:75-79``) mutate the learning rate without recompilation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fiude_tpu.models.vae import UDEForecaster, UDEForecasterParams
from fiude_tpu.train import checkpoint as ckpt
from fiude_tpu.train.losses import (
    AnnealConfig,
    LossConfig,
    compute_loss,
    kl_z_loss,
)
from fiude_tpu.utils.history import History


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    tr_step: jnp.ndarray     # int32, counts calc_loss calls (annealing clock)
    skip_count: jnp.ndarray  # int32, consecutive skipped optimizer steps


def warm_up_lr(epoch: int) -> float:
    """Reference lib/VAE.py:14-18 LambdaLR multiplier (quirk preserved: the
    multiplier itself is ~1e-3, on top of the base lr)."""
    if epoch < 10:
        return 1e-3 * (epoch + 1) / 10
    return 1e-3


def _tree_select(pred, a, b):
    """pred ? a : b, elementwise over matching pytrees."""
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def _env_no_scan() -> bool:
    """Opt-out for the whole-epoch scan fast path (FIUDE_NO_EPOCH_SCAN=1):
    falls back to the per-batch loop, which is semantically identical
    (test_epoch_scan.py) but ~10x slower through the axon tunnel."""
    import os
    return bool(os.environ.get("FIUDE_NO_EPOCH_SCAN"))


@functools.partial(jax.jit, static_argnames=("n",))
def _chain_split(key, n):
    """Advance a PRNG chain ``n`` successive splits in ONE compiled call.

    Chain-identical to ``n`` repeated ``key, sub = jax.random.split(key)``
    calls, but costs one dispatch instead of ``n`` — on the axon tunnel each
    host-side split is a serializing ~3 ms round trip (measured; it was the
    single largest cost of the weekly-grid training step)."""
    def body(k, _):
        k, sub = jax.random.split(k)
        return k, sub

    return jax.lax.scan(body, key, None, length=n)


@dataclasses.dataclass
class Trainer:
    """Composes a :class:`UDEForecaster` with the loss stack and optimizer.

    Mirrors the reference VAE.__init__ knobs (lib/VAE.py:36-101): ``len_tr``
    divides kl_z; ``prior_params`` parameterize the rate prior; file prefixes
    drive the three-part checkpoints.
    """
    model: UDEForecaster
    loss_cfg: LossConfig = dataclasses.field(default_factory=LossConfig)
    anneal: AnnealConfig = dataclasses.field(default_factory=AnnealConfig)
    len_tr: int = 130
    prior_params: Optional[Dict[str, Sequence[float]]] = None
    file_prefix: Optional[str] = None
    chkpt_prefix: Optional[str] = None
    seed: int = 0
    fa_w: float = 1.0
    ode_kl_w: Optional[float] = None  # reference passes 1/153 (run_ode.py:144)

    def __post_init__(self):
        if self.prior_params is None:
            self.prior_params = {"means": [0.8, 0.55], "stds": [0.2, 0.2]}
        if self.ode_kl_w is not None:
            self.loss_cfg = dataclasses.replace(self.loss_cfg,
                                                ode_kl_w=self.ode_kl_w)
        self._key = jax.random.PRNGKey(self.seed)
        self.params: Optional[UDEForecasterParams] = None
        self.opt = None
        self.state: Optional[TrainState] = None
        self.history = History()
        self.best_loss = 1e9
        self.batch_grad_norms: list = []
        self._step_fn = None
        self._pre_step_fn = None
        self._forward_fn = None
        self._epoch_fn = None
        self._epoch_metric_names: Optional[list] = None
        self._best_params = None
        self._ckpt_dirty = False

    # -- rng ---------------------------------------------------------------

    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def next_keys(self, n: int) -> np.ndarray:
        """The next ``n`` keys of the chain as one host array (one compiled
        scan + one fetch; rows feed jitted steps with no extra dispatch).
        Chain-identical to ``n`` :meth:`next_key` calls."""
        self._key, subs = _chain_split(self._key, n)
        return np.asarray(subs)

    # -- whole-epoch compiled step (tunnel-friendly fast path) ----------------
    #
    # The per-batch python loop costs, through the axon tunnel, ONE
    # host->device batch upload (~0.5 MB), ONE dispatch and ~8 scalar
    # fetches per train step (~13 s/epoch measured on the h2h US cells vs
    # ~0.2 s/epoch of actual compute).  The epoch fast path stages the whole
    # train split on device ONCE per train() call and runs each epoch as a
    # single lax.scan over shuffled batch-index rows, returning one packed
    # (n_batches, n_metrics) array — 2 round trips per epoch total.
    # Semantics are identical to the loop (same batch order, same PRNG
    # chain, same skip-counter carry; pinned by test_epoch_scan.py).

    def _build_epoch_fn(self):
        step = self._step_fn
        is_bayes = self.model.is_bayes
        names_box: Dict[str, list] = {}

        @functools.partial(jax.jit, static_argnames=("n_samples",))
        def epoch_fn(state, x_full, y_full, t, idx_rows, key_rows, fa_w,
                     epoch, grad_lim, time_mask=None, eval_mask=None,
                     n_samples=None):
            def body(state, per):
                ib, krow = per
                state, metrics = step(
                    state, x_full[ib], y_full[ib], t, None, fa_w, epoch,
                    grad_lim, rng=krow[0] if is_bayes else None,
                    time_mask=time_mask, eval_mask=eval_mask,
                    eps_key=krow[-1], n_samples=n_samples)
                names = sorted(metrics)
                names_box["names"] = names
                return state, jnp.stack([metrics[k] for k in names])

            state, packed = jax.lax.scan(body, state, (idx_rows, key_rows))
            return state, packed

        def run(state, x_full, y_full, t, idx_rows, key_rows, fa_w, epoch,
                grad_lim, time_mask=None, eval_mask=None, n_samples=None):
            state, packed = epoch_fn(state, x_full, y_full, t, idx_rows,
                                     key_rows, fa_w, epoch, grad_lim,
                                     time_mask=time_mask, eval_mask=eval_mask,
                                     n_samples=n_samples)
            self._epoch_metric_names = names_box["names"]
            return state, packed

        return run

    def _run_epoch(self, x_dev, y_dev, t_eval, idx, keys, per_batch, *,
                   fa_arr, epoch_arr, lim_arr, time_mask=None, eval_mask=None,
                   n_samples):
        """One epoch: scan over the full batches + an eager tail step.

        ``idx``: this epoch's shuffled window order (host int array);
        ``keys``: host (per_batch * n_batches, 2) PRNG rows in loop order.
        Returns the list of per-batch metric dicts (values fetched in one
        round trip for the scanned part)."""
        bs = self._scan_batch_size
        n_full = len(idx) // bs
        pending: list = []
        if n_full:
            idx_rows = jnp.asarray(
                np.asarray(idx[: n_full * bs], np.int32).reshape(n_full, bs))
            key_rows = jnp.asarray(
                keys[: per_batch * n_full].reshape(n_full, per_batch, 2))
            self.state, packed = self._epoch_fn(
                self.state, x_dev, y_dev, t_eval, idx_rows, key_rows, fa_arr,
                epoch_arr, lim_arr, time_mask=time_mask, eval_mask=eval_mask,
                n_samples=n_samples)
            vals = np.asarray(packed)  # ONE fetch for the whole epoch
            names = self._epoch_metric_names
            pending = [dict(zip(names, vals[b])) for b in range(n_full)]
        if len(idx) % bs:  # partial tail batch (torch DataLoader default)
            sel = np.asarray(idx[n_full * bs:])
            krow = keys[per_batch * n_full:]
            is_bayes = self.model.is_bayes
            self.state, metrics = self._step_fn(
                self.state, x_dev[sel], y_dev[sel], t_eval, None, fa_arr,
                epoch_arr, lim_arr, rng=krow[0] if is_bayes else None,
                time_mask=time_mask, eval_mask=eval_mask, eps_key=krow[-1],
                n_samples=n_samples)
            pending.append(metrics)
        return pending

    # -- setup ---------------------------------------------------------------

    def init_params(self, key=None) -> UDEForecasterParams:
        self.params = self.model.init(key if key is not None else self.next_key())
        return self.params

    def setup_training(self, lr: float = 1e-3):
        """Create the optimizer + jitted step (reference lib/VAE.py:112-116)."""
        if self.params is None:
            self.init_params()
        self.base_lr = lr
        # flatten: Adam runs on ONE raveled vector instead of ~40 leaves —
        # elementwise math is identical, and the per-leaf op-issue overhead
        # (~1 ms/step measured on-chip) disappears
        self.opt = optax.flatten(
            optax.inject_hyperparams(optax.adam)(learning_rate=lr))
        self.state = TrainState(
            params=self.params,
            opt_state=self.opt.init(self.params),
            tr_step=jnp.asarray(0, jnp.int32),
            skip_count=jnp.asarray(0, jnp.int32),
        )
        self._step_fn = self._build_step()
        self._epoch_fn = self._build_epoch_fn()
        self._forward_fn = jax.jit(self.model.apply, static_argnames=())

    def set_lr(self, lr: float):
        self.state = self.state._replace(
            opt_state=self._set_opt_lr(self.state.opt_state, lr))

    @staticmethod
    def _set_opt_lr(opt_state, lr):
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, opt_state.hyperparams["learning_rate"].dtype)
        return opt_state

    def decay_lr(self, decay_rate: float = 0.999, lowest: float = 1e-3):
        """Exponential decay with a floor (reference lib/utils.py:75-79)."""
        cur = float(self.state.opt_state.hyperparams["learning_rate"])
        self.set_lr(max(cur * decay_rate, lowest))

    def update_priors(self, new_std: float = 0.1):
        """Change the variational-weight prior std on a Bayes RHS
        (reference lib/VAE.py:103-110). Config change -> the jitted step
        retraces once with the new constant."""
        if not self.model.is_bayes:
            return
        self.model = dataclasses.replace(
            self.model, ode=dataclasses.replace(self.model.ode,
                                                prior_std=new_std))
        if self.opt is not None:
            self._step_fn = self._build_step()
            self._epoch_fn = self._build_epoch_fn()

    # -- jitted train step ---------------------------------------------------

    def _build_step(self):
        model = self.model
        loss_cfg = self.loss_cfg
        anneal = self.anneal
        opt = self.opt
        len_tr = self.len_tr
        prior_params = {k: list(v) for k, v in self.prior_params.items()}
        latent_dim = model.latent_dim

        from fiude_tpu.train.losses import kl_annealing

        @functools.partial(jax.jit, static_argnames=("n_samples",))
        def step(state: TrainState, x, y, t, eps, fa_w, epoch, grad_lim,
                 rng=None, time_mask=None, eval_mask=None, eps_key=None,
                 n_samples=None):
            if eps is None:
                # sample the MC draws inside the compiled step — one dispatch
                # per batch instead of two
                eps = model.sample_eps(eps_key, x.shape[0], n_samples,
                                       x.dtype)
            # reference lib/VAE.py:148-151: the anneal gate controls BOTH the
            # step counter and the kl weight (frozen at its ctor default 1
            # when disabled)
            if loss_cfg.anneal:
                tr_step = state.tr_step + 1
                kl_w = kl_annealing(tr_step, anneal)
            else:
                tr_step = state.tr_step
                kl_w = jnp.asarray(1.0, jnp.float32)

            def loss_fn(params):
                y_pred, extras = model.apply(params, x, t, eps, fa_w=fa_w,
                                             rng=rng, time_mask=time_mask)
                ode_kl = None
                if model.is_bayes:
                    from fiude_tpu.models.bayes import variational_kl
                    ode_kl = variational_kl(params.ode,
                                            getattr(model.ode, "prior_std", 0.1))
                loss, metrics = compute_loss(
                    loss_cfg, y_pred, y, extras, kl_w=kl_w,
                    latent_dim=latent_dim, len_tr=len_tr,
                    prior_params=prior_params, ode_kl=ode_kl,
                    time_mask=time_mask, eval_mask=eval_mask)
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grad_norm = optax.global_norm(grads)

            updates, new_opt_state = opt.update(grads, state.opt_state,
                                                state.params)
            new_params = optax.apply_updates(state.params, updates)

            # Skip-not-clip rule (reference lib/VAE.py:208-212).
            apply_step = ((grad_norm < grad_lim)
                          | (state.skip_count >= 4)
                          | (epoch <= 3))
            params = _tree_select(apply_step, new_params, state.params)
            opt_state = _tree_select(apply_step, new_opt_state, state.opt_state)
            skip_count = jnp.where(apply_step, 0, state.skip_count + 1).astype(jnp.int32)

            metrics = dict(metrics)
            metrics["grad_norm"] = grad_norm
            new_state = TrainState(params=params, opt_state=opt_state,
                                   tr_step=tr_step, skip_count=skip_count)
            return new_state, metrics

        return step

    # -- encoder-only pre-training (reference lib/VAE.py:225-246) -------------

    def pre_train(self, loader, epochs: int = 3, lr: float = 1e-3,
                  verbose: bool = False):
        if self.params is None:
            self.init_params()
        model, len_tr, latent_dim = self.model, self.len_tr, self.model.latent_dim
        opt = optax.adam(lr)
        enc_params = self.params.enc
        opt_state = opt.init(enc_params)

        @jax.jit
        def pre_step(enc_params, opt_state, x):
            def loss_fn(p):
                # route through the model so fused_train models pre-train
                # with the fused encoder BPTT kernel too
                mean, std = model._encode(p, x)
                return kl_z_loss(mean, std, latent_dim=latent_dim, len_tr=len_tr)

            kl, grads = jax.value_and_grad(loss_fn)(enc_params)
            updates, opt_state = opt.update(grads, opt_state, enc_params)
            return optax.apply_updates(enc_params, updates), opt_state, kl

        for epoch in range(1, epochs + 1):
            kls = []
            for x_b, _ in loader:
                enc_params, opt_state, kl = pre_step(
                    enc_params, opt_state, jnp.asarray(x_b))
                # keep device scalars; each eager float() is a serializing
                # tunnel round trip
                kls.append(kl)
            if verbose:
                print(f"pre_train epoch {epoch}: "
                      f"KL_z {np.mean([float(k) for k in kls]):.3f}")

        self.params = self.params._replace(enc=enc_params)
        if self.state is not None:
            self.state = self.state._replace(params=self.params)

    # -- training loop ---------------------------------------------------------

    def train(self, loader, t, epochs: int, eval_pts, *,
              grad_lim: float = 300.0, n_samples: int = 32,
              checkpoint: bool = False, validate: Optional[Dict] = None,
              warmup: bool = False, verbose: bool = False,
              norm_file: Optional[str] = None,
              nan_guard: bool = False,
              eps_source=None):
        """Epoch loop (reference lib/VAE.py:248-291), exact-horizon mode.

        ``t``: full time grid for this phase; ``eval_pts``: indices into ``t``
        where the loss is evaluated.  The solver runs on ``t[eval_pts]`` only
        (reference semantics: one RK step between eval points), so each new
        horizon re-traces once; use :meth:`train_curriculum_padded` for the
        single-compilation masked curriculum.

        ``eps_source``: optional iterator of per-batch MC-draw arrays
        ``(n_samples, batch, n_regions, ld_enc)`` consumed one per train step
        — used by the oracle-parity tests to tie the eps stream to the
        reference's ``torch.randn`` draws (lib/VAE.py:120).
        """
        assert self.state is not None, "call setup_training() first"
        t = jnp.asarray(t)
        eval_pts = np.asarray(eval_pts)
        start_epoch = len(self.history.epoch_history)
        # the reference resets both per train() call (lib/VAE.py:249-250) —
        # each curriculum stage restarts the best-loss checkpointing and the
        # consecutive-skip counter
        self.best_loss = 1e9
        self.state = self.state._replace(
            skip_count=jnp.asarray(0, jnp.int32))
        norms_this_train = []
        fa_arr = jnp.asarray(self.fa_w, jnp.float32)
        lim_arr = jnp.asarray(grad_lim, jnp.float32)
        is_bayes = self.model.is_bayes
        per_batch = 2 if is_bayes else 1
        # whole-epoch scan fast path: needs device-resident arrays and no
        # mid-epoch host decisions (nan_guard) or injected eps streams
        use_scan = (eps_source is None and not nan_guard
                    and hasattr(loader, "x") and hasattr(loader, "batch_size")
                    and not _env_no_scan())
        if use_scan:
            x_dev = jnp.asarray(loader.x)
            y_dev = jnp.asarray(loader.y)[:, eval_pts, :]
            t_eval_dev = t[eval_pts]
            self._scan_batch_size = loader.batch_size

        for e in range(epochs):
            epoch = e + start_epoch
            if warmup:
                self.set_lr(self.base_lr * warm_up_lr(epoch))
            epoch_arr = jnp.asarray(epoch, jnp.int32)
            # the whole epoch's PRNG chain in one dispatch (order per batch:
            # rng iff Bayes, then eps — identical to per-batch next_key());
            # with nan_guard the tail of an aborted epoch is discarded
            need_keys = eps_source is None or is_bayes
            keys = (self.next_keys(per_batch * len(loader))
                    if need_keys else None)
            if use_scan:
                pending = self._run_epoch(
                    x_dev, y_dev, t_eval_dev, loader.epoch_indices(), keys,
                    per_batch, fa_arr=fa_arr, epoch_arr=epoch_arr,
                    lim_arr=lim_arr, n_samples=n_samples)
            else:
                pending = []
                for bi, (x_b, y_b) in enumerate(loader):
                    x_b = jnp.asarray(x_b)
                    y_b = jnp.asarray(y_b)[:, eval_pts, :]
                    t_eval = t[eval_pts]
                    eps_b = (jnp.asarray(next(eps_source))
                             if eps_source is not None else None)
                    self.state, metrics = self._step_fn(
                        self.state, x_b, y_b, t_eval, eps_b, fa_arr, epoch_arr,
                        lim_arr,
                        rng=keys[per_batch * bi] if is_bayes else None,
                        eps_key=(None if eps_b is not None
                                 else keys[per_batch * bi + per_batch - 1]),
                        n_samples=n_samples)
                    # defer host fetches to epoch end so the device pipeline
                    # stays full (each float() is a serializing round trip)
                    pending.append(metrics)
                    if nan_guard and not np.isfinite(float(metrics["loss"])):
                        # crash containment (tune_encoders.py:199-200)
                        break

            epoch_norms = []
            for metrics in pending:
                gn = float(metrics["grad_norm"])
                self.batch_grad_norms.append(gn)
                epoch_norms.append(round(gn, 1))
                self.history.batch(metrics)
            self.history.reset()
            norms_this_train.append(epoch_norms)

            if validate is not None:
                val = self.validate(**validate)
                self.history.epoch_history[-1].update(val)

            if verbose:
                ep = {k: round(v, 3) for k, v in self.history.epoch_history[-1].items()}
                print(epoch + 1, ep)

            if norm_file is not None:
                import os
                d = os.path.dirname(norm_file)
                if d:
                    os.makedirs(d, exist_ok=True)
                with open(norm_file, "a") as fh:
                    fh.write(",".join(map(str, epoch_norms)) + "\n")

            if checkpoint:
                self.checkpoint()

        if checkpoint:
            self.flush_checkpoint()
        self.params = self.state.params
        return norms_this_train

    def train_curriculum_padded(self, loader, t, eval_all, epochs_per_stage,
                                *, grad_lim: float = 5000.0,
                                n_samples: int = 32, checkpoint: bool = False,
                                validate: Optional[Dict] = None,
                                verbose: bool = False,
                                norm_file: Optional[str] = None):
        """TPU-friendly growing-horizon curriculum: ONE compiled step for the
        whole schedule.

        Instead of re-tracing for every stage's grid (reference
        ``run_ode.py:147-164`` grows ``t``/``eval_pts`` per stage), the solver
        always integrates the final weekly grid ``t[eval_all]`` and the losses
        mask out steps/outputs beyond the active stage — gradients through the
        masked tail are exactly zero, so training dynamics match the exact
        mode while avoiding the per-stage recompilation storm.
        """
        assert self.state is not None, "call setup_training() first"
        t = jnp.asarray(t)
        eval_all = np.asarray(eval_all)
        K = len(eval_all)
        t_eval = t[eval_all]
        fa_arr = jnp.asarray(self.fa_w, jnp.float32)
        lim_arr = jnp.asarray(grad_lim, jnp.float32)
        is_bayes = self.model.is_bayes
        per_batch = 2 if is_bayes else 1
        use_scan = (hasattr(loader, "x") and hasattr(loader, "batch_size")
                    and not _env_no_scan())
        if use_scan:
            x_dev = jnp.asarray(loader.x)
            y_dev = jnp.asarray(loader.y)[:, eval_all, :]
            self._scan_batch_size = loader.batch_size

        for stage in range(2, K + 1):
            # each stage corresponds to one reference train() call, which
            # resets the best-loss checkpointing and skip counter
            # (lib/VAE.py:249-250)
            self.best_loss = 1e9
            self.state = self.state._replace(
                skip_count=jnp.asarray(0, jnp.int32))
            eval_mask = jnp.asarray(
                (np.arange(K) < stage).astype(np.float32))
            time_mask = jnp.asarray(
                (np.arange(K - 1) < stage - 1).astype(np.float32))
            for e in range(epochs_per_stage):
                epoch = len(self.history.epoch_history)
                epoch_arr = jnp.asarray(epoch, jnp.int32)
                keys = self.next_keys(per_batch * len(loader))
                if use_scan:
                    pending = self._run_epoch(
                        x_dev, y_dev, t_eval, loader.epoch_indices(), keys,
                        per_batch, fa_arr=fa_arr, epoch_arr=epoch_arr,
                        lim_arr=lim_arr, time_mask=time_mask,
                        eval_mask=eval_mask, n_samples=n_samples)
                else:
                    pending = []
                    for bi, (x_b, y_b) in enumerate(loader):
                        x_b = jnp.asarray(x_b)
                        y_b = jnp.asarray(y_b)[:, eval_all, :]
                        self.state, metrics = self._step_fn(
                            self.state, x_b, y_b, t_eval, None, fa_arr,
                            epoch_arr, lim_arr,
                            rng=keys[per_batch * bi] if is_bayes else None,
                            time_mask=time_mask, eval_mask=eval_mask,
                            eps_key=keys[per_batch * bi + per_batch - 1],
                            n_samples=n_samples)
                        pending.append(metrics)
                epoch_norms = []
                for metrics in pending:
                    gn = float(metrics["grad_norm"])
                    self.batch_grad_norms.append(gn)
                    epoch_norms.append(round(gn, 1))
                    self.history.batch(metrics)
                self.history.reset()
                if validate is not None:
                    self.history.epoch_history[-1].update(
                        self.validate(**validate))
                if verbose:
                    ep = {k: round(v, 3)
                          for k, v in self.history.epoch_history[-1].items()}
                    print(epoch + 1, "stage", stage, ep)
                if norm_file is not None:
                    import os
                    d = os.path.dirname(norm_file)
                    if d:
                        os.makedirs(d, exist_ok=True)
                    with open(norm_file, "a") as fh:
                        fh.write(",".join(map(str, epoch_norms)) + "\n")
                if checkpoint:
                    self.checkpoint()
            if checkpoint:
                # one npz write per stage: same end-of-stage file contents
                # as the eager per-epoch writes (each stage resets best_loss)
                self.flush_checkpoint()
        self.params = self.state.params

    # -- validation / inference ------------------------------------------------

    def forecast(self, x, t, n_samples: int = 32, key=None, fa_w=None,
                 fused: bool = False):
        """MC forecast: (B, S, T, R); reference VAE.__call__ inference path.

        ``fused=True`` runs the whole trajectory+decode as one Pallas kernel
        (serving path; SIRRates/UDE only, uniform grid)."""
        x = jnp.asarray(x)
        eps = self.model.sample_eps(key if key is not None else self.next_key(),
                                    x.shape[0], n_samples, x.dtype)
        params = self.state.params if self.state is not None else self.params
        fa_w = self.fa_w if fa_w is None else fa_w
        if fused:
            if self.model.is_bayes:
                from fiude_tpu.ops.pallas_bayes import FusedBayesForecaster
                kw = ({"fa_w": float(fa_w)}
                      if self.model.ode.ode_type == "FaFp" else {})
                seed_key = (jax.random.fold_in(key, 1)
                            if key is not None else self.next_key())
                seed = int(jax.random.randint(seed_key, (), 0, 2**31 - 1))
                return FusedBayesForecaster(self.model, params, **kw)(
                    x, t, eps, seed=seed)
            from fiude_tpu.ops.pallas_ude import FusedForecaster
            return FusedForecaster(self.model, params, fa_w=float(fa_w))(
                x, t, eps)
        y_pred, _ = (self._forward_fn or jax.jit(self.model.apply))(
            params, x, jnp.asarray(t), eps, fa_w=jnp.asarray(fa_w, jnp.float32))
        return y_pred

    def validate(self, x_test, y_test, t, scaler, n_samples: int = 32,
                 tail: int = 28, key=None):
        """Per-epoch validation NLL (reference lib/VAE.py:270-281): numpy
        (biased-std) Metrics.nll per time point on unscaled values."""
        y_pred = np.asarray(self.forecast(x_test, t, n_samples, key=key))
        scaler = np.asarray(scaler, dtype=y_pred.dtype).reshape(1, 1, 1, -1)
        y_pr = y_pred * scaler
        y_te = np.asarray(y_test) * scaler[0]
        pred_mean = y_pr.mean(1)
        pred_std = y_pr.std(1)  # numpy ddof=0 — parity with reference eval
        from fiude_tpu.utils.metrics import nll as nll_metric
        nlls = [nll_metric(y_te[:, g, :], pred_mean[:, g, :], pred_std[:, g, :])
                for g in range(len(t))]
        return {"forecast_nll": float(np.mean(nlls[-tail:])),
                "all_nll": float(np.mean(nlls))}

    # -- checkpointing (reference lib/VAE.py:293-334) ---------------------------

    def checkpoint(self):
        """Best-epoch-loss checkpoint (reference lib/VAE.py:293-306), with
        the device->host fetch deferred: improving epochs only retain a
        reference to the (immutable) device param tree; the npz is written
        once per train() call by :meth:`flush_checkpoint`.  Through the axon
        tunnel an eager per-epoch save is ~40 serializing leaf fetches."""
        prefix = self.chkpt_prefix or self.file_prefix
        if prefix is None:
            return
        last = self.history.epoch_history[-1]["loss"]
        if last < self.best_loss:
            self.best_loss = last
            self._best_params = self.state.params
            self._ckpt_dirty = True

    def flush_checkpoint(self):
        prefix = self.chkpt_prefix or self.file_prefix
        if self._ckpt_dirty and prefix is not None:
            ckpt.save_params(f"{prefix}chkpt_", self._best_params)
            self._ckpt_dirty = False

    def save(self, file_prefix: Optional[str] = None):
        prefix = file_prefix or self.file_prefix
        params = self.state.params if self.state is not None else self.params
        ckpt.save_params(prefix, params)

    def load(self, checkpoint: bool = False, file_prefix: Optional[str] = None):
        if checkpoint:
            prefix = f"{self.chkpt_prefix or self.file_prefix}chkpt_"
        else:
            prefix = file_prefix or self.file_prefix
        template = self.state.params if self.state is not None else self.params
        if template is None:
            template = self.init_params()
        params = ckpt.load_params(template, prefix, strict=False)
        self.params = params
        if self.state is not None:
            self.state = self.state._replace(params=params)
