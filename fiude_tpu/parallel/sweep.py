"""Population sweeps: device-parallel hyperparameter/replicate training.

The reference runs its sweeps as 24-36 independent single-threaded CPU
processes coordinating through file-locked ledgers
(``run_stuff_linux.sh:3-6``, ``run_ode.py:106-119``).  TPU-native, the same
population trains as ONE compiled program: per-member parameter/optimizer
trees are stacked along a leading ``member`` axis, the whole training step is
``vmap``-ed over it, and the member axis is sharded across the ``config``
mesh axis — every chip trains its own replicate(s) with zero inter-chip
traffic, and host code sees one step call for the entire population.

Two layers:

* :func:`make_population_train_step` / :class:`PopulationTrainer` — the
  compiled same-architecture population (different seeds / loss weights /
  fa_w ramps; the reference's ``nums`` replicate axis and the tuning
  harness's row-wise workers).
* :func:`run_work_queue` — host-side crash-resumable queue over heterogeneous
  configs (different shapes can't share one program), preserving the
  reference's claim/mark ledger protocol for multi-process/multi-host
  elasticity.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fiude_tpu.models.vae import UDEForecaster
from fiude_tpu.train.losses import AnnealConfig, LossConfig, compute_loss, kl_annealing
from fiude_tpu.train.trainer import TrainState, _tree_select
from fiude_tpu.utils.history import History
from fiude_tpu.utils.ledger import Ledger


def stack_trees(trees: Sequence[Any]):
    """Stack a list of identically-shaped pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def unstack_tree(tree, n: int):
    return [jax.tree.map(lambda x: x[i], tree) for i in range(n)]


def make_population_train_step(
    model: UDEForecaster,
    loss_cfg: LossConfig,
    opt,
    *,
    anneal: AnnealConfig = AnnealConfig(),
    len_tr: int = 130,
    prior_params: Optional[Dict] = None,
    mesh: Optional[Mesh] = None,
):
    """vmapped-over-members training step.

    Signature: ``step(states, x, y, t, eps, fa_w, epoch, grad_lim, rngs) ->
    (states, metrics)`` where ``states``/``eps``/``fa_w``/``rngs`` carry a
    leading member axis and ``x``/``y``/``t`` are shared.  With ``mesh`` the
    member axis is sharded over its ``config`` axis.
    """
    prior_params = prior_params or {"means": [0.8, 0.55], "stds": [0.2, 0.2]}
    latent_dim = model.latent_dim

    def one_member(state: TrainState, x, y, t, eps, fa_w, epoch, grad_lim, rng):
        if loss_cfg.anneal:
            tr_step = state.tr_step + 1
            kl_w = kl_annealing(tr_step, anneal)
        else:
            tr_step = state.tr_step
            kl_w = jnp.asarray(1.0, jnp.float32)

        def loss_fn(params):
            y_pred, extras = model.apply(params, x, t, eps, fa_w=fa_w, rng=rng)
            ode_kl = None
            if model.is_bayes:
                from fiude_tpu.models.bayes import variational_kl
                ode_kl = variational_kl(params.ode,
                                        getattr(model.ode, "prior_std", 0.1))
            return compute_loss(loss_cfg, y_pred, y, extras, kl_w=kl_w,
                                latent_dim=latent_dim, len_tr=len_tr,
                                prior_params=prior_params, ode_kl=ode_kl)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grad_norm = optax.global_norm(grads)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ok = (grad_norm < grad_lim) | (state.skip_count >= 4) | (epoch <= 3)
        params = _tree_select(ok, new_params, state.params)
        opt_state = _tree_select(ok, new_opt, state.opt_state)
        metrics = dict(metrics)
        metrics["grad_norm"] = grad_norm
        return (TrainState(params, opt_state, tr_step,
                           jnp.where(ok, 0, state.skip_count + 1).astype(jnp.int32)),
                metrics)

    if mesh is None and getattr(model, "fused_train", False):
        # Fused-kernel population: Mosaic cannot batch the custom_vjp
        # Pallas pair's HBM-streamed trajectory outputs under vmap, and on a
        # single chip member-parallelism buys nothing anyway — the fused
        # kernels already saturate the MXU at the folded (S*B)-row batch.
        # One lax.scan over the stacked member axis runs each member's full
        # fused fwd+bwd step back-to-back inside ONE jit (one dispatch per
        # population step from the host), so the per-member cost equals the
        # single-config fused step.
        def scan_step(states, x, y, t, eps, fa_w, epoch, grad_lim, rngs):
            def body(_, member):
                state, eps_m, fa_m, rng_m = member
                new_state, metrics = one_member(
                    state, x, y, t, eps_m, fa_m, epoch, grad_lim, rng_m)
                return None, (new_state, metrics)

            _, (new_states, metrics) = jax.lax.scan(
                body, None, (states, eps, fa_w, rngs))
            return new_states, metrics

        return jax.jit(scan_step)

    vstep = jax.vmap(one_member,
                     in_axes=(0, None, None, None, 0, 0, None, None, 0))

    if mesh is None:
        return jax.jit(vstep)

    member = NamedSharding(mesh, P("config"))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        vstep,
        in_shardings=(member, repl, repl, repl, member, member, repl, repl,
                      member),
        out_shardings=(member, member),
    )


class PopulationTrainer:
    """Train N same-architecture members simultaneously on one slice.

    The TPU-native re-expression of "launch N worker processes over the same
    data with different seeds" (reference ``run_stuff_linux.sh`` +
    ``nums`` axis).  Per-member fa_w supports running the CONN->UONN ramp as
    a population.
    """

    def __init__(self, model: UDEForecaster, n_members: int,
                 loss_cfg: LossConfig = LossConfig(),
                 *, lr: float = 1e-3, len_tr: int = 130,
                 anneal: AnnealConfig = AnnealConfig(),
                 prior_params: Optional[Dict] = None,
                 mesh: Optional[Mesh] = None, seed: int = 0,
                 member_seeds: Optional[Sequence[int]] = None,
                 ode_kl_w: Optional[float] = None):
        """``member_seeds`` pins each member to the exact PRNG chain a
        single-config :class:`~fiude_tpu.train.trainer.Trainer` with that
        seed would consume (init key, then one eps key per batch) — a
        1-member population then reproduces ``run_experiment`` bit-for-bit
        (same seed -> same params/metrics)."""
        self.model = model
        self.n_members = n_members
        if ode_kl_w is not None:
            loss_cfg = dataclasses.replace(loss_cfg, ode_kl_w=ode_kl_w)
        # flatten: per-member Adam on one raveled vector (see Trainer)
        self.opt = optax.flatten(
            optax.inject_hyperparams(optax.adam)(learning_rate=lr))
        self._key = jax.random.PRNGKey(seed)
        if member_seeds is None:
            self._member_keys = None
            keys = jax.random.split(jax.random.PRNGKey(seed), n_members)
        else:
            assert len(member_seeds) == n_members
            self._member_keys = jnp.stack(
                [jax.random.PRNGKey(int(s)) for s in member_seeds])
            keys = self._next_member_keys()
        params = stack_trees([model.init(k) for k in keys])
        opt_state = jax.vmap(self.opt.init)(params)
        self.states = TrainState(
            params=params, opt_state=opt_state,
            tr_step=jnp.zeros((n_members,), jnp.int32),
            skip_count=jnp.zeros((n_members,), jnp.int32))
        self.step_fn = make_population_train_step(
            model, loss_cfg, self.opt, anneal=anneal, len_tr=len_tr,
            prior_params=prior_params, mesh=mesh)
        self.fa_w = jnp.ones((n_members,), jnp.float32)
        self.history = [History() for _ in range(n_members)]

    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _next_member_keys(self):
        """Advance each member's Trainer-mirroring PRNG chain one split —
        all members in one vmapped dispatch (chain-identical per member)."""
        pairs = jax.vmap(jax.random.split)(self._member_keys)  # (M, 2, 2)
        self._member_keys = pairs[:, 0]
        return pairs[:, 1]

    def _batch_keys(self):
        """(rngs, eps_keys) for one step, preserving the Trainer's draw
        order (rng first iff Bayes, then eps — trainer.py train loop)."""
        if self._member_keys is None:
            eps_keys = jax.random.split(self.next_key(), self.n_members)
            rngs = jax.random.split(self.next_key(), self.n_members)
            return rngs, eps_keys
        rngs = (self._next_member_keys() if self.model.is_bayes else None)
        eps_keys = self._next_member_keys()
        return (rngs if rngs is not None else eps_keys), eps_keys

    def _build_epoch_fn(self, n_samples: int):
        """Whole-epoch lax.scan over batches — ONE dispatch + ONE packed
        metrics fetch per population epoch instead of ~4 dispatches and ~8
        member-vector fetches per batch (the same tunnel-overhead cut as
        Trainer._build_epoch_fn; key-chain order preserved per member)."""
        step = self.step_fn
        model = self.model
        is_bayes = model.is_bayes
        has_chain = self._member_keys is not None
        M = self.n_members
        names_box: Dict[str, list] = {}

        def keys_for_batch(carry):
            if has_chain:
                def advance(c):
                    pairs = jax.vmap(jax.random.split)(c)
                    return pairs[:, 0], pairs[:, 1]
                if is_bayes:
                    carry, rngs = advance(carry)
                    carry, eps_keys = advance(carry)
                else:
                    carry, eps_keys = advance(carry)
                    rngs = eps_keys
            else:
                carry, s1 = jax.random.split(carry)
                eps_keys = jax.random.split(s1, M)
                carry, s2 = jax.random.split(carry)
                rngs = jax.random.split(s2, M)
            return carry, rngs, eps_keys

        @jax.jit
        def epoch_fn(states, keycarry, x_full, y_full, t, idx_rows, fa_w,
                     epoch, grad_lim):
            def body(carry, ib):
                states, kc = carry
                x_b = x_full[ib]
                kc, rngs, eps_keys = keys_for_batch(kc)
                eps = jax.vmap(
                    lambda k: model.sample_eps(k, x_b.shape[0], n_samples,
                                               x_b.dtype))(eps_keys)
                states, metrics = step(states, x_b, y_full[ib], t, eps,
                                       fa_w, epoch, grad_lim, rngs)
                names = sorted(metrics)
                names_box["names"] = names
                return (states, kc), jnp.stack([metrics[k] for k in names])

            (states, keycarry), packed = jax.lax.scan(
                body, (states, keycarry), idx_rows)
            return states, keycarry, packed

        def run(states, keycarry, *a, **kw):
            states, keycarry, packed = epoch_fn(states, keycarry, *a, **kw)
            return states, keycarry, packed, names_box["names"]

        return run

    def train(self, loader, t, epochs: int, eval_pts, *,
              n_samples: int = 32, grad_lim: float = 5000.0):
        t = jnp.asarray(t)
        eval_pts = np.asarray(eval_pts)
        start_epoch = len(self.history[0].epoch_history)
        lim_arr = jnp.asarray(grad_lim, jnp.float32)
        from fiude_tpu.train.trainer import _env_no_scan
        use_scan = (hasattr(loader, "x") and hasattr(loader, "batch_size")
                    and not _env_no_scan())
        if use_scan:
            x_dev = jnp.asarray(loader.x)
            y_dev = jnp.asarray(loader.y)[:, eval_pts, :]
            t_eval = t[eval_pts]
            bs = loader.batch_size
            if not hasattr(self, "_epoch_runs"):
                self._epoch_runs = {}
            if n_samples not in self._epoch_runs:  # one jit wrapper per width
                self._epoch_runs[n_samples] = self._build_epoch_fn(n_samples)
            epoch_run = self._epoch_runs[n_samples]
        for e in range(epochs):
            epoch = e + start_epoch
            epoch_arr = jnp.asarray(epoch, jnp.int32)
            if use_scan:
                idx = loader.epoch_indices()
                n_full = len(idx) // bs
                keycarry = (self._member_keys if self._member_keys is not None
                            else self._key)
                per_batch = []
                if n_full:
                    idx_rows = jnp.asarray(
                        np.asarray(idx[: n_full * bs],
                                   np.int32).reshape(n_full, bs))
                    self.states, keycarry, packed, names = epoch_run(
                        self.states, keycarry, x_dev, y_dev, t_eval, idx_rows,
                        self.fa_w, epoch_arr, lim_arr)
                    vals = np.asarray(packed)  # ONE fetch per epoch
                    per_batch = [
                        {k: vals[b, j] for j, k in enumerate(names)}
                        for b in range(n_full)]
                if self._member_keys is not None:
                    self._member_keys = keycarry
                else:
                    self._key = keycarry
                if len(idx) % bs:  # partial tail batch, eager
                    sel = np.asarray(idx[n_full * bs:])
                    rngs, eps_keys = self._batch_keys()
                    x_b = x_dev[sel]
                    eps = jax.vmap(
                        lambda k: self.model.sample_eps(
                            k, x_b.shape[0], n_samples, x_b.dtype))(eps_keys)
                    self.states, metrics = self.step_fn(
                        self.states, x_b, y_dev[sel], t_eval, eps, self.fa_w,
                        epoch_arr, lim_arr, rngs)
                    m_host = {k: np.asarray(v) for k, v in metrics.items()}
                    per_batch.append(m_host)
                for m_host in per_batch:
                    for i in range(self.n_members):
                        self.history[i].batch(
                            {k: v[i] for k, v in m_host.items()})
                for h in self.history:
                    h.reset()
                continue
            pending = []
            for x_b, y_b in loader:
                x_b = jnp.asarray(x_b)
                y_b = jnp.asarray(y_b)[:, eval_pts, :]
                rngs, eps_keys = self._batch_keys()
                eps = jax.vmap(
                    lambda k: self.model.sample_eps(k, x_b.shape[0], n_samples,
                                                    x_b.dtype)
                )(eps_keys)
                self.states, metrics = self.step_fn(
                    self.states, x_b, y_b, t[eval_pts], eps, self.fa_w,
                    epoch_arr, lim_arr, rngs)
                pending.append(metrics)  # host fetch deferred to epoch end
            for metrics in pending:
                m_host = {k: np.asarray(v) for k, v in metrics.items()}
                for i in range(self.n_members):
                    self.history[i].batch({k: v[i] for k, v in m_host.items()})
            for h in self.history:
                h.reset()

    def member_params(self, i: int):
        return jax.tree.map(lambda x: x[i], self.states.params)

    def epoch_losses(self) -> np.ndarray:
        return np.asarray([h.epoch_history[-1]["loss"] for h in self.history])


def group_configs_for_population(configs: Sequence[Any]):
    """Group sweep configs that share shapes/data into population batches.

    Configs differing only in the replicate id ``num`` train as ONE
    device-parallel population (same dataset, same architecture, different
    seeds) — the TPU-native form of the reference's `nums` axis.  Returns a
    list of lists.
    """
    groups: Dict[tuple, List[Any]] = {}
    for cfg in configs:
        key = tuple(sorted(
            (k, v) for k, v in dataclasses.asdict(cfg).items() if k != "num"))
        groups.setdefault(key, []).append(cfg)
    return list(groups.values())


def run_population_experiment(group: Sequence[Any], *,
                              data_root: Optional[str] = None,
                              synthetic: bool = False,
                              weights_root: str = ".",
                              results_file: Optional[str] = None,
                              mesh: Optional[Mesh] = None,
                              fused_train: bool = False,
                              seed: int = 0) -> List[Dict]:
    """Train a same-shape config group as one compiled population and record
    per-member results (the device-parallel run_ode.py unit).

    Members share the dataset (they differ only by seed/num); the growing-
    horizon curriculum runs in lock-step across members.
    """
    import jax.numpy as jnp

    from fiude_tpu.models import UDEForecaster
    from fiude_tpu.train.checkpoint import save_params
    from fiude_tpu.train.experiment import _build_data
    from fiude_tpu.train.losses import TRAINING_INFO
    from fiude_tpu.data.loader import ArrayLoader
    from fiude_tpu.utils.results import evaluate_forecast, upsert_results_row

    cfg0 = group[0]
    x_tr, y_tr, x_te, y_te, scaler = _build_data(cfg0, data_root, synthetic,
                                                 seed=seed)
    loader = ArrayLoader(x_tr, y_tr, batch_size=cfg0.batch_size, seed=seed)
    model = UDEForecaster.build(**cfg0.model_kwargs())
    if fused_train and mesh is None:
        # single-chip fused populations scan members through the Pallas
        # fwd+bwd kernels; the sharded (mesh) step stays on the XLA path
        # (see make_population_train_step)
        model = dataclasses.replace(model, fused_train=True,
                                    fused_stats=True)
    pop = PopulationTrainer(
        model, n_members=len(group), loss_cfg=TRAINING_INFO[cfg0.ode_name],
        lr=cfg0.lr, mesh=mesh, seed=seed,
        # pin each member to the PRNG chain run_experiment's Trainer uses
        # for that config (build_trainer seeds with seed + cfg.num)
        member_seeds=[seed + c.num for c in group],
        ode_kl_w=1 / 153 if cfg0.ode_name.endswith("b") else None)

    t = jnp.arange(cfg0.window_size + cfg0.gamma + 1, dtype=jnp.float32) / 7.0
    eval_all = list(np.linspace(0, cfg0.gamma, int(cfg0.gamma / 7) + 1,
                                dtype=int))
    epochs_per_cycle = max(int(cfg0.epochs / (len(eval_all) - 1)), 1)
    for i in range(2, len(eval_all) + 1):
        eval_pts = eval_all[:i]
        pop.train(loader, t[: eval_pts[-1] + 1], epochs_per_cycle, eval_pts,
                  n_samples=cfg0.n_samples, grad_lim=cfg0.grad_lim)

    results = []
    for m, cfg in enumerate(group):
        params = pop.member_params(m)
        save_params(
            __import__("os").path.join(weights_root, "weights", cfg.key),
            params)
        eps = model.sample_eps(jax.random.fold_in(jax.random.PRNGKey(seed), m),
                               x_te.shape[0], 128, jnp.float32)
        y_pred, _ = jax.jit(model.apply)(params, jnp.asarray(x_te), t, eps)
        values = evaluate_forecast(np.asarray(y_pred),
                                   np.asarray(y_te[:, : len(t)]),
                                   np.asarray(scaler),
                                   window_size=cfg.window_size,
                                   test_season=cfg.test_season)
        if results_file is not None:
            upsert_results_row(results_file,
                               {"epochs": cfg.epochs, "gamma": cfg.gamma,
                                "ode_name": cfg.ode_name, "region": cfg.region,
                                "latent_dim": cfg.latent_dim,
                                "window_size": cfg.window_size,
                                "num": cfg.num},
                               values)
        results.append(values)
    return results


def run_work_queue(
    configs: Sequence[Any],
    worker: Callable[[Any], Dict],
    *,
    ledger: Optional[Ledger] = None,
    key_fn: Callable[[Any], str] = lambda c: c.key,
    on_result: Optional[Callable[[Any, Dict], None]] = None,
    reraise: bool = False,
) -> List[Optional[Dict]]:
    """Crash-resumable queue over heterogeneous configs.

    Claim -> run -> mark finished/failed, preserving the reference protocol
    (run_ode.py:106-119,167-170) so multiple hosts/processes can share one
    ledger file.
    """
    results: List[Optional[Dict]] = []
    for cfg in configs:
        key = key_fn(cfg)
        if ledger is not None and not ledger.claim(key):
            results.append(None)
            continue
        try:
            out = worker(cfg)
            if on_result is not None:
                on_result(cfg, out)
            if ledger is not None:
                ledger.mark(key, "finished")
            results.append(out)
        except Exception:
            if ledger is not None:
                ledger.mark(key, "failed")
            if reraise:
                raise
            results.append(None)
    return results
