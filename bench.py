"""Benchmark: region x ensemble UDE solves/sec on real TPU.

Workload = the reference's hottest loop at its largest committed scale
(reference run_ode.py:35-37,130 + lib/VAE.py:120,137): full MC-ensemble
forecasts — encoder -> simplex reparam -> 85-step RK4(3/8) -> decode — for
the 49-region state config with n_samples x batch = 64 x 32 = 2048 coupled
systems of dim 49 x 8 = 392.

The serving path runs the whole trajectory+decode as ONE fused Pallas kernel
(fiude_tpu/ops/pallas_ude.py).  Eight independent MC rounds run inside one
jit (lax.scan over fresh eps draws) so the measurement amortizes the axon
tunnel's ~30 ms per-dispatch overhead the way a real serving/training loop
does; the final scalar is fetched to host (the only reliable sync on this
platform).

Metric: region x ensemble UDE trajectory solves per second
(= rounds * n_samples * batch * n_regions / elapsed).
Baseline: the north-star target of 1000 solves/sec (BASELINE.json).

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
Secondary lines on stderr (captured in the driver artifact's tail):
  train_step        — full fused training step, state UONN, weekly grid
  population_step   — 8-member fused population step
  bayes_train_step  — fused Bayes (UONNb) training step on the daily
                      85-point grid vs the XLA scan path

Robustness (the round-3 bench died rc=1 on one transient tunnel outage):
the axon backend is probed in a SUBPROCESS with a timeout (a downed tunnel
makes jax.devices() hang, not raise) and retried with backoff for ~10 min;
all chip work serializes through the advisory chip lock
(fiude_tpu/utils/chiplock.py); the secondary sections are individually
guarded so a mid-run flap still yields the primary JSON line.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

PROBE_SNIPPET = "import jax; jax.devices(); print('ok')"
# (sleep_before, probe_timeout) per attempt — ~10 min worst case total
PROBE_SCHEDULE = [(0, 150), (20, 150), (40, 150), (90, 150), (180, 240)]


def wait_for_backend() -> bool:
    """True once the ambient JAX backend initializes in a fresh subprocess.

    A fresh process per probe matters twice over: jax caches backend-init
    *failures* process-wide, and a downed axon tunnel HANGS jax.devices()
    rather than raising (observed >500 s in round 3) — only a subprocess
    timeout recovers from that.
    """
    for i, (sleep_s, probe_timeout) in enumerate(PROBE_SCHEDULE):
        if sleep_s:
            print(f"[bench] backend probe {i}: sleeping {sleep_s}s before "
                  "retry", file=sys.stderr, flush=True)
            time.sleep(sleep_s)
        try:
            out = subprocess.run(
                [sys.executable, "-c", PROBE_SNIPPET],
                capture_output=True, text=True, timeout=probe_timeout)
            if out.returncode == 0 and "ok" in out.stdout:
                return True
            tail = (out.stderr or out.stdout).strip().splitlines()[-1:]
            print(f"[bench] backend probe {i} failed (rc={out.returncode}): "
                  f"{tail}", file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"[bench] backend probe {i} hung >{probe_timeout}s "
                  "(tunnel down?)", file=sys.stderr, flush=True)
    return False


def main():
    from fiude_tpu.utils.chiplock import chip_lock

    with chip_lock(timeout=900, proceed_on_timeout=True):
        if not wait_for_backend():
            print("[bench] axon backend unavailable after all probe "
                  "retries; no measurement possible", file=sys.stderr,
                  flush=True)
            sys.exit(1)
        run_benchmarks()


def run_benchmarks():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: a bench run (or any chip job) warms the
    # cache the next cold process hits, cutting remote Mosaic compiles from
    # minutes to seconds (cache survives across processes, not reboots)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from fiude_tpu.models import UDEForecaster
    from fiude_tpu.models.vae import reparam
    from fiude_tpu.ops.pallas_ude import (
        FusedForecaster, fused_trajectory_decode, to_cm,
    )

    n_regions, latent_dim, n_qs = 49, 8, 8
    batch, n_samples = 32, 64
    window, lag, gamma = 28, 14, 56
    rounds = 8

    model = UDEForecaster.build(
        n_regions=n_regions, latent_dim=latent_dim, n_qs=n_qs,
        ode_name="FaFp",
        enc_params={"q_sizes": (256, 128), "ff_sizes": (64, 64),
                    "SIR_scaler": [0.1, 0.05, 1.0]},
        ode_params={"net_sizes": (64, 64, 32), "aug_net_sizes": (64, 64)},
    )
    params = model.init(jax.random.PRNGKey(0))
    fused = FusedForecaster(model, params, fa_w=1.0, tile_b=1024)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(
        0, 1, (batch, window + lag, n_regions * (n_qs + 1))).astype(np.float32))
    # test-time daily grid: window + gamma + 1 points (run_ode.py:130)
    T = window + gamma + 1
    t = np.arange(T, dtype=np.float32) / 7.0
    dt = float(t[1] - t[0])
    keys = jax.random.split(jax.random.PRNGKey(1), rounds)

    enc_apply = model.encoder.apply
    weights, dec_w, dec_b = fused.weights, fused.dec_w, fused.dec_b
    n_fp, n_aug = fused.n_fp_layers, fused.n_aug_layers

    @jax.jit
    def serve(params, x, keys):
        mean, std = enc_apply(params.enc, x)

        def round_fn(acc, key):
            eps = jax.random.normal(
                key, (n_samples, batch, n_regions, latent_dim - 1),
                jnp.float32)
            z = reparam(eps, std, mean) + 1e-5
            y = fused_trajectory_decode(
                to_cm(z), weights, dec_w, dec_b, T=T, dt=dt,
                R=n_regions, L=latent_dim, n_fp_layers=n_fp,
                n_aug_layers=n_aug, fa_w=1.0, tile_b=1024)
            return acc + jnp.sum(y), None

        acc, _ = jax.lax.scan(round_fn, jnp.asarray(0.0, jnp.float32), keys)
        return acc

    # compile + warmup (host fetch is the sync point); one retry absorbs a
    # transient tunnel flap between the probe and the first real dispatch
    for attempt in range(2):
        try:
            float(serve(params, x, keys))
            break
        except Exception as e:
            if attempt == 1:
                raise
            print(f"[bench] warmup failed ({type(e).__name__}); retrying "
                  "in 60s", file=sys.stderr, flush=True)
            time.sleep(60)

    # best-of-3 measurement: the axon tunnel shares the chip, so individual
    # trials see external contention; the max is the machine's capability
    reps = 5
    best = 0.0
    for _ in range(3):
        start = time.perf_counter()
        outs = [serve(params, x, keys) for _ in range(reps)]
        _ = [float(o) for o in outs]
        elapsed = time.perf_counter() - start
        solves = reps * rounds * n_samples * batch * n_regions
        best = max(best, solves / elapsed)
    solves_per_sec = best

    # -- secondary sections (stderr lines; each guarded so a flap mid-run
    # -- can't cost the primary artifact) -----------------------------------
    import dataclasses
    try:
        train_ms = bench_train_step(
            dataclasses.replace(model, fused_train=True, fused_stats=True),
            params)
        print(f"train_step: {train_ms:.2f} ms/step "
              f"({1000.0 / train_ms:.0f} steps/s, state UONN, 64x32 ensemble, "
              "8 weekly RK4 steps, fused fwd+bwd backprop through the solver)",
              file=sys.stderr, flush=True)
    except Exception as e:
        print(f"[bench] train_step section failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)

    try:
        pop_ms, n_members = bench_population_step(
            dataclasses.replace(model, fused_train=True, fused_stats=True))
        print(f"population_step: {pop_ms:.2f} ms/step for {n_members} members "
              f"({n_members * 1000.0 / pop_ms:.0f} member-steps/s — the "
              "reference trains one replicate per CPU process)",
              file=sys.stderr, flush=True)
    except Exception as e:
        print(f"[bench] population_step section failed: "
              f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)

    try:
        fused_ms, scan_ms = bench_bayes_train_step()
        print(f"bayes_train_step: {fused_ms:.2f} ms/step fused vs "
              f"{scan_ms:.2f} ms/step XLA scan (state UONNb, 64x32 ensemble, "
              "daily 85-point grid, per-eval weight noise; "
              "ops/pallas_bayes_train.py)", file=sys.stderr, flush=True)
    except Exception as e:
        print(f"[bench] bayes_train_step section failed: "
              f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)

    baseline = 1000.0  # north-star target (BASELINE.json): >=1000 on v5e-8
    print(json.dumps({
        "metric": "ude_region_ensemble_solves_per_sec",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s (49-region x 2048-ensemble, 85-step RK4, fused kernel)",
        "vs_baseline": round(solves_per_sec / baseline, 3),
    }))


def bench_train_step(model, params, *, batch=32, n_samples=64,
                     n_weekly=8, steps=40):
    """ms/step of the full jitted training step (loss stack + backprop
    through the RK4 scan + Adam + skip rule) at the state-config shape —
    the reference's hot loop (lib/VAE.py:200-223).  Steps are dispatched
    back-to-back and synced once at the end, amortizing the tunnel."""
    import jax
    import jax.numpy as jnp
    import time as _time

    from fiude_tpu.train.losses import TRAINING_INFO
    from fiude_tpu.train.trainer import Trainer

    n_regions = model.n_regions
    n_qs = (model.encoder.n_qs if hasattr(model.encoder, "n_qs") else 8)
    trainer = Trainer(model, loss_cfg=TRAINING_INFO["UONN"], len_tr=130)
    trainer.params = params
    trainer.setup_training(lr=1e-3)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(
        0, 1, (batch, 42, n_regions * (n_qs + 1))).astype(np.float32))
    t_eval = jnp.arange(n_weekly, dtype=jnp.float32)
    y = jnp.asarray(rng.uniform(
        0, 1, (batch, n_weekly, n_regions)).astype(np.float32))

    fa_arr = jnp.asarray(1.0, jnp.float32)
    ep_arr = jnp.asarray(4, jnp.int32)
    lim_arr = jnp.asarray(5000.0, jnp.float32)

    def run(n):
        state = trainer.state
        metrics = None
        # the epoch's key chain in one dispatch, like Trainer.train
        keys = trainer.next_keys(n)
        for i in range(n):
            state, metrics = trainer._step_fn(
                state, x, y, t_eval, None, fa_arr, ep_arr, lim_arr,
                eps_key=keys[i], n_samples=n_samples)
        return float(metrics["loss"])  # host fetch = sync

    run(2)  # compile + warmup
    best = float("inf")
    for _ in range(3):
        start = _time.perf_counter()
        run(steps)
        best = min(best, (_time.perf_counter() - start) / steps)
    return best * 1000.0


def bench_bayes_train_step(*, batch=32, n_samples=64, n_daily=85, steps=20):
    """ms/step of the full jitted Bayes training step on the daily grid —
    the `testing_no_interpolation` shape where the fused variational kernels
    (ops/pallas_bayes_train.py) beat the XLA scan hardest.  Reference hot
    loop: lib/in_development/models_bayes.py:69-265 under
    lib/VAE.py:137,200-223.  Returns (fused_ms, scan_ms)."""
    import dataclasses
    import time as _time

    import jax
    import jax.numpy as jnp

    from fiude_tpu.models import UDEForecaster
    from fiude_tpu.train.losses import TRAINING_INFO
    from fiude_tpu.train.trainer import Trainer

    n_regions, latent_dim, n_qs = 49, 8, 8
    model = UDEForecaster.build(
        n_regions=n_regions, latent_dim=latent_dim, n_qs=n_qs,
        ode_name="UONNb",
        enc_params={"q_sizes": (256, 128), "ff_sizes": (64, 64),
                    "SIR_scaler": [0.1, 0.05, 1.0]},
        ode_params={"net_sizes": (64, 64, 32), "aug_net_sizes": (64, 64)},
    )
    params = model.init(jax.random.PRNGKey(3))

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(
        0, 1, (batch, 42, n_regions * (n_qs + 1))).astype(np.float32))
    # daily grid: eval at every point (testing_no_interpolation.py:84-89)
    t_eval = jnp.arange(n_daily, dtype=jnp.float32)
    y = jnp.asarray(rng.uniform(
        0, 1, (batch, n_daily, n_regions)).astype(np.float32))

    fa_arr = jnp.asarray(1.0, jnp.float32)
    ep_arr = jnp.asarray(4, jnp.int32)
    lim_arr = jnp.asarray(5000.0, jnp.float32)

    def measure(fused: bool) -> float:
        m = dataclasses.replace(model, fused_train=fused, fused_stats=fused)
        trainer = Trainer(m, loss_cfg=TRAINING_INFO["UONNb"], len_tr=130,
                          ode_kl_w=1 / 153)
        trainer.params = params
        trainer.setup_training(lr=1e-3)

        def run(n):
            state = trainer.state
            metrics = None
            keys = trainer.next_keys(2 * n)  # rng + eps per step, like train
            for i in range(n):
                state, metrics = trainer._step_fn(
                    state, x, y, t_eval, None, fa_arr, ep_arr, lim_arr,
                    rng=keys[2 * i], eps_key=keys[2 * i + 1],
                    n_samples=n_samples)
            return float(metrics["loss"])  # host fetch = sync

        run(2)  # compile + warmup
        best = float("inf")
        for _ in range(3):
            start = _time.perf_counter()
            run(steps)
            best = min(best, (_time.perf_counter() - start) / steps)
        return best * 1000.0

    return measure(True), measure(False)


def bench_population_step(model, *, n_members=8, batch=32, n_samples=64,
                          n_weekly=8, steps=20):
    """ms/step of one vmapped population step (n_members same-architecture
    replicates training concurrently on ONE chip) — the TPU-native form of
    the reference's one-replicate-per-CPU-process sweep
    (run_stuff_linux.sh:3-6).  Same amortized methodology as
    :func:`bench_train_step`."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from fiude_tpu.parallel.sweep import PopulationTrainer
    from fiude_tpu.train.losses import TRAINING_INFO

    n_regions = model.n_regions
    n_qs = (model.encoder.n_qs if hasattr(model.encoder, "n_qs") else 8)
    pop = PopulationTrainer(model, n_members=n_members,
                            loss_cfg=TRAINING_INFO["UONN"], lr=1e-3)

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(
        0, 1, (batch, 42, n_regions * (n_qs + 1))).astype(np.float32))
    t_eval = jnp.arange(n_weekly, dtype=jnp.float32)
    y = jnp.asarray(rng.uniform(
        0, 1, (batch, n_weekly, n_regions)).astype(np.float32))

    def run(n):
        states = pop.states
        metrics = None
        for i in range(n):
            rngs, eps_keys = pop._batch_keys()
            eps = jax.vmap(
                lambda k: model.sample_eps(k, batch, n_samples, x.dtype)
            )(eps_keys)
            states, metrics = pop.step_fn(
                states, x, y, t_eval, eps, pop.fa_w,
                jnp.asarray(4, jnp.int32), jnp.asarray(5000.0, jnp.float32),
                rngs)
        return float(jnp.sum(metrics["loss"]))  # host fetch = sync

    run(2)  # compile + warmup
    best = float("inf")
    for _ in range(3):
        start = _time.perf_counter()
        run(steps)
        best = min(best, (_time.perf_counter() - start) / steps)
    return best * 1000.0, n_members


if __name__ == "__main__":
    main()
