"""Benchmark: vmapped region x ensemble UDE solves/sec on real TPU.

Workload = the reference's hottest loop at its largest committed scale
(reference run_ode.py:35-37,130 + lib/VAE.py:120,137): a full MC-ensemble
forward — encoder -> simplex reparam -> fixed-step RK4 (3/8 rule) over an
85-step daily grid -> decode — for the 49-region state config with
n_samples x batch = 64 x 32 = 2048 coupled systems of dim 49 x 8.

Metric: region x ensemble UDE trajectory solves per second
(= n_samples * batch * n_regions / forward latency).
Baseline: the north-star target of 1000 solves/sec (BASELINE.json) —
the CPU reference solves ~2048*49 systems in ~minutes per epoch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fiude_tpu.models import UDEForecaster

    n_regions, latent_dim, n_qs = 49, 8, 8
    batch, n_samples = 32, 64
    window, lag, gamma = 28, 14, 56

    model = UDEForecaster.build(
        n_regions=n_regions, latent_dim=latent_dim, n_qs=n_qs,
        ode_name="FaFp",
        enc_params={"q_sizes": (256, 128), "ff_sizes": (64, 64),
                    "SIR_scaler": [0.1, 0.05, 1.0]},
        ode_params={"net_sizes": (64, 64, 32), "aug_net_sizes": (64, 64)},
    )
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(
        0, 1, (batch, window + lag, n_regions * (n_qs + 1))).astype(np.float32))
    # test-time daily grid: window + gamma + 1 points (run_ode.py:130)
    t = jnp.arange(window + gamma + 1, dtype=jnp.float32) / 7.0
    eps = jnp.asarray(rng.standard_normal(
        (n_samples, batch, n_regions, latent_dim - 1)).astype(np.float32))

    @jax.jit
    def forward(params, x, t, eps):
        y_pred, _ = model.apply(params, x, t, eps, fa_w=1.0)
        # reduce to a scalar so the host fetch forces full execution without
        # shipping the (B,S,T,R) ensemble over the wire
        return jnp.sum(y_pred)

    # compile + warmup (block_until_ready is unreliable on the axon tunnel —
    # a host fetch of the scalar is the only trustworthy sync point)
    float(forward(params, x, t, eps))

    reps = 20
    start = time.perf_counter()
    outs = [forward(params, x, t, eps) for _ in range(reps)]
    _ = [float(o) for o in outs]
    elapsed = time.perf_counter() - start

    solves = reps * n_samples * batch * n_regions
    solves_per_sec = solves / elapsed

    baseline = 1000.0  # north-star target (BASELINE.json): >=1000 on v5e-8
    print(json.dumps({
        "metric": "ude_region_ensemble_solves_per_sec",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s (49-region x 2048-ensemble, 85-step RK4 forward)",
        "vs_baseline": round(solves_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
