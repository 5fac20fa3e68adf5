"""Gradient/value parity of the fused Bayes TRAINING kernel pair
(ops/pallas_bayes_train.py) against a pure-JAX oracle with injected noise,
plus zero-std equivalence with the deterministic fused training kernel.

The oracle replays the exact packed-weight math (``_rhs_forward`` in plain
XLA) with the SAME per-evaluation noise the kernels consume, so values AND
every cotangent (means, stds, z0, fa_w) must match to float32 tolerance.
Reference math: ``lib/in_development/models_bayes.py:30-48,69-265``.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiude_tpu.ops.pallas_train import _rhs_forward
from fiude_tpu.ops.pallas_ude import _build_plan
from fiude_tpu.ops.pallas_bayes_train import fused_bayes_train_trajectory


def _rand_net(key, sizes):
    """Random (w, b) flat list in the CM-packed layout the kernels consume
    (the permutation itself is identity-tested elsewhere; here we feed the
    packed space directly)."""
    flat = []
    for i in range(len(sizes) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        flat.append(0.4 * jax.random.normal(k1, (sizes[i], sizes[i + 1]),
                                            jnp.float32))
        flat.append(0.1 * jax.random.normal(k2, (1, sizes[i + 1]),
                                            jnp.float32))
    return key, flat


def _pack(flat, n_fp, n_aug, R, L):
    tail_w = (L - 3) * R
    if n_fp > 0 and n_aug > 0:
        w0 = jnp.concatenate([flat[0], flat[2 * n_fp]], axis=1)
        b0 = jnp.concatenate([flat[1], flat[2 * n_fp + 1]], axis=1)
    else:
        w0, b0 = flat[0], flat[1]
    w0h = w0[: 3 * R]
    w0t = w0[3 * R:] if tail_w else jnp.zeros((1, w0.shape[1]), jnp.float32)
    plan, arrs = _build_plan(tuple(flat), n_fp, n_aug)
    return plan, (w0h, w0t, b0) + tuple(arrs)


def _oracle(means_flat, stds_flat, z_cm, fa_w, dts, noise, *, T, R, L,
            n_fp, n_aug):
    """Plain-XLA replay of the fused kernel's math with injected noise."""
    plan, means = _pack(means_flat, n_fp, n_aug, R, L)
    _, stds = _pack(stds_flat, n_fp, n_aug, R, L)
    tail_w = (L - 3) * R
    B = z_cm.shape[0]
    zh = z_cm[:, : 3 * R]
    z_tail = z_cm[:, 3 * R:] if tail_w else jnp.zeros((B, 1), jnp.float32)
    mechanistic = n_fp > 0

    def f(u, e):
        ws = [means[k] + noise[k][e] * stds[k] for k in range(len(means))]
        c_tail = (z_tail @ ws[1] + ws[2]) if tail_w else ws[2]
        return _rhs_forward(u, c_tail, ws[3:], ws[0], plan, R,
                            fa_w, mechanistic)

    traj = [zh]
    rates_all, fa_all = [], []

    def collect(out):
        field, rates, fa = out
        if rates is not None:
            rates_all.append(rates)
        if fa is not None:
            fa_all.append(fa)
        return field

    for i in range(T - 1):
        dt = dts[i]
        e = 4 * i
        k1 = collect(f(zh, e))
        k2 = collect(f(zh + dt * k1 * (1.0 / 3.0), e + 1))
        k3 = collect(f(zh + dt * (k2 - k1 * (1.0 / 3.0)), e + 2))
        k4 = collect(f(zh + dt * (k1 - k2 + k3), e + 3))
        zh = zh + dt * (k1 + 3.0 * (k2 + k3) + k4) * 0.125
        traj.append(zh)

    traj = jnp.stack(traj)
    rates = jnp.stack(rates_all) if rates_all else None
    fa = jnp.stack(fa_all) if fa_all else None
    return traj, rates, fa


def _make_noise(key, means_flat, n_fp, n_aug, R, L, n_evals):
    _, packed = _pack(means_flat, n_fp, n_aug, R, L)
    noise = []
    for w in packed:
        key, k = jax.random.split(key)
        noise.append(jax.random.normal(k, (n_evals,) + w.shape, jnp.float32))
    return key, tuple(noise)


CONFIGS = {
    # (n_fp sizes, n_aug sizes): UONNb / CONNb / SONNb shapes (tiny)
    "UONNb": dict(R=3, L=8, fp=(24, 12, 10), aug=(24, 16, 9)),
    "CONNb": dict(R=3, L=8, fp=(24, 12, 10, 6), aug=None),
    "SONNb": dict(R=3, L=8, fp=None, aug=(24, 16, 9)),
}


def _build_case(name, key, T=4, B=16):
    cfg = CONFIGS[name]
    R, L = cfg["R"], cfg["L"]
    D = L * R
    means_flat, stds_flat = [], []
    n_fp = n_aug = 0
    if cfg["fp"] is not None:
        sizes = (D,) + cfg["fp"] + (2 * R,)
        key, flat = _rand_net(key, sizes)
        means_flat += flat
        n_fp = len(sizes) - 1
    if cfg["aug"] is not None:
        sizes = (D,) + cfg["aug"] + (3 * R,)
        key, flat = _rand_net(key, sizes)
        means_flat += flat
        n_aug = len(sizes) - 1
    # stds: small positive (the kernel consumes |std| pre-applied)
    for m in means_flat:
        key, k = jax.random.split(key)
        stds_flat.append(0.05 * jnp.abs(jax.random.normal(k, m.shape,
                                                          jnp.float32)))
    key, kz = jax.random.split(key)
    z_cm = 0.3 + 0.1 * jax.random.normal(kz, (B, D), jnp.float32)
    dts = jnp.asarray(np.full(T - 1, 0.23), jnp.float32)
    key, noise = _make_noise(key, means_flat, n_fp, n_aug, R, L, 4 * (T - 1))
    return dict(means=tuple(means_flat), stds=tuple(stds_flat), z=z_cm,
                dts=dts, noise=noise, R=R, L=L, T=T, n_fp=n_fp, n_aug=n_aug)


def _loss_of(out):
    traj, rates, fa = out
    s = jnp.sum(traj * jnp.cos(0.1 * traj))
    if rates is not None:
        s = s + 0.5 * jnp.sum(jnp.sin(rates))
    if fa is not None:
        s = s + 0.25 * jnp.sum(fa ** 2)
    return s


@pytest.mark.parametrize("name", list(CONFIGS))
def test_injected_noise_value_and_grad_parity(name):
    case = _build_case(name, jax.random.PRNGKey(hash(name) % (2 ** 31)))
    kw = dict(T=case["T"], R=case["R"], L=case["L"],
              n_fp_layers=case["n_fp"], n_aug_layers=case["n_aug"])

    def fused(means, stds, z, fa_w):
        return fused_bayes_train_trajectory(
            means, stds, z, fa_w, case["dts"], jnp.int32(0),
            noise=case["noise"], **kw)

    def oracle(means, stds, z, fa_w):
        return _oracle(means, stds, z, fa_w, case["dts"], case["noise"],
                       T=case["T"], R=case["R"], L=case["L"],
                       n_fp=case["n_fp"], n_aug=case["n_aug"])

    args = (case["means"], case["stds"], case["z"], jnp.float32(0.7))
    out_f = fused(*args)
    out_o = oracle(*args)
    for a, b, what in zip(out_f, out_o, ("traj", "rates", "fa")):
        if b is None:
            assert a is None
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5, err_msg=what)

    g_f = jax.grad(lambda *a: _loss_of(fused(*a)), argnums=(0, 1, 2, 3))(
        *args)
    g_o = jax.grad(lambda *a: _loss_of(oracle(*a)), argnums=(0, 1, 2, 3))(
        *args)
    for gf, go, what in zip(g_f, g_o, ("means", "stds", "z", "fa_w")):
        for leaf_f, leaf_o in zip(jax.tree.leaves(gf), jax.tree.leaves(go)):
            scale = max(1.0, float(jnp.max(jnp.abs(leaf_o))))
            np.testing.assert_allclose(
                np.asarray(leaf_f), np.asarray(leaf_o),
                rtol=5e-5, atol=5e-5 * scale, err_msg=what)


def test_zero_std_matches_deterministic_kernel():
    """With |std| = 0 the Bayes path is the deterministic path: values and
    the mean-weight cotangents must coincide with ops/pallas_train."""
    from fiude_tpu.ops.pallas_train import fused_train_trajectory

    case = _build_case("UONNb", jax.random.PRNGKey(7))
    kw = dict(T=case["T"], R=case["R"], L=case["L"],
              n_fp_layers=case["n_fp"], n_aug_layers=case["n_aug"])
    zeros = tuple(jnp.zeros_like(s) for s in case["stds"])

    def fused_b(means, z, fa_w):
        return fused_bayes_train_trajectory(
            means, zeros, z, fa_w, case["dts"], jnp.int32(3),
            noise=case["noise"], **kw)

    def fused_d(means, z, fa_w):
        return fused_train_trajectory(means, z, fa_w, case["dts"], **kw)

    args = (case["means"], case["z"], jnp.float32(0.7))
    out_b, out_d = fused_b(*args), fused_d(*args)
    for a, b in zip(out_b, out_d):
        if b is None:
            assert a is None
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    g_b = jax.grad(lambda *a: _loss_of(fused_b(*a)), argnums=(0, 1, 2))(
        *args)
    g_d = jax.grad(lambda *a: _loss_of(fused_d(*a)), argnums=(0, 1, 2))(
        *args)
    # grads reassociate slightly: the Bayes backward contracts a @ w^T via
    # dot_general where the deterministic kernel feeds a materialized w^T
    for gf, go in zip(jax.tree.leaves(g_b), jax.tree.leaves(g_d)):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(go),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ode_name", ["UONNb", "CONNb", "SONNb"])
def test_model_level_fused_bayes_apply(ode_name):
    """UDEForecaster(fused_train=True) routes Bayes families through the
    fused kernel pair: forward shapes/finiteness + finite grads end to end.
    (On CPU the Mosaic interpreter stubs the on-core PRNG to zeros — the
    mean-weight trajectory — so this checks plumbing, not noise.)"""
    from fiude_tpu.models import UDEForecaster

    model = UDEForecaster.build(
        n_regions=3, latent_dim=8, n_qs=5, ode_name=ode_name,
        ode_params={"net_sizes": (16, 12), "aug_net_sizes": (16, 12)},
        enc_params={"q_sizes": (16, 12), "ff_sizes": (8,)},
        fused_train=True)
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    x = jax.random.normal(key, (4, 9, 3 * 6), jnp.float32)
    t = jnp.arange(5, dtype=jnp.float32) / 7.0
    eps = model.sample_eps(key, 4, 2)

    def loss(p):
        y, extras = model.apply(p, x, t, eps, fa_w=0.5,
                                rng=jax.random.PRNGKey(1))
        s = jnp.sum(y ** 2)
        for leaf in jax.tree.leaves(extras.aux):
            s = s + jnp.sum(leaf ** 2)
        return s

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # on real TPU hardware the on-core PRNG is live, so the variational std
    # leaves must receive nonzero cotangents (z = 0 under the CPU
    # interpreter stub -> exactly zero there, which is the correct chain)
    if jax.devices()[0].platform == "tpu":
        g_ode = grads.ode
        std_leaves = [l.w_std for l in jax.tree.leaves(
            g_ode, is_leaf=lambda x: hasattr(x, "w_std"))]
        assert any(float(jnp.max(jnp.abs(l))) > 0 for l in std_leaves)


@pytest.mark.parametrize("name", list(CONFIGS))
def test_stats_mode_value_and_grad_parity(name):
    """stats_mode: kernel-reduced masked sufficient statistics (and their
    cotangents, reconstructed in the backward from the re-derived noise)
    must match jnp reductions over the injected-noise oracle's aux."""
    from fiude_tpu.ops.pallas_train import RATE_SHIFT

    case = _build_case(name, jax.random.PRNGKey(hash(name) % (2 ** 31)))
    kw = dict(T=case["T"], R=case["R"], L=case["L"],
              n_fp_layers=case["n_fp"], n_aug_layers=case["n_aug"])
    R = case["R"]
    tmask = jnp.asarray([1.0, 0.5, 0.0], jnp.float32)[: case["T"] - 1]
    emask = jnp.repeat(tmask, 4).reshape(-1, 1, 1)  # per-eval mask

    def fused(means, stds, z, fa_w):
        traj, r1, r2, f2 = fused_bayes_train_trajectory(
            means, stds, z, fa_w, case["dts"], jnp.int32(0),
            noise=case["noise"], stats_mode=True, tmask=tmask, **kw)
        return traj, r1, r2, f2

    def oracle(means, stds, z, fa_w):
        traj, rates, fa = _oracle(means, stds, z, fa_w, case["dts"],
                                  case["noise"], T=case["T"], R=case["R"],
                                  L=case["L"], n_fp=case["n_fp"],
                                  n_aug=case["n_aug"])
        r1 = r2 = f2 = None
        if rates is not None:
            d = rates - jnp.asarray(RATE_SHIFT, rates.dtype).repeat(R)
            r1 = jnp.stack([jnp.sum(d[..., :R] * emask),
                            jnp.sum(d[..., R:] * emask)])
            r2 = jnp.stack([jnp.sum(jnp.square(d[..., :R]) * emask),
                            jnp.sum(jnp.square(d[..., R:]) * emask)])
        if fa is not None:
            f2 = jnp.sum(jnp.square(fa) * emask)
        return traj[..., : 3 * R], r1, r2, f2

    def loss(fn, *a):
        traj, r1, r2, f2 = fn(*a)
        s = jnp.sum(traj * jnp.cos(0.1 * traj))
        if r1 is not None:
            s = s + 0.5 * jnp.sum(jnp.sin(r1)) + 0.1 * jnp.sum(r2)
        if f2 is not None:
            s = s + 0.25 * jnp.tanh(f2) + 0.05 * f2
        return s

    args = (case["means"], case["stds"], case["z"], jnp.float32(0.7))
    out_f, out_o = fused(*args), oracle(*args)
    for a, b, what in zip(out_f, out_o, ("traj", "r1", "r2", "f2")):
        if b is None:
            assert a is None, what
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5, err_msg=what)

    g_f = jax.grad(lambda *a: loss(fused, *a), argnums=(0, 1, 2, 3))(*args)
    g_o = jax.grad(lambda *a: loss(oracle, *a), argnums=(0, 1, 2, 3))(*args)
    for gf, go, what in zip(g_f, g_o, ("means", "stds", "z", "fa_w")):
        for leaf_f, leaf_o in zip(jax.tree.leaves(gf), jax.tree.leaves(go)):
            scale = max(1.0, float(jnp.max(jnp.abs(leaf_o))))
            np.testing.assert_allclose(
                np.asarray(leaf_f), np.asarray(leaf_o),
                rtol=2e-3, atol=1e-4 * scale, err_msg=what)
