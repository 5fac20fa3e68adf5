"""The whole-epoch lax.scan fast path must be step-for-step identical to the
per-batch python loop (same batch order, same PRNG chain, same skip-counter
carry).  The scan path exists purely to cut axon-tunnel round trips
(~90/epoch -> 2/epoch); it must not change training math."""
import dataclasses

import numpy as np
import pytest

import jax

from fiude_tpu.data.loader import ArrayLoader
from fiude_tpu.data.synthetic import synthetic_dataset
from fiude_tpu.models import UDEForecaster
from fiude_tpu.train import TRAINING_INFO, Trainer


class ListLoader:
    """Replays an ArrayLoader's batches WITHOUT exposing .x — forces the
    Trainer onto the per-batch loop path."""

    def __init__(self, inner: ArrayLoader):
        self._inner = inner

    def __len__(self):
        return len(self._inner)

    def __iter__(self):
        return iter(self._inner)


def make_trainer(ode_name: str, seed: int = 3) -> Trainer:
    model = UDEForecaster.build(
        n_regions=2, latent_dim=6, n_qs=3, ode_name=ode_name,
        enc_params={"q_sizes": (12,), "ff_sizes": (8,)},
        ode_params={"net_sizes": (10, 10), "aug_net_sizes": (10, 10)}
        if ode_name in ("FaFp", "Bayes_FaFp") else
        {"net_sizes": (10, 10)})
    tr = Trainer(model, loss_cfg=TRAINING_INFO[
        {"FaFp": "UONN", "Fp": "CONN", "Fa": "SONN",
         "Bayes_FaFp": "UONNb"}[ode_name]], seed=seed)
    tr.setup_training(lr=1e-3)
    return tr


def data_and_loaders(n=23, batch_size=8, seed=11):
    # n=23 with batch 8 -> two full batches + a partial tail of 7
    x_tr, y_tr, *_ = synthetic_dataset(n_regions=2, n_qs=3, window_size=6,
                                       gamma=8, seed=seed)
    x_tr, y_tr = x_tr[:n], y_tr[:n]
    scan_loader = ArrayLoader(x_tr, y_tr, batch_size=batch_size, seed=seed)
    loop_loader = ListLoader(ArrayLoader(x_tr, y_tr, batch_size=batch_size,
                                         seed=seed))
    return scan_loader, loop_loader, y_tr.shape[1]


def params_allclose(a, b, atol=1e-6):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=atol,
                                   rtol=1e-5)


@pytest.mark.parametrize("ode_name", ["FaFp", "Bayes_FaFp"])
def test_train_scan_matches_loop(ode_name):
    scan_loader, loop_loader, T = data_and_loaders()
    t = np.arange(9, dtype=np.float32) / 7.0
    eval_pts = np.arange(0, 9, 2)

    tr_scan = make_trainer(ode_name)
    tr_scan.train(scan_loader, t, 2, eval_pts, n_samples=4, grad_lim=50.0)

    tr_loop = make_trainer(ode_name)
    tr_loop.train(loop_loader, t, 2, eval_pts, n_samples=4, grad_lim=50.0)

    params_allclose(tr_scan.params, tr_loop.params)
    # per-batch metric streams match too (scan packs them into one fetch)
    h_s = tr_scan.history.epoch_history
    h_l = tr_loop.history.epoch_history
    assert len(h_s) == len(h_l) == 2
    for es, el in zip(h_s, h_l):
        for k in el:
            assert es[k] == pytest.approx(el[k], rel=1e-4, abs=1e-6), k
    # the grad-skip rule exercised identically
    np.testing.assert_allclose(tr_scan.batch_grad_norms,
                               tr_loop.batch_grad_norms, rtol=1e-4)


def test_padded_curriculum_scan_matches_loop():
    scan_loader, loop_loader, _ = data_and_loaders()
    t = np.arange(9, dtype=np.float32) / 7.0
    eval_all = np.arange(0, 9, 2)

    tr_scan = make_trainer("Fp")
    tr_scan.train_curriculum_padded(scan_loader, t, eval_all, 1,
                                    n_samples=4, grad_lim=50.0)
    tr_loop = make_trainer("Fp")
    tr_loop.train_curriculum_padded(loop_loader, t, eval_all, 1,
                                    n_samples=4, grad_lim=50.0)
    params_allclose(tr_scan.params, tr_loop.params)


def test_deferred_checkpoint_writes_best(tmp_path):
    scan_loader, _, _ = data_and_loaders()
    t = np.arange(9, dtype=np.float32) / 7.0
    eval_pts = np.arange(0, 9, 2)
    tr = make_trainer("Fp")
    tr = dataclasses.replace(tr, chkpt_prefix=str(tmp_path / "ck_"))
    tr.setup_training(lr=1e-3)
    tr.train(scan_loader, t, 2, eval_pts, n_samples=4, grad_lim=50.0,
             checkpoint=True)
    # flushed at train() end: all three parts on disk, loadable
    for part in ("enc", "ode", "dec"):
        assert (tmp_path / f"ck_chkpt_{part}.npz").exists()
    tr.load(checkpoint=True)
