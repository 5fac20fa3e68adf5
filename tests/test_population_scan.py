"""PopulationTrainer's whole-epoch scan must match its per-batch loop
(member params, key chains, metric streams)."""
import numpy as np
import pytest

import jax

from fiude_tpu.data.loader import ArrayLoader
from fiude_tpu.data.synthetic import synthetic_dataset
from fiude_tpu.models import UDEForecaster
from fiude_tpu.parallel.sweep import PopulationTrainer
from fiude_tpu.train import TRAINING_INFO


class ListLoader:
    def __init__(self, inner):
        self._inner = inner

    def __len__(self):
        return len(self._inner)

    def __iter__(self):
        return iter(self._inner)


def make_pop(ode_name, loss_key, member_seeds=None, seed=5):
    model = UDEForecaster.build(
        n_regions=2, latent_dim=6, n_qs=3, ode_name=ode_name,
        enc_params={"q_sizes": (12,), "ff_sizes": (8,)},
        ode_params={"net_sizes": (10, 10), "aug_net_sizes": (10, 10)}
        if ode_name in ("FaFp", "Bayes_FaFp") else {"net_sizes": (10, 10)})
    return PopulationTrainer(model, n_members=2,
                             loss_cfg=TRAINING_INFO[loss_key],
                             member_seeds=member_seeds, seed=seed)


@pytest.mark.parametrize("ode_name,loss_key,member_seeds", [
    ("FaFp", "UONN", [3, 9]),
    ("Bayes_FaFp", "UONNb", [3, 9]),
    ("Fp", "CONN", None),       # shared-key mode (no member chains)
])
def test_population_scan_matches_loop(ode_name, loss_key, member_seeds):
    x_tr, y_tr, *_ = synthetic_dataset(n_regions=2, n_qs=3, window_size=6,
                                       gamma=8, seed=11)
    x_tr, y_tr = x_tr[:23], y_tr[:23]  # 2 full batches + tail of 7
    t = np.arange(9, dtype=np.float32) / 7.0
    eval_pts = np.arange(0, 9, 2)

    pop_s = make_pop(ode_name, loss_key, member_seeds)
    pop_s.train(ArrayLoader(x_tr, y_tr, batch_size=8, seed=11), t, 2,
                eval_pts, n_samples=4, grad_lim=50.0)

    pop_l = make_pop(ode_name, loss_key, member_seeds)
    pop_l.train(ListLoader(ArrayLoader(x_tr, y_tr, batch_size=8, seed=11)),
                t, 2, eval_pts, n_samples=4, grad_lim=50.0)

    for la, lb in zip(jax.tree.leaves(pop_s.states.params),
                      jax.tree.leaves(pop_l.states.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=1e-6, rtol=1e-5)
    for hs, hl in zip(pop_s.history, pop_l.history):
        assert len(hs.epoch_history) == len(hl.epoch_history) == 2
        for es, el in zip(hs.epoch_history, hl.epoch_history):
            for k in el:
                assert es[k] == pytest.approx(el[k], rel=1e-4, abs=1e-6), k
