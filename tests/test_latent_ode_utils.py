"""Latent-ODE vendored eval utilities (utils/latent_ode.py) vs the
reference semantics (/root/reference/lib/Old/utils.py:116-174,378-510,514-611)."""

import numpy as np
import pytest

from fiude_tpu.utils.latent_ode import (
    compute_loss_all_batches,
    cut_out_timepoints,
    onehot_accuracy,
    roc_auc,
    split_and_subsample_batch,
    split_data_extrap,
    split_data_interp,
    subsample_timepoints,
)


def _batch(n=4, T=30, F=3, rng=None):
    rng = rng or np.random.default_rng(0)
    return {
        "data": rng.uniform(size=(n, T, F)).astype(np.float32),
        "time_steps": np.arange(T, dtype=np.float32),
        "mask": np.ones((n, T, F), np.float32),
    }


class TestSubsample:
    def test_exact_count_keeps_n_points(self):
        d = _batch()
        data, tp, mask = subsample_timepoints(
            d["data"], d["time_steps"], d["mask"], n_tp_to_sample=10,
            rng=np.random.default_rng(1))
        assert tp.shape == (30,)
        for i in range(data.shape[0]):
            kept = mask[i].sum(-1) > 0
            assert kept.sum() == 10
            # zeroed points are zero in data too
            assert np.all(data[i][~kept] == 0.0)
        # inputs untouched (functional, unlike the in-place reference)
        assert np.all(d["mask"] == 1.0)

    def test_fraction_keeps_percentage(self):
        d = _batch(T=40)
        data, _, mask = subsample_timepoints(
            d["data"], d["time_steps"], d["mask"], n_tp_to_sample=0.5,
            rng=np.random.default_rng(2))
        for i in range(data.shape[0]):
            assert (mask[i].sum(-1) > 0).sum() == 20

    def test_none_is_identity(self):
        d = _batch()
        data, tp, mask = subsample_timepoints(
            d["data"], d["time_steps"], d["mask"], None)
        assert data is d["data"] and mask is d["mask"]

    def test_too_many_raises(self):
        d = _batch(T=5)
        with pytest.raises(ValueError):
            subsample_timepoints(d["data"], d["time_steps"], d["mask"], 9,
                                 rng=np.random.default_rng(0))


class TestCutOut:
    def test_cuts_consecutive_block(self):
        d = _batch(T=30)
        data, _, mask = cut_out_timepoints(
            d["data"], d["time_steps"], d["mask"], n_points_to_cut=6,
            rng=np.random.default_rng(3))
        for i in range(data.shape[0]):
            zeroed = np.where(mask[i].sum(-1) == 0)[0]
            assert len(zeroed) == 6
            assert np.all(np.diff(zeroed) == 1)          # consecutive
            assert zeroed[0] >= 5 and zeroed[-1] < 30 - 5  # ref start range

    def test_invalid_count_raises(self):
        d = _batch()
        with pytest.raises(ValueError):
            cut_out_timepoints(d["data"], d["time_steps"], d["mask"], 0)


class TestSplits:
    def test_extrap_halves_grid(self):
        d = _batch(T=30)
        out = split_data_extrap(d)
        assert out["mode"] == "extrap"
        assert out["observed_tp"].shape == (15,)
        assert out["tp_to_predict"].shape == (15,)
        np.testing.assert_array_equal(out["observed_data"], d["data"][:, :15])
        np.testing.assert_array_equal(out["data_to_predict"],
                                      d["data"][:, 15:])
        assert out["observed_mask"].shape == (4, 15, 3)

    def test_interp_reconstructs_full_grid(self):
        d = _batch()
        out = split_data_interp(d)
        assert out["mode"] == "interp"
        np.testing.assert_array_equal(out["observed_data"],
                                      out["data_to_predict"])

    def test_split_and_subsample_composes(self):
        d = _batch(T=40)
        out = split_and_subsample_batch(d, extrap=False, sample_tp=12,
                                        rng=np.random.default_rng(4))
        kept = out["observed_mask"][0].sum(-1) > 0
        assert kept.sum() == 12


class TestClassifMetrics:
    def test_auc_matches_sklearn_when_available(self):
        sk = pytest.importorskip("sklearn.metrics")
        rng = np.random.default_rng(5)
        labels = (rng.uniform(size=500) > 0.7).astype(np.float64)
        scores = labels * 0.3 + rng.normal(size=500)
        scores[:50] = scores[0]  # force ties
        assert roc_auc(labels, scores) == pytest.approx(
            sk.roc_auc_score(labels, scores), abs=1e-12)

    def test_auc_perfect_and_inverted(self):
        labels = np.array([0, 0, 1, 1])
        assert roc_auc(labels, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
        assert roc_auc(labels, np.array([0.9, 0.8, 0.2, 0.1])) == 0.0

    def test_auc_single_class_raises(self):
        with pytest.raises(ValueError):
            roc_auc(np.ones(4), np.arange(4.0))

    def test_onehot_accuracy_counts_labeled_only(self):
        labels = np.zeros((2, 3, 4))
        labels[0, 0, 1] = 1.0   # labeled, class 1
        labels[1, 2, 3] = 1.0   # labeled, class 3
        preds = np.zeros((2, 3, 4))
        preds[0, 0, 1] = 5.0    # correct
        preds[1, 2, 0] = 5.0    # wrong
        assert onehot_accuracy(labels, preds) == 0.5


class TestComputeLossAllBatches:
    def test_averages_loss_keys(self):
        batches = [{"labels": None} for _ in range(3)]
        vals = iter([1.0, 2.0, 3.0])

        def losses(batch):
            v = next(vals)
            return {"loss": np.float32(v), "mse": np.float32(2 * v)}

        total = compute_loss_all_batches(losses, batches)
        assert total["loss"] == pytest.approx(2.0)
        assert total["mse"] == pytest.approx(4.0)
        assert total["kl_first_p"] == 0.0  # absent keys stay 0

    def test_binary_auc_branch(self):
        rng = np.random.default_rng(6)
        n_traj, B, L = 2, 8, 1

        def make_batch():
            return {"labels": (rng.uniform(size=(B, L)) > 0.5)
                    .astype(np.float64)}

        batches = [make_batch() for _ in range(2)]

        def losses(batch):
            lbl = batch["labels"]
            preds = np.broadcast_to(lbl, (n_traj,) + lbl.shape).copy()
            preds = preds + rng.normal(scale=0.01, size=preds.shape)
            return {"loss": 1.0, "label_predictions": preds}

        total = compute_loss_all_batches(losses, batches, classif=True,
                                         classif_mode="binary")
        assert total["auc"] > 0.99  # near-perfect separation

    def test_onehot_branch_and_max_batches(self):
        n_traj, B, L = 1, 4, 3
        calls = []

        def losses(batch):
            calls.append(1)
            lbl = batch["labels"]
            return {"loss": 1.0,
                    "label_predictions": 10.0 * lbl[None]}

        rng = np.random.default_rng(7)
        lbl = np.eye(L)[rng.integers(0, L, size=B)]
        batches = [{"labels": lbl}] * 5
        total = compute_loss_all_batches(losses, batches, classif=True,
                                         classif_mode="onehot",
                                         max_batches=2)
        assert len(calls) == 2
        assert total["accuracy"] == 1.0
