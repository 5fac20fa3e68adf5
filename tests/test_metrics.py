"""Metric parity against the reference ``lib/Metrics.py`` run as an oracle
(it is pure numpy/pandas/scipy, importable directly), including the CDC
binned-table branch (``lib/Metrics.py:26-41``) and DataFrame inputs
(``:6-9``)."""
import importlib
import os
import sys

import numpy as np
import pandas as pd
import pytest

from fiude_tpu.utils import metrics

REF_LIB = "/root/reference/lib"


@pytest.fixture(scope="module")
def ref_metrics():
    if not os.path.isdir(REF_LIB):
        pytest.skip("reference tree not available")
    sys.path.insert(0, REF_LIB)
    try:
        return importlib.import_module("Metrics")
    finally:
        sys.path.remove(REF_LIB)


@pytest.fixture()
def arrays():
    rng = np.random.default_rng(0)
    true = rng.uniform(0, 6, 64)
    mean = true + rng.normal(0, 0.5, 64)
    std = rng.uniform(0.2, 1.5, 64)
    return true, mean, std


@pytest.fixture()
def frame(arrays):
    true, mean, std = arrays
    return pd.DataFrame({"True": true, "Pred": mean, "Std": std})


@pytest.fixture()
def bin_table():
    """CDC-style binned probability table: columns are 0.1-wide bin left
    edges 0.0..12.9 plus a final 'True' column."""
    rng = np.random.default_rng(1)
    edges = np.round(np.arange(0, 13, 0.1), 1)
    probs = rng.dirichlet(np.ones(len(edges)), size=20)
    table = pd.DataFrame(probs, columns=[float(f"{e:.1f}") for e in edges])
    table["True"] = rng.uniform(1.0, 11.0, 20)
    return table


class TestArrayParity:
    def test_nll_mae(self, ref_metrics, arrays):
        true, mean, std = arrays
        assert metrics.nll(true, mean, std) == pytest.approx(
            ref_metrics.nll(true, mean, std))
        assert metrics.mae(true, mean, std) == pytest.approx(
            ref_metrics.mae(true, mean, std))

    def test_mb_log_and_skill(self, ref_metrics, arrays):
        true, mean, std = arrays
        np.testing.assert_allclose(metrics.mb_log(true, mean, std),
                                   ref_metrics.mb_log(true, mean, std))
        assert metrics.skill(true, mean, std) == pytest.approx(
            ref_metrics.skill(true, mean, std))

    def test_mb_log_floor(self, ref_metrics):
        # an impossible observation floors cdf mass at 4.54e-5
        out = metrics.mb_log(np.array([100.0]), np.array([0.0]),
                             np.array([0.1]))
        np.testing.assert_allclose(out, np.log(4.5399929762484854e-05))


class TestDataFrameInputs:
    def test_all_four(self, ref_metrics, frame):
        assert metrics.nll(frame) == pytest.approx(ref_metrics.nll(frame))
        assert metrics.mae(frame) == pytest.approx(ref_metrics.mae(frame))
        np.testing.assert_allclose(np.asarray(metrics.mb_log(frame)),
                                   np.asarray(ref_metrics.mb_log(frame)))
        assert metrics.skill(frame) == pytest.approx(ref_metrics.skill(frame))


class TestBinnedTable:
    def test_mb_log_bins_parity(self, ref_metrics, bin_table):
        ours = metrics.mb_log(bin_table.copy(), bins=True)
        ref = ref_metrics.mb_log(bin_table.copy(), bins=True)
        np.testing.assert_allclose(ours, np.asarray(ref), rtol=1e-12)

    def test_skill_bins_parity(self, ref_metrics, bin_table):
        assert metrics.skill(bin_table.copy(), bins=True) == pytest.approx(
            ref_metrics.skill(bin_table.copy(), bins=True))

    def test_window_is_eleven_bins(self):
        # mass outside [bin-0.5, bin+0.5] must not count
        edges = [float(f"{e:.1f}") for e in np.round(np.arange(0, 3, 0.1), 1)]
        table = pd.DataFrame(np.zeros((1, len(edges))), columns=edges)
        table.loc[0, 1.0] = 0.25   # in window around 1.4
        table.loc[0, 1.9] = 0.25   # in window (upper edge)
        table.loc[0, 2.0] = 0.5    # outside window
        table["True"] = [1.45]
        np.testing.assert_allclose(
            metrics.mb_log(table, bins=True), np.log(0.5))
