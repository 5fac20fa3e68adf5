"""Oracle validation of the data pipeline against the reference implementation.

Runs the ACTUAL reference ``DataConstructor``
(/root/reference/lib/regional_data_builder.py:162-274) on the synthetic
``Data/`` tree (cwd-pinned — the reference hardcodes ``Data/`` relative paths
at :107,123-126,253) and asserts that ``fiude_tpu.data.builder`` produces
element-for-element identical ``(x_train, y_train, x_test, y_test, scaler)``.
"""
import importlib
import os
import sys

import numpy as np
import pandas as pd
import pytest

from fiude_tpu.data.builder import DataConstructor
from fiude_tpu.data.synthetic import write_reference_data_tree

REF_LIB = "/root/reference/lib"


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("oracle")
    write_reference_data_tree(str(root / "Data"), n_qs=6, seed=0, n_weeks=300)
    return root


@pytest.fixture(scope="module")
def ref_mod():
    if not os.path.isdir(REF_LIB):
        pytest.skip("reference tree not available")
    sys.path.insert(0, REF_LIB)
    try:
        return importlib.import_module("regional_data_builder")
    finally:
        sys.path.remove(REF_LIB)


def _test_season(tree) -> int:
    # last season row: its choose_qs window (test_season-4 .. test_season-1,
    # reference :98) sits fully inside the smoothed query index
    dates = pd.read_csv(tree / "Data" / "Dates.csv", index_col=0)
    return int(dates.index[-1])


def _compare(tree, ref_mod, monkeypatch, *, region, run_backward,
             no_qs_in_output, fill_1=False, n_queries=4, gamma=14,
             window_size=10, lag=7):
    season = _test_season(tree)
    monkeypatch.chdir(tree)  # reference reads hardcoded 'Data/...' paths

    ref_dc = ref_mod.DataConstructor(
        test_season=season, region=region, n_queries=n_queries, gamma=gamma,
        window_size=window_size, lag=lag, fill_1=fill_1)
    ref_out = ref_dc(run_backward=run_backward,
                     no_qs_in_output=no_qs_in_output)

    ours_dc = DataConstructor(
        test_season=season, region=region, n_queries=n_queries, gamma=gamma,
        window_size=window_size, lag=lag, fill_1=fill_1,
        root=str(tree / "Data") + os.sep)
    ours_out = ours_dc(run_backward=run_backward,
                       no_qs_in_output=no_qs_in_output)

    names = ["x_train", "y_train", "x_test", "y_test"]
    for name, ref_arr, our_arr in zip(names, ref_out[:4], ours_out[:4]):
        ref_arr = np.asarray(ref_arr, np.float32)
        assert our_arr.shape == ref_arr.shape, (
            f"{name} shape {our_arr.shape} != reference {ref_arr.shape}")
        np.testing.assert_allclose(
            our_arr, ref_arr, rtol=1e-6, atol=1e-7, equal_nan=True,
            err_msg=f"{name} diverges from the reference DataConstructor")
    # scaler: pandas Series — order and values must match
    ref_scaler, our_scaler = ref_out[4], ours_out[4]
    assert list(our_scaler.index) == list(ref_scaler.index)
    np.testing.assert_allclose(our_scaler.values, ref_scaler.values,
                               rtol=1e-10)


class TestReferenceOracleParity:
    def test_us_backward(self, tree, ref_mod, monkeypatch):
        _compare(tree, ref_mod, monkeypatch, region="US", run_backward=True,
                 no_qs_in_output=True)

    def test_us_forward_with_queries(self, tree, ref_mod, monkeypatch):
        _compare(tree, ref_mod, monkeypatch, region="US", run_backward=False,
                 no_qs_in_output=False)

    def test_us_fill_1(self, tree, ref_mod, monkeypatch):
        _compare(tree, ref_mod, monkeypatch, region="US", run_backward=True,
                 no_qs_in_output=True, fill_1=True)

    def test_hhs_backward(self, tree, ref_mod, monkeypatch):
        _compare(tree, ref_mod, monkeypatch, region="hhs", run_backward=True,
                 no_qs_in_output=True)

    def test_state_backward(self, tree, ref_mod, monkeypatch):
        _compare(tree, ref_mod, monkeypatch, region="state",
                 run_backward=True, no_qs_in_output=True, n_queries=3,
                 gamma=7, window_size=7)
