"""Legacy national (England/US) pipeline vs the reference ``lib/Old/data.py``
oracle (runnable for country='US' with n_queries=0; the England branch of the
reference hardcodes personal absolute paths, so England is covered by
semantic self-consistency checks against the written daily table)."""
import importlib.util
import os
import sys

import numpy as np
import pandas as pd
import pytest

from fiude_tpu.data.legacy import (
    LEGACY_TEST_DATES, legacy_national_data, load_legacy_queries,
)
from fiude_tpu.data.synthetic import write_legacy_national_tree

REF_OLD_DATA = "/root/reference/lib/Old/data.py"


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("legacy")
    write_legacy_national_tree(str(root / "Data"), n_qs=6, seed=0)
    return root


@pytest.fixture(scope="module")
def ref_data_fn():
    if not os.path.isfile(REF_OLD_DATA):
        pytest.skip("reference tree not available")
    spec = importlib.util.spec_from_file_location("_ref_old_data",
                                                  REF_OLD_DATA)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.data


class TestUSOracleParity:
    @pytest.mark.parametrize("year", [2015, 2016])
    def test_matches_reference(self, tree, ref_data_fn, monkeypatch, year):
        monkeypatch.chdir(tree)  # reference reads 'Data/national_flu.csv'
        ref = ref_data_fn(country="US", window=12, gamma=6, year=year,
                          batch_size=10, n_queries=0)
        rx = np.concatenate([b.numpy() for b in ref[0]])
        ry = np.concatenate([b.numpy() for b in ref[1]])
        rxt, ryt = ref[2].numpy(), ref[3].numpy()

        ours = legacy_national_data(str(tree / "Data"), country="US",
                                    window=12, gamma=6, year=year)
        np.testing.assert_allclose(ours[0], rx, rtol=1e-6)
        np.testing.assert_allclose(ours[1], ry, rtol=1e-6)
        np.testing.assert_allclose(ours[2], rxt, rtol=1e-6)
        np.testing.assert_allclose(ours[3], ryt, rtol=1e-6)
        assert ours[4] == pytest.approx(float(ref[4]))


class TestEngland:
    def test_weekly_subsample_semantics(self, tree):
        """England weekly ILI = every 7th row of the daily table, +3 days
        (reference lib/Old/data.py:73-76)."""
        x_tr, y_tr, x_te, y_te, ili_max = legacy_national_data(
            str(tree / "Data"), country="England", window=12, gamma=6,
            year=2016)
        daily = pd.read_csv(
            tree / "Data" / "ILI_rates_UK_thursday_cubic_interpolation.csv",
            index_col=0, parse_dates=True)
        weekly_vals = daily.values[: len(daily) // 7 * 7].reshape(-1, 7)[:, 0]
        assert ili_max == pytest.approx(float(weekly_vals.max()))
        # a 12-week inclusive window on an aligned weekly index has 13 rows
        assert x_tr.shape[1:] == (13, 1)
        assert y_tr.shape[1] == 13 + 6
        assert x_tr.shape[0] > 500 and x_te.shape[0] > 20
        # every window value exists in the weekly series (f32 tolerance)
        dist = np.abs(x_te[0, :, 0][:, None] - weekly_vals[None, :]).min(axis=1)
        assert (dist < 1e-5).all()

    def test_with_queries(self, tree):
        out = legacy_national_data(str(tree / "Data"), country="England",
                                   window=12, gamma=6, year=2016,
                                   n_queries=4, data_season=2015)
        x_tr, y_tr, x_te, y_te, q_tr, q_te, ili_max = out
        # daily query window: 12*7 lookback + 14-day lag + inclusive end
        assert q_tr.shape[1] == 12 * 7 + 14 + 1
        assert q_tr.shape[2] == 4
        assert q_tr.shape[0] == x_tr.shape[0]
        assert np.isfinite(q_tr).all() and q_tr.max() <= 1.0 + 1e-6

    def test_regional_builder_points_here(self, tree):
        from fiude_tpu.data.builder import DataConstructor
        with pytest.raises(ValueError, match="legacy_national_data"):
            DataConstructor(test_season=2016, region="England")

    def test_unknown_year_raises(self, tree):
        with pytest.raises(ValueError, match="legacy season anchors"):
            legacy_national_data(str(tree / "Data"), country="England",
                                 year=1999)


class TestQuerySelection:
    def test_ranking_prefers_correlated(self, tree):
        """load_legacy_queries ranks by sqrt(corr^2 + sim^2) descending
        (reference lib/Old/data.py:29-35)."""
        qs = load_legacy_queries(str(tree / "Data"), data_season=2015,
                                 country="England", n_queries=3)
        assert qs.shape[1] == 3
        assert not qs.isna().all(axis=1).any()

    def test_respects_n_queries(self, tree):
        qs6 = load_legacy_queries(str(tree / "Data"), data_season=2015,
                                  country="England", n_queries=6)
        qs2 = load_legacy_queries(str(tree / "Data"), data_season=2015,
                                  country="England", n_queries=2)
        assert qs6.shape[1] == 6 and qs2.shape[1] == 2
        assert list(qs2.columns) == list(qs6.columns[:2])
