"""Data pipeline: synthetic Data/ tree -> DataConstructor windows -> splits."""
import os

import numpy as np
import pandas as pd
import pytest

from fiude_tpu.data.builder import (
    DataConstructor, choose_qs, get_hhs_query_data, interpolate_ili, load_ili,
    smooth,
)
from fiude_tpu.data.synthetic import (
    build_windows, synthetic_dataset, write_reference_data_tree,
)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("Data"))
    write_reference_data_tree(root, n_qs=6, seed=0, n_weeks=300)
    return root


class TestSyntheticTree:
    def test_files_exist(self, data_root):
        for f in ["national_flu.csv", "hhs_flu.csv", "state_flu.csv",
                  "state_population_data_2019.csv", "Similarity_Scores.csv",
                  "Dates.csv"]:
            assert os.path.exists(os.path.join(data_root, f))
        assert os.path.exists(os.path.join(
            data_root, "Queries", "state_queries", "CA_query_data.csv"))
        assert os.path.exists(os.path.join(
            data_root, "Queries", "US_query_data_all_smoothed.csv"))

    def test_load_ili_schemas(self, data_root):
        us = load_ili("US", data_root)
        assert list(us.columns) == ["weighted_ili"]
        hhs = load_ili("hhs", data_root)
        assert hhs.shape[1] == 10
        state = load_ili("state", data_root)
        assert state.shape[1] == 49


class TestPipelinePieces:
    def test_smooth_shape(self, data_root):
        us = load_ili("US", data_root)
        sm = smooth(us, n=7)
        assert len(sm) == len(us) - 7

    def test_interpolation_daily(self, data_root):
        us = load_ili("US", data_root)
        daily = interpolate_ili(us)
        assert len(daily) == (us.index[-1] - us.index[0]).days + 1
        # interpolant passes through the weekly knots
        np.testing.assert_allclose(daily.loc[us.index].values, us.values,
                                   rtol=1e-6, atol=1e-9)

    def test_fill_1_keeps_weekly_gaps(self, data_root):
        us = load_ili("US", data_root)
        daily = interpolate_ili(us, fill_1=True)
        assert daily.isna().sum().values[0] > 0
        np.testing.assert_allclose(
            daily.loc[us.index].values.astype(float), us.values, rtol=1e-6)

    def test_hhs_population_weighting(self, data_root):
        df = get_hhs_query_data(2, data_root + "/")
        assert df.shape[1] == 6  # n_qs columns
        assert (df.values >= 0).all()

    def test_choose_qs_count(self, data_root):
        ili = interpolate_ili(load_ili("US", data_root))
        qs = {1: __import__("pandas").read_csv(
            os.path.join(data_root, "Queries", "US_query_data_all_smoothed.csv"),
            index_col=0, parse_dates=True)}
        season = ili.index[-1].year - 1
        names = choose_qs(qs, ili, 1, season, 3, region="US", root=data_root)
        assert len(names) == 3


class TestDataConstructor:
    @pytest.mark.parametrize("region,n_regions", [("US", 1), ("hhs", 10)])
    def test_shapes(self, data_root, region, n_regions):
        dates = pd.read_csv(os.path.join(data_root, "Dates.csv"), index_col=0)
        season = int(dates.index[len(dates) // 2])
        n_qs, window, gamma, lag = 3, 10, 14, 7
        dc = DataConstructor(test_season=season, region=region,
                             n_queries=n_qs, gamma=gamma, window_size=window,
                             lag=lag, root=data_root + "/")
        x_tr, y_tr, x_te, y_te, scaler = dc(run_backward=True,
                                            no_qs_in_output=True)
        assert x_tr.shape[1:] == (window + lag, n_regions * (n_qs + 1))
        assert y_tr.shape[1:] == (window + 1 + gamma, n_regions)
        assert len(x_te) > 0 and len(x_tr) > 0
        assert scaler.shape == (n_regions,)
        # trailing `lag` days of the ILI block are masked to -1
        np.testing.assert_array_equal(
            x_tr[0, -lag:, -n_regions:], -1.0)
        # queries normalized to [0, 1]
        assert x_tr[..., : n_qs * n_regions].max() <= 1.0 + 1e-6

    def test_forward_only_outputs(self, data_root):
        dates = pd.read_csv(os.path.join(data_root, "Dates.csv"), index_col=0)
        season = int(dates.index[len(dates) // 2])
        dc = DataConstructor(test_season=season, region="US", n_queries=3,
                             gamma=14, window_size=10, lag=7,
                             root=data_root + "/")
        _, y_tr, *_ = dc(run_backward=False, no_qs_in_output=True)
        assert y_tr.shape[1] == 14

    def test_fill_1_targets_masked(self, data_root):
        dates = pd.read_csv(os.path.join(data_root, "Dates.csv"), index_col=0)
        season = int(dates.index[len(dates) // 2])
        dc = DataConstructor(test_season=season, region="US", n_queries=3,
                             gamma=14, window_size=10, lag=7, fill_1=True,
                             root=data_root + "/")
        _, y_tr, *_ = dc(run_backward=True, no_qs_in_output=True)
        assert (y_tr == -1.0).mean() > 0.5  # most daily targets are gaps


class TestInMemorySynthetic:
    def test_synthetic_dataset_shapes(self):
        x_tr, y_tr, x_te, y_te, scaler = synthetic_dataset(
            n_regions=2, n_qs=3, window_size=7, gamma=14, lag=5,
            n_seasons=2, season_len=100)
        assert x_tr.shape[1:] == (12, 2 * 4)
        assert y_tr.shape[1:] == (7 + 1 + 14, 2)
        assert np.all(np.isfinite(x_tr))
        np.testing.assert_array_equal(x_tr[0, -5:, -2:], -1.0)
