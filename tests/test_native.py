"""Native (C++) window builder: compiles, matches numpy and pandas paths."""
import numpy as np
import pytest

from fiude_tpu.data.native import (
    _load, build_windows_fast, build_windows_numpy,
)
from fiude_tpu.data.synthetic import build_windows


RNG = np.random.default_rng(0)


def make_arrays(n_days=120, R=3, Q=4):
    qs = RNG.uniform(0, 1, (n_days, R, Q)).astype(np.float32)
    ili = RNG.uniform(0, 1, (n_days, R)).astype(np.float32)
    return qs, ili


class TestNativeBuilder:
    def test_compiles(self):
        assert _load() is not None, "g++ compile of window_builder.cpp failed"

    @pytest.mark.parametrize("run_backward", [True, False])
    def test_native_matches_numpy(self, run_backward):
        qs, ili = make_arrays()
        kw = dict(window_size=10, lag=7, gamma=14, run_backward=run_backward)
        x_n, y_n = build_windows_fast(qs, ili, **kw)
        x_p, y_p = build_windows_numpy(qs, ili, **kw)
        np.testing.assert_array_equal(x_n, x_p)
        np.testing.assert_array_equal(y_n, y_p)

    def test_matches_python_reference_path(self):
        """Fast path == the pandas-style python loop (same layout/masking)."""
        qs, ili = make_arrays()
        kw = dict(window_size=10, lag=7, gamma=14)
        x_f, y_f = build_windows_fast(qs, ili, run_backward=True, **kw)
        x_r, y_r = build_windows(qs, ili, run_backward=True,
                                 no_qs_in_output=True, **kw)
        np.testing.assert_allclose(x_f, x_r, rtol=1e-6)
        np.testing.assert_allclose(y_f, y_r, rtol=1e-6)

    def test_masking_and_shapes(self):
        qs, ili = make_arrays(n_days=60, R=2, Q=3)
        x, y = build_windows_fast(qs, ili, window_size=8, lag=5, gamma=10)
        n_expected = 60 - 10 - 9
        assert x.shape == (n_expected, 13, 2 * 3 + 2)
        assert y.shape == (n_expected, 8 + 1 + 10, 2)
        np.testing.assert_array_equal(x[:, -5:, -2:], -1.0)
        assert not np.any(x[:, :-5, -2:] == -1.0)
