"""scripts/summarize_results.py: aggregation over the reference results
column scheme ("{season} {horizon}" / "skill {season} {h}",
lib/utils.py:52-54)."""

import numpy as np
import pandas as pd

from scripts.summarize_results import summarize


def test_summarize_groups_and_averages():
    df = pd.DataFrame([
        {"region": "US", "ode_name": "CONN", "num": 1,
         "2015 13": 2.0, "2015 20": 4.0, "skill 2015 7": 0.2},
        {"region": "US", "ode_name": "CONN", "num": 2,
         "2015 13": 4.0, "2015 20": 6.0, "skill 2015 7": 0.4},
        {"region": "US", "ode_name": "UONN", "num": 1,
         "2015 13": 1.0, "2015 20": 1.0, "skill 2015 7": 0.6},
    ])
    out = summarize(df)
    uonn = out[out.model == "UONN"].iloc[0]
    conn = out[out.model == "CONN"].iloc[0]
    assert conn.runs == 2 and uonn.runs == 1
    np.testing.assert_allclose(conn.mean_nll, 4.0)
    np.testing.assert_allclose(conn.mean_skill, 0.3)
    # sorted best-first within region
    assert list(out.model) == ["UONN", "CONN"]


def test_summarize_ignores_nan_cells():
    df = pd.DataFrame([
        {"region": "US", "ode_name": "CONN", "2015 13": 2.0,
         "2016 13": np.nan, "skill 2015 7": 0.5},
    ])
    out = summarize(df)
    np.testing.assert_allclose(out.iloc[0].mean_nll, 2.0)
