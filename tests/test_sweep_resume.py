"""Round-5 resumability plumbing: results-CSV dedup (``run_sweep
--skip-done``), tuning-grid extension, and worker provenance stamping.

These protect the reboot-survival contract: /tmp work-dir ledgers do not
survive machine restarts, so the sweep must be able to dedup from the
results table itself, and the tuning grid must be extendable in place
without touching scored rows (reference protocol:
``tuning/tuning_file_maker.ipynb`` + ``tuning/tune_node.py:234-266``).
"""
import os
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.run_sweep import filter_done  # noqa: E402
from fiude_tpu.train.experiment import run_tuning_worker  # noqa: E402
from fiude_tpu.utils.config import grid  # noqa: E402


def _write_results(path, rows):
    df = pd.DataFrame(rows)
    df.to_csv(path)
    return path


class TestFilterDone:
    def _configs(self, **over):
        kw = dict(region=["US"], epochs=[60], window_size=[7], gamma=[28],
                  latent_dim=[8], num=[1, 2], test_season=[2015, 2016],
                  ode_name=["CONN"])
        kw.update(over)
        return grid(**kw)

    def test_missing_csv_keeps_all(self, tmp_path):
        cfgs = self._configs()
        assert filter_done(cfgs, str(tmp_path / "nope.csv")) == cfgs

    def test_filled_cell_dropped_nan_cell_kept(self, tmp_path):
        # num=1 has 2015 filled; num=2 has a row but NaN in the 2015 column
        csv = _write_results(tmp_path / "res.csv", [
            {"epochs": 60, "gamma": 28, "ode_name": "CONN", "region": "US",
             "latent_dim": 8, "window_size": 7, "num": 1,
             "2015 13": 1.23, "skill 2015 7": 0.5},
            {"epochs": 60, "gamma": 28, "ode_name": "CONN", "region": "US",
             "latent_dim": 8, "window_size": 7, "num": 2,
             "2015 13": float("nan"), "skill 2015 7": 0.5},
        ])
        keep = filter_done(self._configs(), str(csv))
        keys = {(c.num, c.test_season) for c in keep}
        # (1, 2015) done; 2016 column absent entirely -> all 2016 kept;
        # (2, 2015) NaN -> kept
        assert keys == {(1, 2016), (2, 2015), (2, 2016)}

    def test_different_window_uses_its_own_column(self, tmp_path):
        # a window-7 row must not mark a window-15 config done (their NLL
        # columns differ: "{season} {window+6}")
        csv = _write_results(tmp_path / "res.csv", [
            {"epochs": 60, "gamma": 28, "ode_name": "CONN", "region": "US",
             "latent_dim": 8, "window_size": 7, "num": 1, "2015 13": 1.0},
        ])
        cfgs = self._configs(window_size=[15], num=[1], test_season=[2015])
        assert filter_done(cfgs, str(csv)) == cfgs


class TestTuningGridExtend:
    def _make(self, out, *extra):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/make_tuning_grid.py"),
             "--out", str(out), "--latent-dims", "4",
             "--hidden-sizes", "16", "--window-sizes", "7", "14",
             "--batch-sizes", "16", *extra],
            check=True, capture_output=True, cwd=REPO)

    def test_extend_appends_only_new_and_keeps_scores(self, tmp_path):
        out = tmp_path / "vs.csv"
        self._make(out)
        df = pd.read_csv(out, index_col=0)
        assert len(df) == 2
        # score one row, then extend with an overlapping + a new combo
        df.loc[0, ["started", "score"]] = [1, -1.5]
        df.to_csv(out)
        self._make(out, "--extend", "--window-sizes", "14", "28")
        df2 = pd.read_csv(out, index_col=0)
        assert len(df2) == 3  # w=14 deduped, w=28 appended
        assert df2.loc[0, "score"] == -1.5 and df2.loc[0, "started"] == 1
        assert set(df2.window_size) == {7, 14, 28}
        assert (df2.loc[2, ["started", "score"]] == [0, 10.0]).all()


class TestWorkerProvenance:
    def test_extra_cols_stamped_on_score_write(self, tmp_path):
        csv = tmp_path / "vs.csv"
        pd.DataFrame([
            dict(latent_dim=4, hidden_size=8, window_size=7, batch_size=4,
                 n_samples=4, epochs=1, started=0, score=10.0),
            dict(latent_dim=4, hidden_size=8, window_size=7, batch_size=4,
                 n_samples=4, epochs=2, started=0, score=10.0),
        ]).to_csv(csv)

        n = run_tuning_worker(str(csv), lambda p: float(p["epochs"]),
                              max_rows=10, extra_cols={"platform": "cpu"})
        assert n == 2
        df = pd.read_csv(csv, index_col=0)
        assert (df.platform == "cpu").all()
        assert df.score.tolist() == [1.0, 2.0]
        assert (df.started == 1).all()

    def test_crash_row_scores_sentinel_with_provenance(self, tmp_path):
        csv = tmp_path / "vs.csv"
        pd.DataFrame([
            dict(latent_dim=4, hidden_size=8, window_size=7, batch_size=4,
                 n_samples=4, epochs=1, started=0, score=10.0),
        ]).to_csv(csv)

        def boom(p):
            raise RuntimeError("worker crash")

        n = run_tuning_worker(str(csv), boom, max_rows=10,
                              extra_cols={"platform": "cpu"})
        assert n == 1
        df = pd.read_csv(csv, index_col=0)
        # crash containment: sentinel score stays (tune_node.py:255-260),
        # provenance still stamped
        assert df.score.tolist() == [10.0]
        assert df.platform.tolist() == ["cpu"]
