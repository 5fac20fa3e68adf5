"""The Data/-tree schema validator (scripts/validate_data_tree.py) against
the synthetic tree (must pass clean) and deliberately corrupted copies
(must fail with the targeted, actionable error)."""
import os
import shutil

import pandas as pd
import pytest

from fiude_tpu.data.synthetic import write_reference_data_tree
from scripts.validate_data_tree import validate_tree


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vdt") / "Data")
    write_reference_data_tree(root, n_qs=6, seed=0, n_weeks=320)
    return root


def failures(results):
    return [(name, msg) for name, ok, msg in results if not ok]


def test_synthetic_tree_passes(tree):
    results = validate_tree(tree)
    assert failures(results) == []


def test_synthetic_tree_passes_deep_us(tree):
    seasons = pd.read_csv(os.path.join(tree, "Dates.csv"),
                          index_col=0).index
    results = validate_tree(tree, regions=["US"],
                            seasons=[int(seasons[1])], deep=True)
    assert failures(results) == []


def _copy(tree, tmp_path):
    dst = str(tmp_path / "Data")
    shutil.copytree(tree, dst)
    return dst


def test_missing_query_file(tree, tmp_path):
    dst = _copy(tree, tmp_path)
    os.remove(os.path.join(dst, "Queries", "state_queries",
                           "CA_query_data.csv"))
    msgs = [m for n, m in failures(validate_tree(dst, regions=["state"]))]
    assert any("CA_query_data.csv" in m and "MISSING" in m for m in msgs)


def test_missing_column_in_hhs_flu(tree, tmp_path):
    dst = _copy(tree, tmp_path)
    p = os.path.join(dst, "hhs_flu.csv")
    df = pd.read_csv(p)
    df.drop(columns=["unweighted_ili"]).to_csv(p, index=False)
    msgs = [m for n, m in failures(validate_tree(dst, regions=["hhs"]))]
    assert any("unweighted_ili" in m for m in msgs)


def test_unparseable_split_date(tree, tmp_path):
    dst = _copy(tree, tmp_path)
    p = os.path.join(dst, "Dates.csv")
    df = pd.read_csv(p, index_col=0)
    df.iloc[0, df.columns.get_loc("train_end")] = "08/01/2015"
    df.to_csv(p)
    msgs = [m for n, m in failures(validate_tree(dst, regions=["US"]))]
    assert any("%Y-%m-%d" in m and "train_end" in m for m in msgs)


def test_similarity_join_mismatch(tree, tmp_path):
    dst = _copy(tree, tmp_path)
    p = os.path.join(dst, "Similarity_Scores.csv")
    df = pd.read_csv(p, index_col=0)
    df.index = [f"other_{i}" for i in range(len(df))]
    df.to_csv(p)
    msgs = [m for n, m in failures(validate_tree(dst, regions=["US"]))]
    assert any("shares no names" in m for m in msgs)


def test_missing_population_row(tree, tmp_path):
    dst = _copy(tree, tmp_path)
    p = os.path.join(dst, "state_population_data_2019.csv")
    df = pd.read_csv(p, index_col=0)
    df[df["CODE"] != "NY"].to_csv(p)
    msgs = [m for n, m in failures(validate_tree(dst, regions=["hhs"]))]
    assert any("NY" in m and "population" in m.lower() for m in msgs)


def test_season_outside_span(tree, tmp_path):
    dst = _copy(tree, tmp_path)
    p = os.path.join(dst, "Dates.csv")
    df = pd.read_csv(p, index_col=0)
    df.iloc[0, df.columns.get_loc("test_end")] = "2099-05-01"
    df.to_csv(p)
    msgs = [m for n, m in failures(validate_tree(dst, regions=["US"]))]
    assert any("outside" in m and "span" in m for m in msgs)
