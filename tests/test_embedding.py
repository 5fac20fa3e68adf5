"""Embedding-based query scoring vs the reference legacy scorer
(lib/Old/Data_Constructor.py:125-192) run as an oracle."""
import importlib
import os
import sys

import numpy as np
import pandas as pd
import pytest

from fiude_tpu.data.embedding import (
    WordEmbeddings, build_similarity_scores, select_queries, similarity_score,
)

REF_OLD = "/root/reference/lib/Old"

VOCAB = ["flu", "fever", "medicine", "gp", "hospital", "bieber", "ebola",
         "wikipedia", "cough", "cold", "symptoms", "vaccine"]


@pytest.fixture(scope="module")
def vec_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vectors")
    d = root / "vectors_unzipped"
    d.mkdir()
    rng = np.random.default_rng(0)
    vectors = rng.standard_normal((len(VOCAB), 16))
    pd.DataFrame(vectors).to_csv(d / "Twitter_word_embeddings_CBOW.csv",
                                 header=False, index=False)
    (d / "vocabulary.txt").write_text("\n".join(VOCAB) + "\n")
    return str(root)


@pytest.fixture(scope="module")
def ref_dc(vec_root):
    if not os.path.isdir(REF_OLD):
        pytest.skip("reference tree not available")
    os.environ.setdefault("MPLBACKEND", "Agg")
    sys.path.insert(0, REF_OLD)
    try:
        mod = importlib.import_module("Data_Constructor")
    finally:
        sys.path.remove(REF_OLD)
    return mod.DataConstructor(test_season=2015, data_season=2014, gamma=28,
                               window_size=42, root=vec_root + os.sep)


QUERIES = ["flu symptoms", "fever medicine", "bieber tickets",
           "cough and cold", "ebola outbreak news"]


class TestOracleParity:
    def test_query_embedding(self, vec_root, ref_dc):
        emb = WordEmbeddings.load(vec_root)
        for q in QUERIES:
            ours = emb(q)
            ref = ref_dc.query_to_embedding(q).squeeze()
            np.testing.assert_allclose(ours, ref, rtol=1e-12)

    def test_similarity_scores(self, vec_root, ref_dc):
        emb = WordEmbeddings.load(vec_root)
        scores = build_similarity_scores(QUERIES, emb)
        for q in QUERIES:
            ref = ref_dc.similarity_score(ref_dc.query_to_embedding(q))
            assert scores.loc[q, "similarity"] == pytest.approx(ref, rel=1e-9)

    def test_flu_beats_bieber(self, vec_root):
        emb = WordEmbeddings.load(vec_root)
        scores = build_similarity_scores(["flu fever", "bieber wikipedia"], emb)
        assert (scores.loc["flu fever", "similarity"]
                > scores.loc["bieber wikipedia", "similarity"])


class TestSelection:
    def make_scores(self):
        return pd.DataFrame({
            "similarity": [3.0, 1.0, 2.8, 0.5],
            "correlation": [0.95, 0.99, 0.5, 0.92],
        }, index=["q_both", "q_corr", "q_sim", "q_neither"])

    def test_distance_rule(self):
        # reference :184-187 — L2 distance to per-column maxima, ascending
        scores = self.make_scores()
        ranked = select_queries(scores, method="distance", n_queries=4)
        assert ranked[0] == "q_both"
        rel = scores / np.tile(scores.max(), (scores.shape[0], 1))
        dist = np.sqrt(np.square(1 - rel).sum(axis=1))
        assert list(ranked) == list(scores.index[np.argsort(dist)])

    def test_bill_rule(self):
        kept = select_queries(self.make_scores(), method="Bill",
                              similarity_threshold=2.5,
                              correlation_threshold=0.9)
        assert list(kept) == ["q_both"]

    def test_unknown_method(self):
        with pytest.raises(ValueError, match="selection method"):
            select_queries(self.make_scores(), method="nope")


class TestCsvRoundTrip:
    def test_written_schema_is_consumable(self, vec_root, tmp_path):
        """The written CSV must match the schema the live choose_qs consumes
        (index=query, 'similarity' column — lib/regional_data_builder.py:107)."""
        emb = WordEmbeddings.load(vec_root)
        out = str(tmp_path / "Similarity_Scores.csv")
        build_similarity_scores(QUERIES, emb, out_csv=out)
        back = pd.read_csv(out, index_col=0)
        assert list(back.columns) == ["similarity"]
        assert list(back.index) == QUERIES
