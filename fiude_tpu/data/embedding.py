"""Embedding-based semantic query scoring — the capability that *produces*
``Similarity_Scores.csv`` (the live pipeline only consumes it).

Re-design of the reference's legacy scorer
(``lib/Old/Data_Constructor.py:125-192``):

* a query phrase is embedded as the mean of its word vectors, with unknown
  words contributing zero vectors (``query_to_embedding``, ``:125-142``);
* its similarity score is the ratio of summed shifted-cosine similarities to
  positive anchor phrases ("flu", "fever", ...) over negative anchors
  ("bieber", "ebola", "wikipedia") plus a smoothing ``gamma``
  (``similarity_score``, ``:144-154``);
* query selection combines the similarity score with Pearson correlation to
  the ILI signal, by the ``'distance'`` rule (L2 distance to the per-column
  maxima, ascending) or the ``'Bill'`` rule (independent thresholds)
  (``query_selection``, ``:156-192``).

The embedding source is pluggable: :class:`WordEmbeddings` reads the
reference's on-disk schema (a headerless vector CSV + newline-delimited
vocabulary, ``:127-132``), but any ``embed_fn: str -> np.ndarray`` works —
e.g. a learned encoder or a hash embedding for tests.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional, Sequence

import numpy as np
import pandas as pd

#: anchor phrases from the reference (lib/Old/Data_Constructor.py:144-145)
POSITIVE_ANCHORS = ("flu", "fever", "flu", "flu medicine", "gp", "hospital")
NEGATIVE_ANCHORS = ("bieber", "ebola", "wikipedia")


class WordEmbeddings:
    """Word-vector table with the reference's on-disk schema: a headerless
    CSV of vectors row-aligned with a newline-delimited ``vocabulary.txt``
    (reference ``lib/Old/Data_Constructor.py:127-132``)."""

    def __init__(self, vectors: pd.DataFrame):
        self.vectors = vectors
        self.dim = vectors.shape[1]

    @classmethod
    def load(cls, root: str,
             vectors_file: str = "vectors_unzipped/Twitter_word_embeddings_CBOW.csv",
             vocab_file: str = "vectors_unzipped/vocabulary.txt",
             ) -> "WordEmbeddings":
        vectors = pd.read_csv(os.path.join(root, vectors_file), header=None)
        with open(os.path.join(root, vocab_file)) as fh:
            vocab = fh.read().split("\n")[:-1]
        vectors.index = vocab
        return cls(vectors)

    def __call__(self, query: str) -> np.ndarray:
        """Mean of word vectors; out-of-vocabulary words are zero vectors
        (so they dilute, not skip — reference ``:134-141``)."""
        rows = []
        for word in query.split(" "):
            if word in self.vectors.index:
                rows.append(self.vectors.loc[word].to_numpy(float))
            else:
                rows.append(np.zeros(self.dim))
        return np.mean(np.asarray(rows), axis=0)


def _cosine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise cosine similarity of ``a (D,)`` against ``b (N, D)``."""
    denom = np.linalg.norm(a) * np.linalg.norm(b, axis=1)
    return (b @ a) / np.maximum(denom, 1e-12)


def similarity_score(embedding: np.ndarray,
                     pos_embeddings: np.ndarray,
                     neg_embeddings: np.ndarray,
                     gamma: float = 0.001) -> float:
    """Shifted-cosine anchor ratio (reference ``:144-154``): each cosine is
    mapped to [0, 1] via ``(c+1)/2`` and summed per anchor set; the score is
    ``pos_sum / (neg_sum + gamma)``."""
    pos = ((_cosine(embedding, pos_embeddings) + 1.0) / 2.0).sum()
    neg = ((_cosine(embedding, neg_embeddings) + 1.0) / 2.0).sum() + gamma
    return float(pos / neg)


def build_similarity_scores(
    queries: Iterable[str],
    embed_fn: Callable[[str], np.ndarray],
    *,
    pos: Sequence[str] = POSITIVE_ANCHORS,
    neg: Sequence[str] = NEGATIVE_ANCHORS,
    gamma: float = 0.001,
    out_csv: Optional[str] = None,
) -> pd.DataFrame:
    """Score every query phrase; optionally write ``Similarity_Scores.csv``
    in the schema the live pipeline consumes (index=query, column
    ``similarity`` — reference ``:159,166-168``)."""
    pos_emb = np.asarray([embed_fn(p) for p in pos])
    neg_emb = np.asarray([embed_fn(n) for n in neg])
    scores = pd.DataFrame(
        index=list(queries), columns=["similarity"],
        data=[similarity_score(np.asarray(embed_fn(q)), pos_emb, neg_emb,
                               gamma=gamma)
              for q in queries])
    if out_csv:
        scores.to_csv(out_csv)
    return scores


def select_queries(scores: pd.DataFrame, *, method: str = "distance",
                   n_queries: int = 100,
                   similarity_threshold: float = 2.5,
                   correlation_threshold: float = 0.9) -> pd.Index:
    """Legacy selection rules over a (similarity, correlation) score table
    (reference ``:184-192``).

    ``'distance'``: normalize each column by its max, rank by L2 distance of
    ``1 - scores`` (closest to the per-column maxima first), keep the top
    ``n_queries``.  ``'Bill'``: keep queries above both thresholds.
    """
    if method == "distance":
        rel = scores / np.tile(scores.max(), (scores.shape[0], 1))
        dist = np.sqrt(np.square(1.0 - rel).sum(axis=1))
        return scores.index[np.argsort(dist)][:n_queries]
    if method == "Bill":
        keep = scores[(scores["similarity"] > similarity_threshold)
                      & (scores["correlation"] > correlation_threshold)]
        return keep.index
    raise ValueError(f"unknown selection method {method!r}; "
                     "options: 'distance', 'Bill'")
