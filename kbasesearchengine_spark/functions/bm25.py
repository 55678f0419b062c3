"""BM25 scoring math — the single source of truth for the score contract.

The reference gets BM25 implicitly from Elasticsearch 5.5's default
similarity (Lucene 6 BM25, k1=1.2, b=0.75; reference pins ES 5.5 at
README.md:46 / build.xml:56). We internalize it with the exact Lucene idf
formula and NO norm quantization (contract in FIXTURES.md §3):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm(d)  = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score(d, q) = sum_t idf(t) * tf_norm(t, d)

Scores are exact float64 computed from per-doc scalars (tf, df, dl, N,
avgdl) — never from a parallel reduction whose order could vary — so
results are bit-stable across parallelism levels.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(df: np.ndarray | float, n_docs: float) -> np.ndarray | float:
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def tf_norm(
    tf: np.ndarray | float,
    dl: np.ndarray | float,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> np.ndarray | float:
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def score_contrib(
    tf: np.ndarray,
    df: np.ndarray | float,
    dl: np.ndarray,
    n_docs: float,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> np.ndarray:
    """Per-(term,doc) BM25 contribution."""
    return idf(df, n_docs) * tf_norm(tf, dl, avgdl, k1, b)


def block_max_tf_norm(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> float:
    """Max tf_norm over a posting block (block-max WAND metadata)."""
    return float(np.max(tf_norm(tf, dl, avgdl)))


# SQL fragments (DuckDB + Spark SQL compatible) mirroring the formulas, for
# oracle construction. All use ln/LOG natural log via ln().
SQL_IDF = "ln(1 + ({n} - {df} + 0.5) / ({df} + 0.5))"
SQL_TF_NORM = "({tf} / ({tf} + 1.2 * (1 - 0.75 + 0.75 * {dl} / {avgdl})))"
