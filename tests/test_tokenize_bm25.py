"""Tokenizer spec + BM25 math unit tests (pure Python/numpy — no Spark)."""

import math

import numpy as np

from kbasesearchengine_spark.functions.bm25 import idf, score_contrib, tf_norm
from kbasesearchengine_spark.functions.tokenize import tokenize_py
from kbasesearchengine_spark.oracle import build_oracle_index, oracle_topk


def test_tokenize_spec():
    assert tokenize_py("Foo bar_baz qux-42") == ["foo", "bar_baz", "qux", "42"]
    assert tokenize_py("RfaH") == ["rfah"]  # case-insensitive (ref test :238-249)
    assert tokenize_py("") == []
    assert tokenize_py(None) == []
    assert tokenize_py("a.b(c)[d]") == ["a", "b", "c", "d"]


def test_idf_formula():
    # ES5/Lucene6: ln(1 + (N - df + .5)/(df + .5))
    assert math.isclose(idf(1, 3), math.log(1 + 2.5 / 1.5))
    assert idf(100, 100) > 0  # always positive (BM25+ style lower bound)


def test_tf_norm_saturation():
    assert tf_norm(1, 10, 10.0) == 1 / (1 + 1.2)
    # longer docs are penalized
    assert tf_norm(2, 100, 10.0) < tf_norm(2, 10, 10.0)
    # increasing tf increases but saturates
    a = tf_norm(np.array([1, 2, 4, 100]), np.array([10] * 4), 10.0)
    assert np.all(np.diff(a) > 0)
    assert a[-1] < 1.0


def test_oracle_conjunctive_and_ranking():
    docs = [
        (0, "alpha beta gamma"),
        (1, "alpha alpha beta"),
        (2, "alpha only here"),
        (3, "beta only here"),
    ]
    idx = build_oracle_index(docs)
    res = oracle_topk(idx, "alpha beta", k=10, mode="and")
    ids = [d for d, _ in res]
    assert set(ids) == {0, 1}  # conjunctive: docs 2,3 excluded
    # doc 1 has tf(alpha)=2 and same dl -> ranks first
    assert ids[0] == 1
    res_or = oracle_topk(idx, "alpha beta", k=10, mode="or")
    assert {d for d, _ in res_or} == {0, 1, 2, 3}


def test_score_contrib_matches_manual():
    n, avgdl = 100, 50.0
    got = score_contrib(np.array([3.0]), 7, np.array([40.0]), n, avgdl)
    exp = math.log(1 + (100 - 7 + 0.5) / 7.5) * 3 / (
        3 + 1.2 * (1 - 0.75 + 0.75 * 40 / 50)
    )
    assert math.isclose(got[0], exp, rel_tol=1e-12)
