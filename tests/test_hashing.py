"""Driver-side XXH64 must be byte-for-byte compatible with Spark's
``xxhash64`` expression — the v4 index layout depends on it (build hashes
tokens JVM-side; queries hash terms in Python)."""

import pytest
from pyspark.sql import functions as F

from kbasesearchengine_spark.functions.hashing import term_hash, xxh64

CASES = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "abcdefgh",
    "abcdefghi",
    "x" * 31,
    "y" * 32,
    "z" * 33,
    "q" * 64,
    "w" * 65,
    "longtoken_" * 20,
    "unicode_café",
    "license",
    "the",
    "0x1f",
]


def test_matches_spark_xxhash64(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "t string").select(
        "t", F.xxhash64("t").alias("h")
    )
    for r in df.collect():
        assert term_hash(r["t"]) == r["h"], repr(r["t"])


def test_hash_tokens_expr_matches_python(spark):
    """JVM tokenize+hash pipeline == python tokenize + python hash."""
    from kbasesearchengine_spark.functions.tokenize import (
        hash_tokens_expr,
        tokenize_py,
    )

    texts = ["Hello WORLD foo_bar", "", None, "a b a 0x1F  ,,, zz"]
    df = spark.createDataFrame([(t,) for t in texts], "content string")
    rows = df.select(hash_tokens_expr("content").alias("h")).collect()
    for t, r in zip(texts, rows):
        assert list(r["h"]) == [term_hash(tok) for tok in tokenize_py(t)]


def test_signed_range():
    assert -(1 << 63) <= xxh64(b"\x00\xff" * 40) < (1 << 63)


def test_derived_vocab_matches_index_dfs(spark, shared_index_dir):
    """Offline vocab derivation (operators/vocab.py): term_hash equals the
    driver-side XXH64 of the string, and per-hash df equals what the
    hash-keyed index derived from posting rows."""
    from kbasesearchengine_spark.corpus import generate_corpus
    from kbasesearchengine_spark.operators.topk import InvertedIndex
    from kbasesearchengine_spark.operators.vocab import derive_vocab

    corpus = generate_corpus(spark, 800, parallelism=8)
    vocab = derive_vocab(corpus, "content").collect()
    assert vocab
    for r in vocab[:200]:
        assert r["term_hash"] == term_hash(r["term"])

    index = InvertedIndex(spark, shared_index_dir)  # same 800-row corpus
    idx_dfs = {
        r["term_hash"]: r["df"] for r in index.terms.collect()
    }
    vocab_dfs = {r["term_hash"]: r["df"] for r in vocab}
    assert vocab_dfs == idx_dfs
