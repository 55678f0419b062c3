"""Text-analysis + multimodal plumbing operators."""

import hashlib

import pytest
from pyspark.sql import functions as F

from kbasesearchengine_spark.operators import multimodal, textstats


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_token_counts(spark, docs):
    got = {r["id"]: r for r in
           textstats.token_counts(docs, "doc_id", "text").collect()}
    sample = docs.limit(5).collect()
    for r in sample:
        ws = len([t for t in r["text"].split() if t])
        assert got[r["doc_id"]]["n_tokens_ws"] == ws


def test_quality_bounds(docs):
    rows = textstats.quality_scores(docs, "doc_id", "text").collect()
    for r in rows:
        assert 0 <= r["alpha_ratio"] <= 1
        assert 0 <= r["punct_ratio"] <= 1
        assert 0 <= r["stopword_ratio"] <= 1
        assert 0 <= r["quality"] <= 1.0001


def test_langid_returns_known_codes(docs):
    rows = textstats.lang_id(docs, "doc_id", "text").collect()
    codes = {r["pred_lang"] for r in rows}
    assert codes <= set(textstats.LANG_PROFILES) | {"und"}
    # the synthetic docs contain 'the' -> most should hit English profile
    en = sum(1 for r in rows if r["pred_lang"] == "en")
    assert en > len(rows) * 0.5


def test_fingerprint_matches_python(docs):
    rows = textstats.fingerprints(docs.limit(3), "doc_id", "text").collect()
    texts = {r["doc_id"]: r["text"] for r in docs.limit(3).collect()}
    for r in rows:
        t = texts[r["id"]]
        grams = [t[i:i + 8] for i in range(max(len(t) - 7, 1))]
        exp = min(int(hashlib.md5(g.encode()).hexdigest()[:13], 16) for g in grams)
        assert r["fingerprint"] == exp


def test_multimodal_stub_features(docs):
    blobs = multimodal.to_binary_payload(docs.limit(10), "doc_id", "text")
    feats = {r["doc_id"]: r for r in multimodal.extract_features(blobs).collect()}
    src = {r["doc_id"]: r["text"] for r in docs.limit(10).collect()}
    for did, text in src.items():
        assert feats[did]["n_bytes"] == len(text.encode())
        assert feats[did]["n_chars"] == len(text)
        assert feats[did]["first_byte"] == text.encode()[0]
        assert feats[did]["decoder"] == "stub"


def test_multimodal_real_decoder_is_marked_unimplemented(spark, docs):
    blobs = multimodal.to_binary_payload(docs.limit(2), "doc_id", "text")
    out = multimodal.extract_features(blobs, decoder="real")
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        out.collect()
    with pytest.raises(ValueError):
        multimodal.extract_features(blobs, decoder="bogus")
