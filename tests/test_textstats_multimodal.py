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


def test_real_ppm_image_decode(spark):
    """REAL image decode path: PPM payloads synthesized deterministically,
    decoded with pure numpy, features exact; malformed payload -> ok=false
    row, not a job failure."""
    import numpy as np

    from kbasesearchengine_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        image_features,
    )

    rng = np.random.default_rng(11)
    imgs = {i: rng.integers(0, 256, size=(16 + i, 12 + i, 3), dtype=np.uint8)
            for i in range(4)}
    rows = [(i, bytearray(encode_ppm(a))) for i, a in imgs.items()]
    rows.append((99, bytearray(b"not an image")))
    blobs = spark.createDataFrame(rows, "doc_id bigint, payload binary")

    out = {r["doc_id"]: r for r in image_features(blobs).collect()}
    for i, a in imgs.items():
        r = out[i]
        assert (r["width"], r["height"], r["ok"]) == (12 + i, 16 + i, True)
        np.testing.assert_allclose(
            [r["mean_r"], r["mean_g"], r["mean_b"]],
            a.reshape(-1, 3).mean(axis=0), rtol=1e-12,
        )
    assert out[99]["ok"] is False and out[99]["width"] == -1
    # codec round-trip exactness
    a = imgs[0]
    np.testing.assert_array_equal(decode_ppm(encode_ppm(a)), a)
    # resize stage: output stats computed on the downsample
    small = image_features(blobs, resize_to=8).collect()
    assert all(r["ok"] is False or r["width"] == 8 for r in small
               if r["doc_id"] != 99)


def test_real_wav_audio_decode(spark):
    """REAL audio decode path: 16-bit PCM WAV via stdlib wave + numpy;
    duration/RMS exact; frame sampling; malformed -> ok=false."""
    import numpy as np

    from kbasesearchengine_spark.operators.multimodal import (
        audio_features,
        decode_wav,
        encode_wav,
    )

    rate = 8000
    t = np.arange(rate)  # 1 second
    sig = 0.5 * np.sin(2 * np.pi * 440 * t / rate).reshape(-1, 1)
    stereo = np.hstack([sig, 0.25 * sig])
    rows = [
        (1, bytearray(encode_wav(sig, rate))),
        (2, bytearray(encode_wav(stereo, rate))),
        (99, bytearray(b"RIFFgarbage")),
    ]
    blobs = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r["doc_id"]: r for r in audio_features(blobs).collect()}
    assert out[1]["n_channels"] == 1 and out[2]["n_channels"] == 2
    assert abs(out[1]["duration_sec"] - 1.0) < 1e-9
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert abs(out[1]["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert out[1]["peak"] <= 0.5 + 1e-3
    assert out[99]["ok"] is False

    s, r = decode_wav(encode_wav(sig, rate))
    assert r == rate and s.shape == (rate, 1)
    # 16-bit quantization (encode *32767, decode /32768): one-LSB-ish error
    np.testing.assert_allclose(s[:, 0], sig[:, 0], atol=2 / 32767)

    sampled = {x["doc_id"]: x for x in audio_features(blobs, frame_sample=4).collect()}
    assert sampled[1]["n_samples"] == rate  # reported length is the full clip
