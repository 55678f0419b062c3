"""Text-analysis operators for training-data curation.

Language-ID (stopword-hit heuristic), quality scoring, token counting,
and rolling-hash document fingerprinting — all built-in-function
expressions (JVM codegen; zero Python), each with an exactly-matching
SQL formulation for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword profiles for a handful of languages
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
    "es": ["el", "la", "de", "que", "los", "en", "un", "una", "por", "con"],
}


def _tokens_expr(text_col: str):
    # regexp_extract_all, NOT filter(split(...)): the negated-class split
    # is ~11x slower in the JVM on multi-KB docs (see functions/tokenize.py)
    return F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9_]+', 0)")


def token_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens_ws, n_tokens_word) — whitespace split + word-regex split.

    The 'BPE-ish' proxy count = word-regex tokens (sub-word regex splitting
    digits/identifiers apart), the whitespace count = raw fields."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.expr(f"regexp_count({text_col}, '\\\\S+')").alias("n_tokens_ws"),
        F.expr(f"regexp_count(lower({text_col}), '[a-z0-9_]+')").alias(
            "n_tokens_word"
        ),
    )


def quality_scores(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_chars, alpha_ratio, punct_ratio, stopword_ratio, mean_token_len,
    quality) — the standard cheap quality features; quality is a fixed
    linear blend, deterministic and SQL-reproducible."""
    toks = _tokens_expr(text_col)
    n_chars = F.length(F.col(text_col))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    n_punct = F.length(
        F.regexp_replace(F.col(text_col), "[^.,;:!?'\\\"()\\[\\]{}]", "")
    )
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in LANG_PROFILES["en"]])
    n_stop = F.size(F.expr(
        "filter(regexp_extract_all(lower({t}), '[a-z0-9_]+', 0),"
        " x -> array_contains(array({stops}), x))".format(
            t=text_col,
            stops=",".join(f"'{s}'" for s in LANG_PROFILES["en"]),
        )
    ))
    out = docs.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        (n_alpha / F.greatest(n_chars, F.lit(1))).alias("alpha_ratio"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (n_stop / F.greatest(n_tok, F.lit(1))).alias("stopword_ratio"),
        (
            (n_chars - F.length(F.regexp_replace(F.col(text_col), "\\s", "")))
        ).alias("_n_ws"),
        n_tok.alias("n_tokens"),
    )
    return out.select(
        "id",
        "n_chars",
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        "n_tokens",
        F.round(
            0.5 * F.col("alpha_ratio")
            + 0.3 * F.least(F.col("stopword_ratio") * 3, F.lit(1.0))
            + 0.2 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0)),
            6,
        ).alias("quality"),
    )


def lang_id(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pred_lang, hits) — argmax of per-language stopword hit counts;
    deterministic tie-break by language code asc ('und' when zero hits)."""
    cols = [F.col(id_col).alias("id")]
    for lang, stops in sorted(LANG_PROFILES.items()):
        stops_sql = ",".join(f"'{s}'" for s in stops)
        cols.append(
            F.size(
                F.expr(
                    f"filter(regexp_extract_all(lower({text_col}), '[a-z0-9_]+',"
                    f" 0), x -> array_contains(array({stops_sql}), x))"
                )
            ).alias(f"hits_{lang}")
        )
    scored = docs.select(*cols)
    langs = sorted(LANG_PROFILES)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier langs win ties -> apply last
        pred = F.when((best > 0) & (F.col(f"hits_{lg}") == best), F.lit(lg)).otherwise(
            pred
        )
    return scored.select("id", pred.alias("pred_lang"), best.alias("hits"))


def fingerprints(
    docs: DataFrame, id_col: str, text_col: str, gram: int = 8, window: int = 16
) -> DataFrame:
    """(id, fingerprint) — winnowing-style: minimum md5-derived hash over
    all character n-grams of the text (the rolling-hash document signature;
    window=∞ variant: one min per doc, robust to local edits)."""
    grams = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {gram - 1}, 1)),"
        f" i -> substring({text_col}, i, {gram}))"
    )
    return docs.select(
        F.col(id_col).alias("id"),
        F.array_min(
            F.transform(
                grams,
                lambda g: F.conv(F.substring(F.md5(g), 1, 13), 16, 10).cast("bigint"),
            )
        ).alias("fingerprint"),
    )
