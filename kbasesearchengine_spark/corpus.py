"""Deterministic synthetic source-code corpus generator.

Produces the input table of BASELINE.json `input_hint` —
(repo:string, path:string, commit:string, lang:string, content:string) —
seed-stable at any scale (FIXTURES.md §1): row i's content is a pure
function of (seed, i), so the corpus at N rows is a prefix of the corpus
at M > N rows. Generated distributively via ``spark.range`` +
``mapInPandas`` (vectorized; no driver-side materialization), so it
scales to bench sizes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42

LANGS = ["python", "java", "go", "js", "rust"]
EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "rust": "rs"}
KEYWORDS = {
    "python": ["def", "class", "import", "return", "self", "yield"],
    "java": ["public", "static", "void", "extends", "import", "final"],
    "go": ["func", "package", "import", "defer", "chan", "struct"],
    "js": ["function", "const", "let", "async", "await", "export"],
    "rust": ["fn", "impl", "trait", "match", "unsafe", "crate"],
}
# ~3 universal stopword tokens appearing in >90% of rows (skew driver)
STOPWORDS = ["license", "import", "the"]
# planted rare query terms (FIXTURES.md §2)
PLANTED = ["rfah", "zeta_flux", "quorum", "gyrase", "helicase", "plasmid"]

_VOCAB_SIZE = 4096


def _vocab() -> list[str]:
    """Fixed 4k identifier vocabulary, seed-stable."""
    base = [
        "parse", "parser", "http", "server", "client", "config", "index",
        "token", "stream", "buffer", "cache", "query", "result", "handler",
        "worker", "event", "merge", "split", "hash", "tree", "node", "graph",
        "list", "array", "map", "set", "queue", "stack", "heap", "sort",
    ]
    out = list(base)
    i = 0
    while len(out) < _VOCAB_SIZE:
        h = hashlib.sha1(f"vocab{SEED}:{i}".encode()).hexdigest()
        out.append(f"{base[i % len(base)]}_{h[:6]}")
        i += 1
    return out[:_VOCAB_SIZE]


VOCAB = _vocab()


def _row_rng(i: int) -> np.random.Generator:
    return np.random.default_rng(SEED * 1_000_003 + i)


def _gen_rows(idx: np.ndarray) -> pd.DataFrame:
    repos, paths, commits, langs, contents = [], [], [], [], []
    vocab = np.asarray(VOCAB)
    for i in idx:
        i = int(i)
        rng = _row_rng(i)
        lang = LANGS[int(rng.integers(0, len(LANGS)))]
        repo = f"org{i % 97}/repo{i % 1013}"
        w = vocab[rng.integers(0, _VOCAB_SIZE, size=3)]
        path = f"src/{w[0]}/{w[1]}/{w[2]}.{EXT[lang]}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
        n_tok = int(rng.integers(50, 2001))
        # Zipf-ish draws over the vocabulary
        zipf_idx = np.minimum(
            (rng.zipf(1.3, size=n_tok) - 1) % _VOCAB_SIZE, _VOCAB_SIZE - 1
        )
        toks = list(vocab[zipf_idx])
        toks += list(rng.choice(KEYWORDS[lang], size=max(1, n_tok // 20)))
        for sw in STOPWORDS:  # >90% of rows carry each stopword
            if rng.random() < 0.93:
                toks.append(sw)
        if rng.random() < 0.02:  # rare planted terms
            toks.append(PLANTED[int(rng.integers(0, len(PLANTED)))])
        rng.shuffle(toks)
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(" ".join(toks))
    return pd.DataFrame(
        {
            "repo": repos,
            "path": paths,
            "commit": commits,
            "lang": langs,
            "content": contents,
        }
    )


def generate_corpus(spark: SparkSession, n_rows: int, parallelism: int | None = None) -> DataFrame:
    """Distributed deterministic corpus of n_rows rows."""
    nump = parallelism or spark.sparkContext.defaultParallelism
    rng_df = spark.range(0, n_rows, 1, nump)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_rows(pdf["id"].to_numpy())

    return rng_df.mapInPandas(
        gen, schema="repo string, path string, commit string, lang string, content string"
    )


def generate_corpus_pandas(n_rows: int) -> pd.DataFrame:
    """Driver-side variant for small unit tests — identical rows."""
    return _gen_rows(np.arange(n_rows))
