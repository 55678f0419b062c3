"""The reference query set (FIXTURES.md §2): 50 deterministic queries
covering the semantics the reference pins — single rare term, single
common term, rare+rare, rare+stopword, stopword-only, absent term (empty
result), and case variants (case-insensitivity proven by the reference at
ElasticIndexingStorageTest.java:238-249)."""

from __future__ import annotations

from .corpus import PLANTED, STOPWORDS, VOCAB


def reference_queries() -> list[tuple[int, str, str]]:
    """(query_id, query_text, mode) — 50 queries, seed-free deterministic."""
    common = VOCAB[:8]  # high-df identifier vocabulary heads
    rare = PLANTED
    out: list[str] = []
    # single rare terms
    out += rare[:5]
    # single common terms
    out += common[:5]
    # rare + rare
    out += [f"{rare[i]} {rare[(i + 1) % len(rare)]}" for i in range(5)]
    # rare + stopword
    out += [f"{rare[i % len(rare)]} {STOPWORDS[i % len(STOPWORDS)]}" for i in range(5)]
    # stopword-only (1..3 terms)
    out += [
        STOPWORDS[0],
        " ".join(STOPWORDS[:2]),
        " ".join(STOPWORDS),
        f"{STOPWORDS[1]} {STOPWORDS[2]}",
        f"{STOPWORDS[2]} {STOPWORDS[0]}",
    ]
    # common + common
    out += [f"{common[i]} {common[(i + 2) % len(common)]}" for i in range(5)]
    # absent terms -> empty result
    out += ["zz_missing_token", "qqqq_not_here", f"{rare[0]} zz_missing_token"]
    # case variants (must equal lowercase results)
    out += [rare[0].upper(), common[0].capitalize(), f"{rare[1].title()} {STOPWORDS[0].upper()}"]
    # 3-4 term mixes
    out += [
        " ".join(common[:3]),
        " ".join(common[:4]),
        f"{rare[2]} {common[0]} {STOPWORDS[0]}",
        f"{common[1]} {common[2]} {STOPWORDS[1]} {STOPWORDS[2]}",
    ]
    # rare + common pairs
    out += [f"{rare[i % len(rare)]} {common[i]}" for i in range(6)]
    # common + stopword
    out += [f"{common[i]} {STOPWORDS[i % len(STOPWORDS)]}" for i in range(4)]
    queries = []
    for i, q in enumerate(out[:50]):
        mode = "or" if i % 5 == 4 else "and"  # every 5th is disjunctive
        queries.append((i, q, mode))
    return queries
