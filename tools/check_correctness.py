"""Local mirror of the driver's correctness gate.

Runs every __spark_entry__ query at sf0.01 via Spark AND its oracle SQL
via DuckDB, compares row count, column names/types, and sorted values
(exact for non-floats, reporting max abs diff for floats).

Usage: python tools/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CHECK", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_conn():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    return pdf


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    issues = []
    if len(spark_pdf) != len(duck_pdf):
        issues.append(f"row count {len(spark_pdf)} != {len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        issues.append(f"columns {sc} != {dc}")
        return issues
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) != len(b):
        return issues
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(
            bv.dtype, np.floating
        ):
            av = av.astype(float).to_numpy()
            bv = bv.astype(float).to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            diff = np.where(both_nan, 0.0, np.abs(av - bv))
            if len(diff) and np.max(diff) > 0:
                issues.append(f"float col {c}: max abs diff {np.max(diff):.2e}")
        else:
            try:
                eq = (av.astype(str) == bv.astype(str)).all()
            except Exception as e:  # noqa: BLE001
                issues.append(f"col {c}: compare error {e}")
                continue
            if not eq:
                bad = (av.astype(str) != bv.astype(str))
                i = int(np.argmax(bad.to_numpy()))
                issues.append(
                    f"col {c}: mismatch at sorted row {i}: "
                    f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r}"
                )
    return issues


def main() -> int:
    import __spark_entry__ as entry_mod
    from kbasesearchengine_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("correctness-check", cores=8, shuffle_partitions=8)
    duck = duck_conn()
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spark_pdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(spark_pdf)} (no oracle, rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            duck_pdf = duck.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        issues = compare(name, spark_pdf, duck_pdf)
        if issues:
            n_fail += 1
            print(f"FAIL {name}: {'; '.join(issues)} [{time.time()-t0:.1f}s]")
        else:
            print(f"PASS {name}: rows={len(spark_pdf)} [{time.time()-t0:.1f}s]")
    print(f"\n{'ALL GREEN' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
