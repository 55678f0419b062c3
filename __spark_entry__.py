"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship conjunctive BM25 top-10 over the sf0.001
                documents table via the full inverted-index pipeline.
queries()     — one entry per implemented operator (SURVEY.md §2 +
                training-data ops); see
                kbasesearchengine_spark/plans/driver_queries.py.
oracle_sql()  — DuckDB-runnable ANSI SQL equivalents.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kbasesearchengine_spark.plans import driver_queries as _dq  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _dq.QUERIES["ft_bm25_topk_and"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_dq.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_dq.ORACLES)
