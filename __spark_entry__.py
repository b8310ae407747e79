"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`rerankers_spark.driver_contract` — one entry per
implemented operator (SURVEY.md §2), each with a DuckDB oracle where
SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rerankers_spark.driver_contract import QUERIES, q_bm25_topk  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exhaustive BM25 top-10 for the fixed query set over the
    sf0.001 documents corpus."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
