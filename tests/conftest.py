from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rerankers_spark.session import get_spark  # noqa: E402
from rerankers_spark.corpus import synthetic_corpus, queries_table  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rerankers-spark-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    """500-doc deterministic synthetic corpus (FIXTURES.md §1 'tiny')."""
    df = synthetic_corpus(spark, 500).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def tiny_queries(spark, tiny_corpus):
    df = queries_table(spark, tiny_corpus, n_queries=25).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def sf_dir():
    return f"{TESTDATA}/sf0.001"
