"""Tokenizer: the three implementations (native Column, Arrow UDF, python
oracle) agree on the frozen spec (FIXTURES.md §4)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from rerankers_spark.functions.tokenize import (
    tokenize_col,
    tokenize_pandas_udf,
    tokenize_py,
)

CASES = [
    "def get_user(id): return db.fetch(id)",
    "CamelCase Mixed_Snake  --- 123abc",
    "",
    "   ",
    "x" * 65,  # dropped: too long
    "x" * 64,  # kept: exactly max
    "a.b.c,d;e",
    "UPPER lower 42_mixed_42",
]


def test_native_matches_python(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "content string")
    got = [
        r["toks"]
        for r in df.select(tokenize_col("content").alias("toks")).collect()
    ]
    assert got == [tokenize_py(c) for c in CASES]


def test_arrow_udf_matches_python(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "content string")
    got = [
        r["toks"]
        for r in df.select(tokenize_pandas_udf("content").alias("toks")).collect()
    ]
    assert got == [tokenize_py(c) for c in CASES]


@settings(max_examples=25, deadline=None)
@given(st.text(max_size=200))
def test_python_tokenizer_properties(s):
    toks = tokenize_py(s)
    for t in toks:
        assert t
        assert len(t) <= 64
        assert t == t.lower()


def test_null_content(spark):
    df = spark.createDataFrame([(None,)], "content string")
    row = df.select(tokenize_col("content").alias("toks")).collect()[0]
    assert row["toks"] is None or row["toks"] == []


def test_tokenize_is_jvm_side(spark):
    """The default tokenizer must not spawn ANY Python eval node."""
    df = spark.createDataFrame([("a b",)], "content string")
    plan = df.select(
        F.explode(tokenize_col("content"))
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
