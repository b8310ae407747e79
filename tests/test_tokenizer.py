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


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=300))
def test_findall_form_equals_split_form(s):
    """TOKEN_FINDALL_RE (used by the vectorized index builder) must be
    exactly split(TOKEN_SPLIT_RE) minus empties, before the length cap."""
    import re

    from rerankers_spark.functions.tokenize import (
        TOKEN_FINDALL_RE,
        TOKEN_SPLIT_RE,
    )

    low = s.lower()
    via_split = [t for t in re.split(TOKEN_SPLIT_RE, low) if t]
    via_findall = re.findall(TOKEN_FINDALL_RE, low)
    assert via_split == via_findall


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(max_size=120), min_size=0, max_size=8))
def test_postings_map_matches_python_oracle(texts):
    """The vectorized _postings_map agrees with tokenize_py + Counter on
    arbitrary content (including None, empty, all-delimiter strings)."""
    from collections import Counter

    import numpy as np
    import pandas as pd

    from rerankers_spark.index.spimi import _postings_map

    pdf = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "shard_id": np.arange(len(texts), dtype=np.int32) % 3,
        "content": pd.Series(texts, dtype="object"),
    })
    got = pd.concat(list(_postings_map(iter([pdf]))), ignore_index=True)
    got_set = {
        (r.term, r.doc_id, r.dl, r.tf, r.shard_id)
        for r in got.itertuples()
    }
    want = set()
    for i, text in enumerate(texts):
        toks = tokenize_py(text)
        for term, tf in Counter(toks).items():
            want.add((term, i, len(toks), tf, i % 3))
    assert got_set == want


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
