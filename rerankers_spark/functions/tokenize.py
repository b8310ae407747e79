"""Deterministic code-aware tokenizer (frozen spec, FIXTURES.md §4).

Spec: lowercase; split on ``[^a-z0-9_]+``; drop empty tokens and tokens
longer than 64 chars. The same spec is implemented three ways and
property-tested for agreement:

* :func:`tokenize_col` — native Column expression (``split(lower(c), ...)``
  + ``filter``). This is the DEFAULT and the hot path: it stays inside
  whole-stage codegen on the JVM, no Python worker at all.
* :func:`tokenize_pandas_udf` — Arrow-vectorized pandas UDF. Exists for
  parity with the north-star contract ("tokenize content via vectorized
  Arrow UDFs") and as the extension point for tokenizers that are NOT
  regex-expressible (real BPE etc.). Never per-row Python.
* :func:`tokenize_py` — plain-Python oracle used by tests/oracle.py.

Reference parity note: the reference has no first-stage tokenizer (its
nearest string op is the 300-word truncation at
rerankers/models/rankgpt_rankers.py:54-58); this spec is ours, frozen so
"rank-identical BM25" is well-defined across Spark / DuckDB / numpy.
"""

from __future__ import annotations

import re
from typing import Iterator, List

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

#: Java/DuckDB/Python-compatible split pattern (the frozen spec).
TOKEN_SPLIT_RE = "[^a-z0-9_]+"
#: findall-form of the same spec: runs of the token alphabet. Equivalent
#: to split(TOKEN_SPLIT_RE) minus empty strings (property-tested).
#: (A fully-vectorized findall+factorize postings builder was measured
#: against the per-doc Counter loop on the 800k corpus and LOST — the
#: all-at-once token materialization is bandwidth-bound where the
#: doc-at-a-time loop stays cache-local — so the builder keeps the loop.)
TOKEN_FINDALL_RE = "[a-z0-9_]+"
MAX_TOKEN_LEN = 64

_PY_RE = re.compile(TOKEN_SPLIT_RE)


def tokenize_col(c: Column | str) -> Column:
    """tokens(content) as a native Column — JVM-side, codegen-friendly.

    ``split`` emits empty strings at delimiter-adjacent boundaries; the
    ``filter`` drops those plus over-long tokens, mirroring the spec.
    """
    c = F.col(c) if isinstance(c, str) else c
    toks = F.split(F.lower(c), TOKEN_SPLIT_RE)
    return F.filter(
        toks, lambda t: (F.length(t) > 0) & (F.length(t) <= MAX_TOKEN_LEN)
    )


def tokenize_py(text: str) -> List[str]:
    """Oracle implementation of the frozen spec (used by tests/oracle.py)."""
    if text is None:
        return []
    return [
        t for t in _PY_RE.split(text.lower()) if t and len(t) <= MAX_TOKEN_LEN
    ]


@F.pandas_udf(LongType())
def token_count_pandas_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """dl = |tokens(content)| WITHOUT shipping the token arrays back over
    Arrow — for stats passes that only need the count, this cuts the
    UDF's return traffic from ~all-the-text to 8 bytes/doc."""
    splitter = re.compile(TOKEN_SPLIT_RE)
    for s in batches:
        yield s.map(
            lambda x: 0
            if x is None
            else sum(
                1
                for t in splitter.split(x.lower())
                if t and len(t) <= MAX_TOKEN_LEN
            )
        ).astype("int64")


@F.pandas_udf(ArrayType(StringType()))
def tokenize_pandas_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Arrow-batched tokenizer UDF (iterator form: one regex compile per
    executor task, amortized over every Arrow batch)."""
    splitter = re.compile(TOKEN_SPLIT_RE)
    for s in batches:
        yield s.map(
            lambda x: []
            if x is None
            else [
                t
                for t in splitter.split(x.lower())
                if t and len(t) <= MAX_TOKEN_LEN
            ]
        )
