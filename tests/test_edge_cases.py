"""Degenerate-input hardening: empty corpora, zero-token docs,
delete-everything lifecycles."""

from __future__ import annotations

import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rerankers_spark.corpus import synthetic_corpus_pdf, with_doc_id
from rerankers_spark.index import spimi
from rerankers_spark.query.executor import Engine

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _corpus(spark, pdf):
    return with_doc_id(spark.createDataFrame(pdf, schema=CORPUS_SCHEMA))


def test_build_empty_corpus(spark):
    base = "/tmp/test_edge_empty"
    shutil.rmtree(base, ignore_errors=True)
    empty = _corpus(spark, pd.DataFrame(
        columns=["repo", "path", "commit", "lang", "content"]))
    spimi.build_index(spark, empty, base, n_shards=2)
    meta = spimi.load_meta(spark, spimi.IndexPaths(base))
    assert meta["n_docs"] == 0 and meta["avgdl"] == 0.0
    eng = Engine(spark, base)
    q = spark.createDataFrame([(0, "anything")],
                              "query_id long, query string")
    assert eng.search(q, k=5, mode="bmw").count() == 0
    assert eng.search(q, k=5, mode="exhaustive").count() == 0


def test_zero_token_docs_counted_in_stats(spark):
    """Docs whose content tokenizes to nothing still count toward N (and
    drag avgdl down) but produce no postings."""
    base = "/tmp/test_edge_zerotok"
    shutil.rmtree(base, ignore_errors=True)
    rows = [("r", "a", "c1", "python", "def def def"),
            ("r", "b", "c2", "python", "!!! ... ###"),  # 0 tokens
            ("r", "c", "c3", "python", "")]             # 0 tokens
    corpus = _corpus(spark, pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"]))
    spimi.build_index(spark, corpus, base, n_shards=2)
    meta = spimi.load_meta(spark, spimi.IndexPaths(base))
    assert meta["n_docs"] == 3
    assert meta["avgdl"] == pytest.approx(1.0)  # (3 + 0 + 0) / 3
    eng = Engine(spark, base)
    q = spark.createDataFrame([(0, "def")], "query_id long, query string")
    got = eng.search(q, k=5, mode="bmw").collect()
    assert len(got) == 1  # only the one doc with postings


def test_delete_everything_then_compact(spark):
    base = "/tmp/test_edge_delall"
    shutil.rmtree(base, ignore_errors=True)
    corpus = _corpus(spark, synthetic_corpus_pdf(50))
    spimi.build_index(spark, corpus, base, n_shards=2)
    spimi.delete_docs(spark, base, corpus.select("doc_id"))
    eng = Engine(spark, base)
    q = spark.createDataFrame([(0, "common_util")],
                              "query_id long, query string")
    assert eng.search(q, k=5, mode="bmw").count() == 0
    assert eng.search(q, k=5, mode="exhaustive").count() == 0
    spimi.compact_index(spark, base)
    meta = spimi.load_meta(spark, spimi.IndexPaths(base))
    assert meta["n_docs"] == 0 and meta["avgdl"] == 0.0
    eng2 = Engine(spark, base)
    assert eng2.search(q, k=5, mode="bmw").count() == 0
