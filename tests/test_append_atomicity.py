"""Append commit protocol: the scalars write publishes a generation;
orphan rows from a crashed append are invisible and a replay never
double-indexes (spimi.append_index docstring)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from rerankers_spark.corpus import synthetic_corpus_pdf, with_doc_id
from rerankers_spark.index import spimi
from rerankers_spark.query.executor import Engine
from tests.oracle import BM25Oracle

BASE = "/tmp/test_append_atomic"


def _results(spark, q):
    eng = Engine(spark, BASE)
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in eng.search(q, k=10, mode="bmw").collect()
    )


def test_crashed_append_is_invisible_and_replay_is_exact(spark):
    pdf = synthetic_corpus_pdf(400, seed=3)
    shutil.rmtree(BASE, ignore_errors=True)
    first = with_doc_id(spark.createDataFrame(pdf.iloc[:250]))
    second = with_doc_id(spark.createDataFrame(pdf.iloc[250:]))
    spimi.build_index(spark, first, BASE, n_shards=4)
    q = spark.createDataFrame(
        [(0, "common_util"), (1, "def return class")],
        "query_id long, query string",
    )
    before = _results(spark, q)

    # a real append, then roll scalars back to the pre-append row — the
    # data tables now hold exactly what an append that crashed right
    # before its commit leaves behind (orphan gen-1 partitions)
    shutil.copytree(f"{BASE}/scalars", "/tmp/scalars_pre_append")
    spimi.append_index(spark, second, BASE, batch_id=7)
    shutil.rmtree(f"{BASE}/scalars")
    shutil.copytree("/tmp/scalars_pre_append", f"{BASE}/scalars")
    shutil.rmtree("/tmp/scalars_pre_append")

    meta = spimi.load_meta(spark, spimi.IndexPaths(BASE))
    assert meta["generation"] == 0 and meta["n_docs"] == 250
    # orphans invisible: identical answers to the pre-append index
    assert _results(spark, q) == before

    # retry of the same batch: must clean the orphans and commit exactly
    # one copy of the generation
    spimi.append_index(spark, second, BASE, batch_id=7)
    meta = spimi.load_meta(spark, spimi.IndexPaths(BASE))
    assert meta["generation"] == 1 and meta["n_docs"] == 400

    full = with_doc_id(spark.createDataFrame(pdf))
    rows = full.select("doc_id", "content").collect()
    oracle = BM25Oracle([r["doc_id"] for r in rows],
                        [r["content"] for r in rows])
    got = _results(spark, q)
    by_q: dict = {}
    for qid, rank, doc, score in got:
        by_q.setdefault(qid, []).append((doc, score))
    for qid, qtext in [(0, "common_util"), (1, "def return class")]:
        expected = oracle.topk(qtext, k=10)
        assert [d for d, _ in by_q[qid]] == [d for d, _ in expected]
        for (_, s_got), (_, s_exp) in zip(by_q[qid], expected):
            assert s_got == pytest.approx(s_exp, abs=1e-9)
    # no duplicate rows anywhere: docstats rows unique per doc, manifest
    # one row per shard, termstats one contribution row per (term, gen)
    ds = spark.read.parquet(f"{BASE}/docstats")
    assert ds.count() == ds.select("doc_id").distinct().count() == 400
    man = spark.read.parquet(f"{BASE}/manifest")
    assert man.count() == man.select("shard_id").distinct().count()
    ts = spark.read.parquet(f"{BASE}/termstats")
    assert ts.count() == ts.select("term", "gen").distinct().count()

    # replay AFTER commit (same batch_id): a no-op
    spimi.append_index(spark, second, BASE, batch_id=7)
    meta = spimi.load_meta(spark, spimi.IndexPaths(BASE))
    assert meta["generation"] == 1 and meta["n_docs"] == 400
    assert _results(spark, q) == got
