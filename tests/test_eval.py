"""NDCG evaluation machinery + the consistency-notebook pipeline shape
run end-to-end with the deterministic stub scorer (no model downloads;
the REAL model's 0.724 gate needs torch — gated, documented)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rerankers_spark import eval as ev
from rerankers_spark.query.executor import Engine


def test_ndcg_perfect_and_inverted():
    qrels = {1: 3.0, 2: 2.0, 3: 1.0}
    assert ev.ndcg_at_k([1, 2, 3], qrels, k=3) == pytest.approx(1.0)
    worst = ev.ndcg_at_k([3, 2, 1], qrels, k=3)
    assert 0 < worst < 1.0
    assert ev.ndcg_at_k([9, 8, 7], qrels, k=3) == 0.0
    assert ev.ndcg_at_k([1], {}, k=3) == 0.0


def test_ndcg_known_value():
    # gains [1,0,1] → dcg = 1 + 0 + 1/log2(4); idcg = 1 + 1/log2(3)
    got = ev.ndcg_at_k(["a", "x", "b"], {"a": 1.0, "b": 1.0}, k=3)
    expect = (1 + 1 / math.log2(4)) / (1 + 1 / math.log2(3))
    assert got == pytest.approx(expect)


def test_mean_ndcg_filters_to_qrels():
    run = {0: [1, 2], 1: [3], 9: [5]}
    qrels = {0: {1: 1.0}, 1: {4: 1.0}}
    assert ev.mean_ndcg(run, qrels, k=2) == pytest.approx((1.0 + 0.0) / 2)


def test_ndcg_df_matches_python(spark):
    results = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3), (1, 7, 1), (1, 8, 2)],
        "query_id long, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 2.0), (0, 3, 1.0), (1, 8, 1.0)],
        "query_id long, doc_id long, rel double",
    )
    got = {r["query_id"]: r["ndcg"] for r in ev.ndcg_df(results, qrels).collect()}
    assert got[0] == pytest.approx(1.0)
    expect_q1 = ev.ndcg_at_k([7, 8], {8: 1.0}, k=10)
    assert got[1] == pytest.approx(expect_q1)


def test_consistency_pipeline_shape(spark, tiny_corpus, tiny_queries):
    """The notebook's E2E shape (corpus → first stage → rerank → NDCG
    gate), with the stub scorer and oracle-derived qrels: the BM25 top-3
    of each query is 'relevant'. The rerank stage must keep NDCG well
    above random, and the gate helper accepts the measured value."""
    import shutil

    shutil.rmtree("/tmp/eval_index", ignore_errors=True)
    eng = Engine.build(spark, tiny_corpus, "/tmp/eval_index", n_shards=4,
                       scorer="overlap")
    first = eng.search(tiny_queries, k=3)
    qrels = first.select("query_id", "doc_id", F.lit(1.0).alias("rel"))
    reranked = eng.rank(tiny_queries, tiny_corpus, first_k=20, final_k=10)
    ndcg = ev.ndcg_df(reranked.select("query_id", "doc_id", "rank"), qrels)
    mean = ndcg.agg(F.avg("ndcg")).collect()[0][0]
    # well above the ~0.1 random-permutation floor (overlap scorer is a
    # weak but real signal; quality gates with the REAL model need torch)
    assert mean > 0.3
    assert ev.consistency_gate(mean, mean, tol=0.01)
    assert not ev.consistency_gate(0.5, 0.724, tol=0.01)
