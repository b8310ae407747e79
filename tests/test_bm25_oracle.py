"""Rank-identity gate (BASELINE.json north_rule): Spark exhaustive BM25
top-k docIDs AND float64 scores match the single-node numpy oracle on the
synthetic corpus + reference query set."""

from __future__ import annotations

import pytest

from rerankers_spark.operators import bm25
from tests.oracle import BM25Oracle


@pytest.fixture(scope="module")
def oracle(tiny_corpus):
    rows = tiny_corpus.select("doc_id", "content").collect()
    return BM25Oracle([r["doc_id"] for r in rows], [r["content"] for r in rows])


def test_scalars_match(tiny_corpus, oracle):
    n, avgdl = bm25.corpus_scalars(tiny_corpus)
    assert n == oracle.n
    assert abs(avgdl - oracle.avgdl) < 1e-9


def test_df_matches(tiny_corpus, oracle):
    ts = {r["term"]: r["df"] for r in bm25.term_stats(
        bm25.postings(tiny_corpus)).collect()}
    assert ts == dict(oracle.df)


def test_topk_rank_identical(tiny_corpus, tiny_queries, oracle):
    got = bm25.bm25_topk(tiny_queries, tiny_corpus, k=10).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    queries = {r["query_id"]: r["query"] for r in tiny_queries.collect()}
    checked_nonempty = 0
    for qid, qtext in queries.items():
        expected = oracle.topk(qtext, k=10)
        actual = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in actual] == [d for d, _ in expected], (
            f"doc order mismatch for query {qid!r}: {qtext!r}"
        )
        for r, (_, s) in zip(actual, expected):
            assert r["score"] == pytest.approx(s, abs=1e-9)
        if expected:
            checked_nonempty += 1
    assert checked_nonempty >= 20  # the query set must actually hit


def test_out_of_vocab_query_returns_empty(spark, tiny_corpus):
    q = spark.createDataFrame(
        [(0, "zz_out_of_vocab_zz")], "query_id long, query string"
    )
    assert bm25.bm25_topk(q, tiny_corpus, k=10).count() == 0
