"""Listwise permutation reranking — parsing semantics mirror the
reference (rerankers/models/rankgpt_rankers.py:62-99)."""

from __future__ import annotations

from rerankers_spark.rerank import listwise


def test_clean_response():
    assert listwise.clean_response("[2] > [1] > [3]") == [1, 0, 2]
    assert listwise.clean_response("no digits here") == []


def test_remove_duplicate_order_preserving():
    assert listwise.remove_duplicate([2, 1, 2, 0, 1]) == [2, 1, 0]


def test_receive_permutation_completes_missing():
    # reference rankgpt_rankers.py:92 — missing indices appended in
    # original order; out-of-range dropped
    assert listwise.receive_permutation(4, "[3] > [1]") == [2, 0, 1, 3]
    assert listwise.receive_permutation(3, "[9] > [2]") == [1, 0, 2]
    assert listwise.receive_permutation(3, "") == [0, 1, 2]


def test_truncate_words():
    text = " ".join(str(i) for i in range(500))
    out = listwise.truncate_words(text)
    assert len(out.split()) == 300


def test_prompt_shape():
    p = listwise.build_permutation_prompt("q", ["alpha", "beta"])
    assert "[1] alpha" in p and "[2] beta" in p
    assert "[1] > [2]" in p


def test_rank_has_no_scores():
    rr = listwise.ListwiseReranker()
    ranked = rr.rank("hash join", ["hash join here", "nothing", "join"])
    assert not ranked.has_scores
    assert all(r.score is None for r in ranked)
    top = ranked.top_k(3)
    assert [t.doc_id for t in top] == [0, 2, 1]
    assert [t.rank for t in top] == [1, 2, 3]


def test_sliding_window_covers_long_lists():
    rr = listwise.ListwiseReranker(window_size=5, stride=2)
    docs = ["x"] * 30
    docs[17] = "hash join match"
    ranked = rr.rank("hash join", docs)
    assert ranked.top_k(1)[0].doc_id == 17


def test_rank_df_distributed(spark):
    cands = spark.createDataFrame(
        [
            (0, 10, "hash join", "hash join impl"),
            (0, 11, "hash join", "unrelated"),
            (0, 12, "hash join", "join only"),
            (1, 20, "merge", "zzz"),
            (1, 21, "merge", "merge sort"),
        ],
        "query_id long, doc_id long, query string, text string",
    )
    out = {(r["query_id"], r["doc_id"]): r["rank"]
           for r in listwise.ListwiseReranker().rank_df(cands).collect()}
    assert out[(0, 10)] == 1 and out[(0, 12)] == 2 and out[(0, 11)] == 3
    assert out[(1, 21)] == 1 and out[(1, 20)] == 2
