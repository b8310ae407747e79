"""Structured Streaming ingest (incremental index generations) and
multimodal binary-column plumbing."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from rerankers_spark.corpus import synthetic_corpus_pdf
from rerankers_spark.index import spimi
from rerankers_spark.query.executor import Engine
from rerankers_spark.sources import multimodal
from rerankers_spark.streaming import ingest
from tests.oracle import BM25Oracle


def test_append_index_matches_full_rebuild(spark):
    """Index built incrementally (300 docs, then +200) must answer
    queries rank-identically to the oracle over all 500 docs."""
    pdf = synthetic_corpus_pdf(500)
    base = "/tmp/test_append_index"
    shutil.rmtree(base, ignore_errors=True)

    from rerankers_spark.corpus import with_doc_id

    first = with_doc_id(spark.createDataFrame(pdf.iloc[:300]))
    second = with_doc_id(spark.createDataFrame(pdf.iloc[300:]))
    spimi.build_index(spark, first, base, n_shards=4)
    spimi.append_index(spark, second, base)

    meta = spimi.load_meta(spark, spimi.IndexPaths(base))
    assert meta["generation"] == 1
    assert meta["n_docs"] == 500

    full = with_doc_id(spark.createDataFrame(pdf))
    rows = full.select("doc_id", "content").collect()
    oracle = BM25Oracle([r["doc_id"] for r in rows],
                        [r["content"] for r in rows])

    eng = Engine(spark, base)
    q = spark.createDataFrame(
        [(0, "common_util"), (1, "def return class")],
        "query_id long, query string",
    )
    got = eng.search(q, k=10, mode="bmw").collect()  # auto 'safe' bounds
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, qtext in [(0, "common_util"), (1, "def return class")]:
        expected = oracle.topk(qtext, k=10)
        actual = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [r["doc_id"] for r in actual] == [d for d, _ in expected]
        for r, (_, s) in zip(actual, expected):
            assert r["score"] == pytest.approx(s, abs=1e-9)


def test_streaming_index_ingest(spark):
    """File-source stream → foreachBatch append; AvailableNow drains all
    files, result queryable and exact."""
    pdf = synthetic_corpus_pdf(120)
    in_dir = "/tmp/test_stream_in"
    idx = "/tmp/test_stream_index"
    ckpt = "/tmp/test_stream_ckpt"
    for d in (in_dir, idx, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(in_dir)

    from rerankers_spark.corpus import with_doc_id

    # seed the index with the first 40 docs (generation 0)
    spimi.build_index(
        spark, with_doc_id(spark.createDataFrame(pdf.iloc[:40])), idx,
        n_shards=4,
    )
    # remaining docs arrive as stream files
    for fi, lo in enumerate(range(40, 120, 40)):
        chunk = pdf.iloc[lo:lo + 40]
        with open(f"{in_dir}/part{fi}.json", "w") as f:
            for _, r in chunk.iterrows():
                f.write(json.dumps(dict(r)) + "\n")

    q = ingest.stream_index_appends(spark, in_dir, idx, ckpt)
    q.awaitTermination(120)

    meta = spimi.load_meta(spark, spimi.IndexPaths(idx))
    assert meta["n_docs"] == 120

    rows = with_doc_id(spark.createDataFrame(pdf)).select(
        "doc_id", "content").collect()
    oracle = BM25Oracle([r["doc_id"] for r in rows],
                        [r["content"] for r in rows])
    eng = Engine(spark, idx)
    qdf = spark.createDataFrame([(0, "common_util")],
                                "query_id long, query string")
    got = sorted(eng.search(qdf, k=10).collect(), key=lambda r: r["rank"])
    expected = oracle.topk("common_util", k=10)
    assert [r["doc_id"] for r in got] == [d for d, _ in expected]


def test_streaming_ingest_with_maintenance_bounds_generations(spark):
    """6-batch streamed ingest with maintain_every=2: the in-loop
    maintenance hook (tiered merges on the stream's single writer
    thread) must keep the visible generation count ≤ max_generations,
    and search stays exact vs the numpy oracle over the full corpus."""
    pdf = synthetic_corpus_pdf(280)
    in_dir = "/tmp/test_stream_maint_in"
    idx = "/tmp/test_stream_maint_index"
    ckpt = "/tmp/test_stream_maint_ckpt"
    for d in (in_dir, idx, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(in_dir)

    from rerankers_spark.corpus import with_doc_id

    spimi.build_index(
        spark, with_doc_id(spark.createDataFrame(pdf.iloc[:40])), idx,
        n_shards=4,
    )
    # 24 files × 10 docs; maxFilesPerTrigger=4 → 6 micro-batches
    for fi, lo in enumerate(range(40, 280, 10)):
        chunk = pdf.iloc[lo:lo + 10]
        with open(f"{in_dir}/part{fi:02d}.json", "w") as f:
            for _, r in chunk.iterrows():
                f.write(json.dumps(dict(r)) + "\n")

    q = ingest.stream_index_appends(spark, in_dir, idx, ckpt,
                                    maintain_every=2, max_generations=3)
    q.awaitTermination(300)

    paths = spimi.IndexPaths(idx)
    meta = spimi.load_meta(spark, paths)
    assert meta["n_docs"] == 280
    assert len(spimi.visible_generations(meta)) <= 3

    rows = with_doc_id(spark.createDataFrame(pdf)).select(
        "doc_id", "content").collect()
    oracle = BM25Oracle([r["doc_id"] for r in rows],
                        [r["content"] for r in rows])
    eng = Engine(spark, idx)
    qdf = spark.createDataFrame(
        [(0, "common_util"), (1, "def return class")],
        "query_id long, query string")
    got = eng.search(qdf, k=10, mode="bmw").collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, qtext in [(0, "common_util"), (1, "def return class")]:
        expected = oracle.topk(qtext, k=10)
        actual = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [r["doc_id"] for r in actual] == [d for d, _ in expected]
        for r, (_, s) in zip(actual, expected):
            assert r["score"] == pytest.approx(s, abs=1e-9)


def test_windowed_event_counts_batch_semantics(spark):
    """The windowed-agg definition applied to a static frame (streaming
    and batch share semantics for event-time windows)."""
    ev = spark.createDataFrame(
        [
            (1, "2026-01-01 10:05:00", "click", 1.0),
            (2, "2026-01-01 10:55:00", "click", 2.0),
            (3, "2026-01-01 11:05:00", "view", 3.0),
        ],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r["window_start"].hour, r["event_type"]): r["n"]
           for r in ingest.windowed_event_counts(ev).collect()}
    assert out[(10, "click")] == 2
    assert out[(11, "view")] == 1


def test_multimodal_feature_extraction(spark):
    media = multimodal.synthetic_media(spark, 20)
    out = multimodal.extract_features(media).collect()
    assert len(out) == 20
    by_id = {r["doc_id"]: r for r in out}
    assert all(len(r["feature"]) == multimodal.FEATURE_DIM for r in out)
    assert by_id[0]["decoder"] == "stub"
    # deterministic: same payload → same feature
    out2 = {r["doc_id"]: r["feature"]
            for r in multimodal.extract_features(media).collect()}
    assert out2[3] == by_id[3]["feature"]
    # sha256 lineage matches payload
    import hashlib

    payload = bytes(
        media.where(F.col("doc_id") == 1).collect()[0]["payload"])
    assert by_id[1]["payload_sha256"] == hashlib.sha256(payload).hexdigest()


def test_multimodal_real_decoder_stubbed(spark):
    media = multimodal.synthetic_media(spark, 3)
    with pytest.raises(Exception) as ei:
        multimodal.extract_features(media, require_real_decoder=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)


def test_frame_sample_plan(spark):
    media = multimodal.synthetic_media(spark, 9)
    frames = multimodal.frame_sample_plan(media, every_n=10).collect()
    assert all(r["frame_idx"] % 10 == 0 for r in frames)
    vids = {r["doc_id"] for r in frames}
    assert vids  # at least one video in the fixture
    plan = multimodal.frame_sample_plan(media)._jdf.queryExecution()\
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stream_query_search_matches_batch(spark):
    """Continuous query serving: streamed query files → foreachBatch
    search → epoch-partitioned parquet sink; results must equal the
    batch search for the same queries, and the sink layout must be
    epoch-owned (replay idempotence by dynamic partition overwrite)."""
    from rerankers_spark.corpus import synthetic_corpus, queries_table

    base = "/tmp/test_stream_qsearch"
    shutil.rmtree(base, ignore_errors=True)
    corpus = synthetic_corpus(spark, 300)
    eng = Engine.build(spark, corpus, f"{base}/index", n_shards=4)

    qdf = queries_table(spark, corpus, n_queries=8)
    queries = [(r["query_id"], r["query"]) for r in qdf.collect()]
    qdir = f"{base}/queries_in"
    os.makedirs(qdir, exist_ok=True)
    # two files → (with maxFilesPerTrigger=4) one availableNow pass
    for fi, chunk in enumerate([queries[:4], queries[4:]]):
        with open(f"{qdir}/q{fi}.json", "w") as f:
            for qid, qtext in chunk:
                f.write(json.dumps({"query_id": qid, "query": qtext})
                        + "\n")

    q = ingest.stream_query_search(
        spark, eng, qdir, f"{base}/results", f"{base}/ckpt", k=5,
        mode="bmw")
    q.awaitTermination(120)

    got = spark.read.parquet(f"{base}/results")
    assert "batch_id" in got.columns
    got_set = {(r["query_id"], r["doc_id"], r["rank"],
                round(r["score"], 9)) for r in got.collect()}
    exp_set = {(r["query_id"], r["doc_id"], r["rank"],
                round(r["score"], 9))
               for r in eng.search(qdf, k=5, mode="bmw").collect()}
    assert got_set == exp_set
    # epoch-owned sink partitions
    assert any(d.startswith("batch_id=")
               for d in os.listdir(f"{base}/results"))
