"""Ingest-time incremental dedup: each new batch is deduped against the
already-indexed corpus (persisted fingerprint + minhash state) and within
itself — batch-vs-corpus candidate joins only, never a recluster of the
world — and only survivors are appended. Replay of a batch is a no-op on
every leg (operators/dedup.incremental_dedup, streaming/ingest.
append_corpus_batch)."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

from rerankers_spark.corpus import with_doc_id
from rerankers_spark.index import spimi
from rerankers_spark.operators import dedup
from rerankers_spark.streaming import ingest

SCHEMA = "repo string, path string, commit string, lang string, content string"


def _doc(path: str, text: str, repo: str = "r1"):
    return (repo, path, "c0", "py", text)


def _text(tag: str, n: int = 60) -> str:
    """n distinct tokens unique to `tag` — guaranteed no accidental
    near-dups between different tags."""
    return " ".join(f"{tag}tok{j}" for j in range(n))


def test_state_schema_pinned():
    """The index-layer literal must equal the operator-layer schema."""
    assert spimi.IndexPaths.SCHEMAS["dedup_state"] == \
        dedup.DEDUP_STATE_SCHEMA


def test_incremental_dedup_batch_semantics(spark):
    """Unit semantics vs a hand-planted corpus: exact dup vs corpus
    dropped (fingerprint), near dup vs corpus dropped (minhash est),
    within-batch twins resolve to min doc_id, unique + unshingleable
    docs survive, and state_rows cover exactly the survivors."""
    base = _text("seed")
    corpus = with_doc_id(spark.createDataFrame(
        [_doc("s0", base, "r0"), _doc("s1", _text("other"), "r0")],
        SCHEMA))
    state = dedup.dedup_state_rows(corpus, text_col="content") \
        .withColumn("ingest_batch", F.lit("seed"))

    twin = _text("twin")
    batch = with_doc_id(spark.createDataFrame([
        _doc("b_exact", base),                 # exact dup of corpus s0
        _doc("b_near", base + " extraword"),   # near dup of corpus s0
        _doc("b_uniq", _text("uniq")),         # unique -> survives
        _doc("a_twin", twin),                  # within-batch near pair
        _doc("b_twin", twin + " tailword"),
        _doc("b_short", "ab"),                 # unshingleable -> survives
    ], SCHEMA))

    keep, state_rows = dedup.incremental_dedup(
        batch, state, threshold=0.5, text_col="content")
    kept = {r["path"]: r["doc_id"] for r in keep.collect()}

    assert "b_exact" not in kept
    assert "b_near" not in kept
    assert "b_uniq" in kept and "b_short" in kept
    # exactly one twin survives: the min doc_id (frozen tie-break)
    twins = {r["path"]: r["doc_id"] for r in batch.where(
        F.col("path").isin("a_twin", "b_twin")).collect()}
    surviving_twin = min(twins, key=twins.get)
    assert (surviving_twin in kept) and \
        (({"a_twin", "b_twin"} - {surviving_twin}).pop() not in kept)

    srows = {r["doc_id"]: r for r in state_rows.collect()}
    assert set(srows) == set(kept.values())
    assert srows[kept["b_short"]]["mh0"] is None  # unshingleable
    assert srows[kept["b_uniq"]]["mh0"] is not None
    assert all(r["fp"] is not None for r in srows.values())


def test_incremental_dedup_empty_state(spark):
    """First-ever batch (no corpus yet): only within-batch dedup runs."""
    batch = with_doc_id(spark.createDataFrame([
        _doc("x0", _text("aaa")),
        _doc("x1", _text("aaa")),   # exact twin of x0
        _doc("x2", _text("bbb")),
    ], SCHEMA))
    state = spark.createDataFrame([], dedup.DEDUP_STATE_SCHEMA)
    keep, rows = dedup.incremental_dedup(
        batch, state, threshold=0.5, text_col="content")
    assert keep.count() == 2
    assert rows.count() == 2


def test_streaming_ingest_with_dedup_and_replay(spark):
    """End-to-end: seed index + bootstrapped state, two streamed batches
    with planted exact/near/cross-batch dups, then an explicit replay of
    the last epoch — index and state must be byte-stable."""
    in_dir = "/tmp/test_stream_dedup_in"
    idx = "/tmp/test_stream_dedup_index"
    ckpt = "/tmp/test_stream_dedup_ckpt"
    for d in (in_dir, idx, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(in_dir)

    seed_rows = [_doc(f"seed{i}", _text(f"seed{i}"), "r0")
                 for i in range(10)]
    seed_df = with_doc_id(spark.createDataFrame(seed_rows, SCHEMA))
    spimi.build_index(spark, seed_df, idx, n_shards=4)
    paths = spimi.IndexPaths(idx)
    # bootstrap the dedup state for the pre-existing corpus
    paths.write(
        dedup.dedup_state_rows(seed_df, text_col="content")
        .withColumn("ingest_batch", F.lit("seed")),
        "dedup_state", mode="append", partition_by=["ingest_batch"])

    batch1 = [
        _doc(f"new{i}", _text(f"new{i}")) for i in range(5)
    ] + [
        _doc("dup_exact", _text("seed3")),          # exact dup of seed3
        _doc("dup_near", _text("seed4") + " zz"),   # near dup of seed4
    ]
    with open(f"{in_dir}/b1.json", "w") as f:
        for r in batch1:
            f.write(json.dumps(dict(zip(
                ["repo", "path", "commit", "lang", "content"], r))) + "\n")
    q = ingest.stream_index_appends(spark, in_dir, idx, ckpt,
                                    dedup_threshold=0.5)
    q.awaitTermination(180)
    meta = spimi.load_meta(spark, paths)
    assert meta["n_docs"] == 15  # 10 seed + 5 new, both dups dropped

    batch2 = [
        _doc("late_dup", _text("new2") + " yy"),    # cross-batch near dup
        _doc("new5", _text("new5")),
        _doc("new6", _text("new6")),
    ]
    with open(f"{in_dir}/b2.json", "w") as f:
        for r in batch2:
            f.write(json.dumps(dict(zip(
                ["repo", "path", "commit", "lang", "content"], r))) + "\n")
    q = ingest.stream_index_appends(spark, in_dir, idx, ckpt,
                                    dedup_threshold=0.5)
    q.awaitTermination(180)
    meta = spimi.load_meta(spark, paths)
    assert meta["n_docs"] == 17  # + new5, new6; late_dup dropped

    ds = spark.read.parquet(f"{idx}/docstats")
    assert ds.count() == ds.select("doc_id").distinct().count() == 17
    surviving_paths = {r["path"] for r in with_doc_id(
        spark.createDataFrame(batch1 + batch2, SCHEMA)).join(
        ds.select("doc_id"), "doc_id", "left_semi").collect()}
    assert surviving_paths == {f"new{i}" for i in range(7)}

    state = paths.read(spark, "dedup_state")
    state_before = sorted(map(tuple, state.collect()))
    # survivors' state rows landed under their epoch partitions
    assert {r["ingest_batch"] for r in state.collect()} == \
        {"seed", "0", "1"}

    # REPLAY the last epoch (foreachBatch is at-least-once): every leg
    # must no-op — same index meta, same doc set, same state rows
    replay_df = spark.createDataFrame(batch2, SCHEMA)
    ingest.append_corpus_batch(spark, replay_df, idx, batch_id=1,
                               dedup_threshold=0.5)
    meta2 = spimi.load_meta(spark, paths)
    assert meta2["n_docs"] == 17
    assert meta2["generation"] == meta["generation"]
    assert spark.read.parquet(f"{idx}/docstats").count() == 17
    state_after = sorted(map(tuple, paths.read(
        spark, "dedup_state").collect()))
    assert state_after == state_before
