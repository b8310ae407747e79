"""Structured Streaming: incremental corpus ingest + streaming analytics.

The reference has no streaming at all (SURVEY.md §2B); these are the
Spark-native extensions a continuously-growing corpus needs:

* :func:`stream_index_appends` — file-source stream of new corpus rows →
  ``foreachBatch`` → :func:`spimi.append_index`. Each micro-batch becomes
  a new index generation (doc-disjoint shards), so query code is
  unchanged and BM25 stays exact under the updated global stats (the
  bmw 'safe' bound mode). foreachBatch is AT-LEAST-once; end-to-end
  exactly-once comes from append_index's commit protocol (epoch id
  recorded at the scalars commit + orphan-partition cleanup on retry),
  not from the checkpoint alone.
* :func:`streaming_doc_stats` — running token/doc counts with watermark.
* :func:`windowed_event_counts` — event-time windows + watermark for
  late data over an events stream (the classic pattern, used by tests
  with Trigger.AvailableNow for determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rerankers_spark.functions.tokenize import tokenize_col
from rerankers_spark.index import spimi

CORPUS_STREAM_SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)


def read_corpus_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of corpus rows (json lines per file)."""
    return (
        spark.readStream.schema(CORPUS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .json(input_dir)
    )


def stream_index_appends(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    checkpoint_dir: str,
    maintain_every: int | None = None,
    max_generations: int = 4,
    tombstone_ratio: float = 0.10,
    gc_retention_secs: float = 3600.0,
):
    """Returns a StreamingQuery appending each micro-batch to the index.

    Use ``.trigger(availableNow=True)`` semantics via start+await in
    tests; in production this runs continuously and each batch is one
    index generation.

    maintain_every: run one ``Engine.maintain`` cycle after every N
    batches — streaming ingest otherwise accretes one tiny generation
    per batch forever. The hook runs INSIDE foreachBatch, so appends,
    compactions, deletes-by-policy and grace-period GC all serialize on
    the stream's single writer thread (the single-writer scheduler the
    compaction protocol asks for). The generation count then stays
    ≤ max(max_generations, maintain_every + max_generations - 1) and
    search results are unchanged by construction (compaction
    invariants). Maintenance keys off the cumulative batch count, so a
    replayed batch re-triggers the same (idempotent-by-invariants)
    cycle rather than skipping it.
    """
    stream = read_corpus_stream(spark, input_dir)
    n_batches = [0]
    engine_box: list = []

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        corpus = batch_df.withColumn(
            "doc_id", F.xxhash64("repo", "path", "commit")
        ).withColumn("content_sha256", F.sha2(F.col("content"), 256))
        # batch_id = the replay guard: foreachBatch is at-least-once, and
        # append_index's commit protocol turns redelivery into a no-op
        spimi.append_index(spark, corpus, index_path, batch_id=batch_id)
        n_batches[0] += 1
        if maintain_every and n_batches[0] % maintain_every == 0:
            from rerankers_spark.query.executor import Engine

            if not engine_box:
                engine_box.append(Engine(spark, index_path))
            engine_box[0].refresh()  # see this batch's generation
            engine_box[0].maintain(
                max_generations=max_generations,
                tombstone_ratio=tombstone_ratio,
                gc_retention_secs=gc_retention_secs)

    return (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


QUERY_STREAM_SCHEMA = "query_id long, query string"


def read_query_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of query rows (json lines per file)."""
    return (
        spark.readStream.schema(QUERY_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .json(input_dir)
    )


def stream_query_search(
    spark: SparkSession,
    engine,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    mode: str = "auto",
):
    """Continuous query serving: a stream of (query_id, query) rows →
    ``foreachBatch`` → ``Engine.search`` → parquet results sink
    partitioned by epoch.

    Each micro-batch is one distributed search over the CURRENT index
    (appends land as new generations, visible to the next batch with no
    restart). foreachBatch is at-least-once; idempotence comes from the
    sink layout: every epoch owns its ``batch_id`` partition and the
    write uses dynamic partition overwrite, so a replayed epoch
    overwrites its own partition instead of duplicating rows.
    """
    stream = read_query_stream(spark, input_dir)

    def _answer(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = engine.search(batch_df, k=k, mode=mode).withColumn(
            "batch_id", F.lit(int(batch_id)))
        (res.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(output_dir))

    return (
        stream.writeStream.foreachBatch(_answer)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_doc_stats(stream: DataFrame) -> DataFrame:
    """Running per-lang doc/token counts over a corpus stream."""
    return (
        stream.withColumn("n_tokens", F.size(tokenize_col("content")))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed counts with a watermark: late rows inside the
    watermark still update their window; older ones are dropped."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n", "sum_value",
        )
    )
