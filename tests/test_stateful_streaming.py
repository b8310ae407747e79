"""applyInPandasWithState sessionization: state carries across
micro-batches, gaps close sessions in-stream, event-time timeout flushes
held sessions once the watermark passes."""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import functions as F

from rerankers_spark.streaming.stateful import stateful_sessionize

EVENT_SCHEMA = "user_id long, event_id long, ts string, value double"


def _write_batch(path: str, rows) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(
                {"user_id": r[0], "event_id": r[1], "ts": r[2],
                 "value": r[3]}) + "\n")


def test_stateful_sessionize_stream(spark):
    in_dir = "/tmp/test_sess_in"
    ckpt = "/tmp/test_sess_ckpt"
    for d in (in_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(in_dir)

    # batch 1: user 1 has two sessions separated by a >30min gap inside
    # the batch; user 2 starts a session that continues in batch 2.
    _write_batch(f"{in_dir}/b0.json", [
        (1, 1, "2026-01-01 10:00:00", 1.0),
        (1, 2, "2026-01-01 10:10:00", 2.0),
        (1, 3, "2026-01-01 11:30:00", 4.0),   # gap 80min → new session
        (2, 4, "2026-01-01 10:00:00", 8.0),
    ])
    # batch 2: user 2's session continues (25min gap, same session),
    # then a far-future event pushes the watermark (2h default) past
    # every earlier session's last+gap, flushing all held sessions.
    _write_batch(f"{in_dir}/b1.json", [
        (2, 5, "2026-01-01 10:25:00", 16.0),
        (9, 6, "2026-01-02 12:00:00", 0.5),
    ])

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        stateful_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql("SELECT * FROM sessions_out").collect()
    got = {
        (r["user_id"], r["session_start"].isoformat()): (
            r["n_events"], r["sum_value"], r["session_end"].isoformat())
        for r in rows
    }
    # user 1 session A closed by the in-stream gap
    assert got[(1, "2026-01-01T10:00:00")] == (
        2, 3.0, "2026-01-01T10:10:00")
    # user 1 session B and user 2's cross-batch session flushed by the
    # watermark timeout after the far-future event
    assert got[(1, "2026-01-01T11:30:00")] == (
        1, 4.0, "2026-01-01T11:30:00")
    assert got[(2, "2026-01-01T10:00:00")] == (
        2, 24.0, "2026-01-01T10:25:00")
    # the far-future event's own session is still open (watermark has
    # not passed it) — exactly the sessions above and nothing else
    assert len(got) == 3


def test_stateful_matches_batch_sessionize_semantics(spark):
    """Closed sessions from the stateful operator agree with the batch
    events_sessionize aggregation on the same data (n_events/sum_value
    per (user, session_start))."""
    from rerankers_spark.driver_contract import q_events_sessionize

    in_dir = "/tmp/test_sess_in2"
    ckpt = "/tmp/test_sess_ckpt2"
    for d in (in_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(in_dir)
    rows = [
        (5, 1, "2026-03-01 09:00:00", 1.0),
        (5, 2, "2026-03-01 09:20:00", 1.0),
        (5, 3, "2026-03-01 10:30:00", 1.0),
        (5, 4, "2026-03-01 10:40:00", 1.0),
        (6, 5, "2026-03-01 09:05:00", 2.0),
        # sentinel far in the future to flush everything via watermark
        (99, 9, "2026-03-05 00:00:00", 0.0),
    ]
    _write_batch(f"{in_dir}/b0.json", rows)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .json(in_dir)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        stateful_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions_out2")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["session_start"].isoformat(), r["n_events"],
         r["sum_value"])
        for r in spark.sql("SELECT * FROM sessions_out2").collect()
    )
    assert got == [
        (5, "2026-03-01T09:00:00", 2, 2.0),
        (5, "2026-03-01T10:30:00", 2, 2.0),
        (6, "2026-03-01T09:05:00", 1, 2.0),
    ]
