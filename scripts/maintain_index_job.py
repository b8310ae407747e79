"""spark-submit job: index maintenance — soft deletes and compaction.

Completes the index lifecycle for cluster operation (build_index_job →
streaming/batch appends → THIS → queries):

  # tombstone a set of doc ids (any parquet with a doc_id column)
  spark-submit --py-files rerankers_spark.zip scripts/maintain_index_job.py \
      --index /data/index --delete-ids /data/deletes_parquet

  # merge generations + physically purge tombstones + recompute stats
  spark-submit --py-files rerankers_spark.zip scripts/maintain_index_job.py \
      --index /data/index --compact

Both flags together = delete then compact in one submission. Deletes are
visible to queries immediately (with pre-delete global stats); compaction
is the durable purge — schedule it on tombstone volume or generation
count (spimi.compact_index docstring).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from rerankers_spark.index.spimi import (  # noqa: E402
    IndexPaths,
    compact_index,
    delete_docs,
    load_meta,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--delete-ids",
                    help="parquet path with a doc_id column to tombstone")
    ap.add_argument("--compact", action="store_true")
    args = ap.parse_args()
    if not args.delete_ids and not args.compact:
        ap.error("nothing to do: pass --delete-ids and/or --compact")

    spark = SparkSession.builder.appName(
        "rerankers-spark-maintain").getOrCreate()

    if args.delete_ids:
        ids = spark.read.parquet(args.delete_ids)
        n = ids.select("doc_id").distinct().count()
        delete_docs(spark, args.index, ids)
        print(f"tombstoned {n} doc ids in {args.index}")

    if args.compact:
        t0 = time.time()
        compact_index(spark, args.index)
        meta = load_meta(spark, IndexPaths(args.index))
        print(f"compacted {args.index} in {time.time() - t0:.1f}s: "
              f"n_docs={meta['n_docs']} generation={meta['generation']} "
              f"n_shards={meta['n_shards']}")


if __name__ == "__main__":
    main()
