"""Headline benchmark (driver-run per round; prints ONE JSON line).

Measures on $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) with
local[$SPARK_GRAFT_CPUS]:

* q_index_build       — SPIMI block-index build, resumable layout
                        (docs-indexed/sec — the north-rule metric)
* q_bmw_queryset50    — 50-query BM25 top-10 via block-max WAND
                        (queries/sec — the north-rule metric)
* q_exhaustive_queryset50 — same queries, decode-everything path
* q_two_stage         — BM25 top-100 → pandas-UDF rerank → top-10

Scaling-efficiency evidence (north rule, N vs 4N cores) is produced by
scripts/scaling_run.py, which runs this file at local[8] and local[32]
and records the ratio in BENCH_SCALING.md / BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rerankers_spark.corpus import documents_as_corpus  # noqa: E402
from rerankers_spark.driver_contract import ENTRY_QUERIES  # noqa: E402
from rerankers_spark.query.executor import Engine  # noqa: E402
from rerankers_spark.session import get_spark  # noqa: E402


def synthetic_queryset(spark, n=50):
    """Deterministic queries over the documents vocabulary."""
    base = [q for _, q in ENTRY_QUERIES]
    vocab = ["hash", "join", "window", "agg", "stream", "spark", "query",
             "fast", "merge", "sort", "batch", "customer", "vector",
             "column", "scan", "table", "row", "filter", "group", "order"]
    qs = []
    for i in range(n):
        if i < len(base):
            qs.append((i, base[i]))
        else:
            k = 1 + (i % 5)
            qs.append((i, " ".join(vocab[(i * 7 + j * 3) % len(vocab)]
                                   for j in range(k))))
    return spark.createDataFrame(qs, "query_id long, query string")


def run(sf_dir: str, cpus: int, index_root: str = "/tmp/bench_index"):
    # The JOB must be identical across parallelism levels for the scaling
    # comparison to be meaningful: shard count and shuffle width are fixed
    # (64 = 2x the max core count), only the executor-thread count varies.
    # Driver heap is sized for local mode (all executors share one JVM).
    # BENCH_RAMDISK=1 puts shuffle + index on /dev/shm: this sandbox's
    # shared virtio disk has external IO contention that otherwise
    # bottlenecks every parallelism level identically, masking compute
    # scaling (a real cluster's disks scale with executors).
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    if os.environ.get("BENCH_RAMDISK") == "1":
        os.makedirs("/dev/shm/spark_local", exist_ok=True)
        os.environ.setdefault("SPARK_LOCAL_DIR", "/dev/shm/spark_local")
        index_root = "/dev/shm/bench_index"
    spark = get_spark("rerankers-spark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    corpus = documents_as_corpus(spark, sf_dir).cache()
    n_docs = corpus.count()
    index_path = f"{index_root}_{os.path.basename(sf_dir)}_{cpus}"
    shutil.rmtree(index_path, ignore_errors=True)

    # shard count depends only on the INPUT (not the core count), so runs
    # at different parallelism levels stay comparable; small corpora get
    # fewer shards to avoid pure-overhead tasks.
    n_shards = 64 if n_docs >= 100_000 else 16

    # Best-of-R per phase (default 2): this sandbox's shared virtio disk
    # has EXTERNAL IO-contention spikes (CLAUDE.md perf notes; observed
    # 1-row parquet writes going 0.2s → 6s), and a single sample can
    # record a spike instead of the engine. Identical work each repeat;
    # min is the standard contention-robust estimator.
    repeats = max(1, int(os.environ.get("BENCH_REPEATS", 2)))

    def best_of(fn) -> float:
        return min(fn() for _ in range(repeats))

    def build_once() -> float:
        shutil.rmtree(index_path, ignore_errors=True)
        t0 = time.perf_counter()
        Engine.build(spark, corpus, index_path,
                     n_shards=n_shards, scorer="overlap")
        return time.perf_counter() - t0

    timings["q_index_build"] = best_of(build_once)
    engine = Engine(spark, index_path, scorer="overlap")

    n_queries = int(os.environ.get("BENCH_QUERIES", 50))
    q50 = synthetic_queryset(spark, n_queries)

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    bmw_counts: list[int] = []
    timings["q_bmw_queryset50"] = best_of(
        lambda: timed(lambda: bmw_counts.append(
            engine.search(q50, k=10, mode="bmw").count())))
    n_bmw = bmw_counts[-1]
    timings["q_exhaustive_queryset50"] = best_of(
        lambda: timed(
            lambda: engine.search(q50, k=10, mode="exhaustive").count()))
    timings["q_two_stage"] = best_of(
        lambda: timed(
            lambda: engine.rank(q50, corpus, first_k=100, final_k=10,
                                mode="auto").count()))

    from rerankers_spark.index.spimi import index_stats

    stats = index_stats(spark, engine.paths)
    result = {
        "n_docs": n_docs,
        "timings": timings,
        "docs_per_sec_index_build": n_docs / timings["q_index_build"],
        "queries_per_sec_bmw": n_queries / timings["q_bmw_queryset50"],
        "queries_per_sec_two_stage": n_queries / timings["q_two_stage"],
        "bmw_rows": n_bmw,
        "n_queries": n_queries,
        "cpus": cpus,
        "index_compression_ratio": stats["compression_ratio"],
        "index_vb_bytes": stats["vb_bytes"],
    }
    spark.stop()
    return result


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    r = run(sf_dir, cpus)
    total = sum(r["timings"].values())
    print(json.dumps({
        "metric": "two_stage_engine_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in r["timings"].items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_docs": r["n_docs"],
        "docs_per_sec_index_build": round(r["docs_per_sec_index_build"], 1),
        "queries_per_sec_bmw": round(r["queries_per_sec_bmw"], 1),
        "queries_per_sec_two_stage": round(r["queries_per_sec_two_stage"],
                                           1),
        "n_queries": r["n_queries"],
        "cpus": cpus,
        "index_compression_ratio": r["index_compression_ratio"],
    }))


if __name__ == "__main__":
    main()
