"""Headline benchmark (driver-run per round; prints ONE JSON line).

Measures on $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) with
local[$SPARK_GRAFT_CPUS]:

* q_index_build   — SPIMI-style stats+postings build (the docs/sec metric)
* q_bm25_exhaustive — exhaustive BM25 top-10 for the fixed query set
* q_bm25_queryset — 50-query synthetic set top-10 (queries/sec metric)

Scaling-efficiency evidence (north rule, N vs 4N) is produced by
scripts/scaling_run.py which runs this same job at local[8] and local[32].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rerankers_spark.corpus import documents_as_corpus  # noqa: E402
from rerankers_spark.driver_contract import ENTRY_QUERIES  # noqa: E402
from rerankers_spark.operators import bm25  # noqa: E402
from rerankers_spark.operators.topk import topk  # noqa: E402
from rerankers_spark.session import get_spark  # noqa: E402


def synthetic_queryset(spark, n=50):
    """50 deterministic queries over the documents vocabulary."""
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark("rerankers-spark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    timings: dict[str, float] = {}

    corpus = documents_as_corpus(spark, sf_dir)
    n_docs = corpus.count()

    # --- index build: postings + termstats + scalars, materialized ----------
    t0 = time.perf_counter()
    p = bm25.postings(corpus)
    p.write.mode("overwrite").parquet("/tmp/bench_postings")
    ts = bm25.term_stats(
        spark.read.parquet("/tmp/bench_postings")
    )
    ts.write.mode("overwrite").parquet("/tmp/bench_termstats")
    n, avgdl = bm25.corpus_scalars(corpus)
    timings["q_index_build"] = time.perf_counter() - t0

    p2 = spark.read.parquet("/tmp/bench_postings")
    ts2 = spark.read.parquet("/tmp/bench_termstats")

    # --- exhaustive BM25, fixed entry query set ------------------------------
    qdf = spark.createDataFrame(ENTRY_QUERIES, "query_id long, query string")
    t0 = time.perf_counter()
    scored = bm25.score_candidates(qdf, p2, ts2, n, avgdl)
    rows = topk(scored, 10).count()
    timings["q_bm25_exhaustive"] = time.perf_counter() - t0

    # --- 50-query set (query-throughput metric) ------------------------------
    q50 = synthetic_queryset(spark, 50)
    t0 = time.perf_counter()
    scored = bm25.score_candidates(q50, p2, ts2, n, avgdl)
    topk(scored, 10).count()
    timings["q_bm25_queryset50"] = time.perf_counter() - t0

    total = sum(timings.values())
    result = {
        "metric": "bm25_engine_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_docs": n_docs,
        "docs_per_sec_index_build": round(n_docs / timings["q_index_build"], 1),
        "queries_per_sec_bm25": round(50 / timings["q_bm25_queryset50"], 1),
        "topk_rows": rows,
        "cpus": cpus,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
