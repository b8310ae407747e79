"""Warm long-lived-Engine throughput on the 800k bench corpus (VERDICT
r4 #5: track the 800k two-stage 2k-query row every round — the sf0.1
driver phase is scheduling-floor-dominated and can't see regressions).

Builds the index ONCE, then measures a long-lived Engine (cached
meta/termstats/blocks handles + tombstone broadcast) the way a serving
deployment runs it: first call cold, then best-of-3 warm per phase:

* bmw_2k      — 2,000-query BM25 top-10 via block-max WAND
* bmw_100k    — 100,000-query batch (amortizes the ~2.3s scheduling
                floor; the marginal-per-query number)
* two_stage_2k — BM25 top-100 cut -> pandas-UDF rerank -> top-10

Prints ONE JSON line; the recorded row lives in BENCH_SCALING.md.

Cold-number caveat (ADVICE r5): only bmw_2k's "cold" is truly cold —
later phases run on an Engine already warmed by the earlier ones
(cached handles, per-task decoded-block caches), so their cold_sec
understates a fresh Engine's first call.

Env: WARM_CORPUS_DIR (default /tmp/sfbench800k), WARM_N_DOCS (800000),
SPARK_GRAFT_CPUS (8), BENCH_RAMDISK=1 respected like bench.py;
WARM_REBUILD=1 forces a fresh index build even if one exists (set it
after any index-format or build-code change between rounds).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import synthetic_queryset  # noqa: E402
from rerankers_spark.corpus import documents_as_corpus  # noqa: E402
from rerankers_spark.query.executor import Engine  # noqa: E402
from rerankers_spark.session import get_spark  # noqa: E402
from scripts.make_bench_corpus import main as make_corpus  # noqa: E402


def main() -> None:
    corpus_dir = os.environ.get("WARM_CORPUS_DIR", "/tmp/sfbench800k")
    n_docs = int(os.environ.get("WARM_N_DOCS", "800000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    make_corpus(n_docs, corpus_dir)
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    index_root = "/tmp/warm_index"
    if os.environ.get("BENCH_RAMDISK") == "1":
        os.makedirs("/dev/shm/spark_local", exist_ok=True)
        os.environ.setdefault("SPARK_LOCAL_DIR", "/dev/shm/spark_local")
        index_root = "/dev/shm/warm_index"
    spark = get_spark("rerankers-spark-warm-bench", master=f"local[{cpus}]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = documents_as_corpus(spark, corpus_dir).cache()
    n = corpus.count()
    assert n == n_docs, (
        f"{corpus_dir} holds {n} docs but WARM_N_DOCS={n_docs} — stale "
        f"corpus dir from an earlier run with a different size; remove "
        f"it or point WARM_CORPUS_DIR elsewhere")
    index_path = f"{index_root}_{n}_{cpus}"
    if os.environ.get("WARM_REBUILD") == "1":
        shutil.rmtree(index_path, ignore_errors=True)
    if not os.path.exists(os.path.join(index_path, "scalars")):
        shutil.rmtree(index_path, ignore_errors=True)
        t0 = time.perf_counter()
        Engine.build(spark, corpus, index_path, n_shards=64,
                     scorer="overlap")
        build_sec = time.perf_counter() - t0
    else:
        build_sec = None  # reused a previous run's index
    engine = Engine(spark, index_path, scorer="overlap")

    q2k = synthetic_queryset(spark, 2_000).cache()
    q100k = synthetic_queryset(spark, 100_000).cache()
    q2k.count(), q100k.count()

    def phase(fn) -> tuple[float, float]:
        """(cold_first_call, best_of_3_warm) seconds."""
        t0 = time.perf_counter()
        fn()
        cold = time.perf_counter() - t0
        warm = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            warm.append(time.perf_counter() - t0)
        return cold, min(warm)

    bmw2k_cold, bmw2k = phase(
        lambda: engine.search(q2k, k=10, mode="bmw").count())
    bmw100k_cold, bmw100k = phase(
        lambda: engine.search(q100k, k=10, mode="bmw").count())
    ts2k_cold, ts2k = phase(
        lambda: engine.rank(q2k, corpus, first_k=100, final_k=10,
                            mode="auto").count())

    print(json.dumps({
        "metric": "warm_engine_800k",
        "n_docs": n,
        "cpus": cpus,
        "build_sec": round(build_sec, 2) if build_sec else None,
        "bmw_2k": {"cold_sec": round(bmw2k_cold, 2),
                   "warm_sec": round(bmw2k, 2),
                   "warm_qps": round(2_000 / bmw2k, 0)},
        "bmw_100k": {"cold_sec": round(bmw100k_cold, 2),
                     "warm_sec": round(bmw100k, 2),
                     "warm_qps": round(100_000 / bmw100k, 0)},
        "two_stage_2k": {"cold_sec": round(ts2k_cold, 2),
                         "warm_sec": round(ts2k, 2),
                         "warm_qps": round(2_000 / ts2k, 0)},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
