"""Dump .explain('formatted') for the bench/query paths this round
touched, for the plans/r06/ deliverable.

Usage: python scripts/capture_plans.py OUT_DIR SUFFIX [REPO_ROOT]
  OUT_DIR   e.g. /root/repo/plans/r06
  SUFFIX    'before' or 'after'
  REPO_ROOT tree whose code to import (default: this script's repo)
"""

from __future__ import annotations

import os
import shutil
import sys


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    repo = sys.argv[3] if len(sys.argv) > 3 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.makedirs(out_dir, exist_ok=True)

    from rerankers_spark.corpus import documents_as_corpus
    from rerankers_spark.query.executor import Engine
    from rerankers_spark.session import get_spark

    spark = get_spark("capture-plans", master="local[8]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    corpus = documents_as_corpus(spark, sf).cache()
    idx = f"/tmp/capture_idx_{suffix}"
    shutil.rmtree(idx, ignore_errors=True)
    eng = Engine.build(spark, corpus, idx, n_shards=16, scorer="overlap")
    qs = spark.createDataFrame(
        [(0, "hash join window"), (1, "spark query fast"),
         (2, "merge sort batch customer")],
        "query_id long, query string")

    def dump(name, df):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(f"{out_dir}/{name}_{suffix}.txt", "w") as f:
            f.write(plan)
        print(name, len(plan.splitlines()), "lines")

    dump("bmw_search", eng.search(qs, k=10, mode="bmw"))
    dump("exhaustive_search", eng.search(qs, k=10, mode="exhaustive"))
    dump("auto_search", eng.search(qs, k=10, mode="auto"))
    dump("two_stage_rank", eng.rank(qs, corpus, first_k=100, final_k=10,
                                    mode="auto"))

    from pyspark.sql import functions as F

    from rerankers_spark.operators import ann

    e = ann.with_double_vec(
        spark.read.parquet(f"{sf}/embeddings.parquet"))
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_vec_id"), "vec")
    dump("lsh_ann_topk", ann.lsh_cosine_topk(
        q, e, k=10, n_planes=4, dim=64, n_tables=16,
        max_bucket_size=100_000))
    spark.stop()


if __name__ == "__main__":
    main()
