"""Retrieval-quality evaluation: NDCG@k and the consistency-gate harness.

The reference's only quantitative quality gate is NDCG@10 vs a
literature value (±0.01) computed by ranx in its consistency notebooks
(/root/reference/tests/consistency_notebooks/test_crossenc.ipynb cells
9-10). ranx isn't in this sandbox, so NDCG is implemented directly
(standard log2 discount, ideal-DCG normalization — the same definition
ranx uses) both driver-side (numpy, for notebook-style runs) and as a
native DataFrame aggregation for at-scale evaluation of millions of
queries.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dcg(rels: Sequence[float]) -> float:
    return sum(r / math.log2(i + 2) for i, r in enumerate(rels))


def ndcg_at_k(ranked_doc_ids: Sequence, qrels: Mapping, k: int = 10) -> float:
    """qrels: doc_id → graded relevance. 0.0 when the query has no
    relevant docs (ranx convention)."""
    gains = [float(qrels.get(d, 0.0)) for d in ranked_doc_ids[:k]]
    ideal = sorted((float(v) for v in qrels.values()), reverse=True)[:k]
    idcg = dcg(ideal)
    return dcg(gains) / idcg if idcg > 0 else 0.0


def mean_ndcg(run: Mapping, qrels_all: Mapping, k: int = 10) -> float:
    """run: query_id → ordered doc_ids; qrels_all: query_id → {doc: rel}.
    Mean over queries present in qrels (the notebook filters queries to
    qrels, cell 7)."""
    qids = [q for q in run if q in qrels_all]
    if not qids:
        return 0.0
    return sum(
        ndcg_at_k(run[q], qrels_all[q], k) for q in qids
    ) / len(qids)


def ndcg_df(results: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Distributed NDCG@k: results(query_id, doc_id, rank) ⋈ qrels
    (query_id, doc_id, rel) → (query_id, ndcg). Native window math; the
    qrels side is typically broadcast-sized per query set."""
    hits = (
        results.where(F.col("rank") <= k)
        .join(qrels, ["query_id", "doc_id"], "left")
        .na.fill({"rel": 0.0})
        .withColumn("gain", F.col("rel") / F.log2(F.col("rank") + 1.0))
    )
    dcg_df = hits.groupBy("query_id").agg(F.sum("gain").alias("dcg"))
    ideal_rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    )
    idcg_df = (
        qrels.withColumn("irank", ideal_rank)
        .where(F.col("irank") <= k)
        .withColumn("igain", F.col("rel") / F.log2(F.col("irank") + 1.0))
        .groupBy("query_id")
        .agg(F.sum("igain").alias("idcg"))
    )
    return dcg_df.join(idcg_df, "query_id", "right").select(
        "query_id",
        F.when(
            F.col("idcg") > 0, F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")
        ).otherwise(0.0).alias("ndcg"),
    )


def consistency_gate(mean_score: float, literature: float,
                     tol: float = 0.01) -> bool:
    """The reference's assertion shape (test_crossenc.ipynb cell 10)."""
    return abs(mean_score - literature) <= tol
