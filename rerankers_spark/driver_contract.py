"""Driver-contract registry: named Spark queries + DuckDB oracle SQL.

Each entry is (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql_or_None).
Column names/aliases are kept identical on both sides (the driver's
compare sorts columns by name and hashes values). Floats are rounded on
BOTH sides so summation-order differences (~1e-15) can't flip the hash.

The SQL tokenizer mirrors the frozen spec (FIXTURES.md §4):
``list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
t -> t <> '' AND length(t) <= 64)``.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rerankers_spark.corpus import documents_as_corpus
from rerankers_spark.functions.tokenize import tokenize_col
from rerankers_spark.operators import bm25
from rerankers_spark.operators.topk import topk

# Fixed reference query set over the driver `documents` table (its
# vocabulary is stable across scale factors).
ENTRY_QUERIES: list[tuple[int, str]] = [
    (0, "hash join"),
    (1, "window agg stream"),
    (2, "spark query fast"),
    (3, "merge sort batch customer"),
    (4, "vector column scan table"),
    (5, "zz_out_of_vocab_zz filter"),
]

# DuckDB SQL fragments -------------------------------------------------------

_SQL_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), "
    "t -> t <> '' AND length(t) <= 64)"
)

_SQL_QUERY_VALUES = ", ".join(f"({i}, '{q}')" for i, q in ENTRY_QUERIES)

_SQL_CORPUS_CTES = f"""
toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
docstats AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM toks),
scal AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM docstats),
exploded AS (SELECT doc_id, unnest(toks) AS term FROM toks),
postings AS (SELECT term, doc_id, count(*)::DOUBLE AS tf
             FROM exploded GROUP BY 1, 2),
termstats AS (SELECT term, count(*)::DOUBLE AS df FROM postings GROUP BY 1)
"""

_SQL_BM25_TOPK = f"""
WITH q(query_id, query) AS (VALUES {_SQL_QUERY_VALUES}),
{_SQL_CORPUS_CTES},
qterms AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id,
           unnest(list_filter(regexp_split_to_array(lower(query),
                 '[^a-z0-9_]+'), t -> t <> '' AND length(t) <= 64)) AS term
    FROM q)
),
scored AS (
  -- rank on the ROUNDED score: float sums are order-dependent at ~1e-15,
  -- so ranking on raw doubles is not reproducible across engines; rounding
  -- + doc_id tie-break makes the ordering deterministic everywhere.
  SELECT qt.query_id, p.doc_id,
         round(sum( ln(1.0 + (s.n - ts.df + 0.5) / (ts.df + 0.5))
              * (p.tf * 2.2)
              / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / s.avgdl)) ), 4) AS score
  FROM qterms qt
  JOIN termstats ts USING (term)
  JOIN postings p USING (term)
  JOIN docstats d USING (doc_id)
  CROSS JOIN scal s
  GROUP BY 1, 2
)
SELECT query_id, doc_id, rank, score FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored)
WHERE rank <= 10
"""


def _queries_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ENTRY_QUERIES, "query_id long, query string")


# Spark-side query functions --------------------------------------------------


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = documents_as_corpus(spark, sf_dir)
    p = bm25.postings(corpus)
    ts = bm25.term_stats(p)
    n_docs, avgdl = bm25.corpus_scalars(corpus)
    scored = bm25.score_candidates(_queries_df(spark), p, ts, n_docs, avgdl)
    # rank on the rounded score — see the note in _SQL_BM25_TOPK.
    rounded = scored.select(
        "query_id", "doc_id", F.round("score", 4).alias("score")
    )
    return topk(rounded, 10).select("query_id", "doc_id", "rank", "score")


def q_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = documents_as_corpus(spark, sf_dir)
    return (
        corpus.select(F.explode(tokenize_col("content")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
    )


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25.doc_stats(documents_as_corpus(spark, sf_dir)).select(
        "doc_id", F.col("dl").cast("long").alias("dl")
    )


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25.doc_stats(documents_as_corpus(spark, sf_dir)).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("dl"), 6).alias("avgdl"),
    )


def q_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = documents_as_corpus(spark, sf_dir)
    return bm25.term_stats(bm25.postings(corpus)).select(
        "term", F.col("df").cast("long").alias("df")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content; keep min doc_id per group."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        d.groupBy(F.md5("text").alias("content_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def q_rank_docs_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window rank semantics demo (reference rank=idx+1 idiom) on a
    deterministic score: top-5 longest docs per lang."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "lang", "doc_id", F.col("n_chars").cast("double").alias("score")
    )
    return topk(d, 5, partition_cols=("lang",)).select(
        "lang", "doc_id", F.col("score").cast("long").alias("n_chars"), "rank"
    )


def q_tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregation (relational coverage, SURVEY.md §2B)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join + agg + deterministic top-10 (relational coverage)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    return topk(rev, 10, partition_cols=(), id_col="c_custkey",
                score_col="revenue").select("c_custkey", "c_name", "revenue",
                                            "rank")


QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], Optional[str]]] = {
    "bm25_topk": (q_bm25_topk, _SQL_BM25_TOPK),
    "term_frequencies": (
        q_term_frequencies,
        f"WITH {_SQL_CORPUS_CTES} "
        "SELECT term, count(*)::BIGINT AS freq FROM exploded GROUP BY 1",
    ),
    "doc_stats": (
        q_doc_stats,
        f"WITH {_SQL_CORPUS_CTES} SELECT doc_id, dl FROM docstats",
    ),
    "corpus_stats": (
        q_corpus_stats,
        f"WITH {_SQL_CORPUS_CTES} "
        "SELECT count(*)::BIGINT AS n_docs, round(avg(dl), 6) AS avgdl "
        "FROM docstats",
    ),
    "term_df": (
        q_term_df,
        f"WITH {_SQL_CORPUS_CTES} "
        "SELECT term, df::BIGINT AS df FROM termstats",
    ),
    "dedup_exact": (
        q_dedup_exact,
        "SELECT md5(text) AS content_md5, min(doc_id) AS keep_doc_id, "
        "count(*)::BIGINT AS n_copies FROM documents GROUP BY 1",
    ),
    "rank_docs_by_length": (
        q_rank_docs_by_length,
        "SELECT lang, doc_id, n_chars, rank FROM ("
        "  SELECT lang, doc_id, n_chars, row_number() OVER ("
        "    PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rank"
        "  FROM documents) WHERE rank <= 5",
    ),
    "tpch_pricing_summary": (
        q_tpch_pricing_summary,
        "SELECT l_returnflag, l_linestatus, "
        "round(sum(l_quantity), 2) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base_price, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "round(avg(l_quantity), 4) AS avg_qty, "
        "count(*)::BIGINT AS count_order "
        "FROM lineitem GROUP BY 1, 2",
    ),
    "top_customers": (
        q_top_customers,
        "SELECT c_custkey, c_name, revenue, rank FROM ("
        "  SELECT c_custkey, c_name, revenue, row_number() OVER ("
        "    ORDER BY revenue DESC, c_custkey ASC) AS rank FROM ("
        "    SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS revenue"
        "    FROM orders JOIN customer ON o_custkey = c_custkey"
        "    GROUP BY 1, 2)) WHERE rank <= 10",
    ),
}
