"""BM25 first stage — statistics + exhaustive scoring, all native DataFrame.

This is the stage the reference PRESUPPOSES but does not implement: its
consistency tests consume a precomputed BM25 top-100
(/root/reference/tests/consistency_notebooks/test_crossenc.ipynb cell 5,
``srsly.read_json('data/scifact/scifact_top_100.json')``). Here it is a
declarative Spark plan; Catalyst handles pushdown/pruning, and the only
shuffles are the two unavoidable aggregations (tf and per-(query,doc) sum).

Frozen math (FIXTURES.md §4): k1=1.2, b=0.75,
idf = ln(1 + (N - df + 0.5)/(df + 0.5))  (Lucene form),
tf_sat = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),  float64 throughout,
per-doc score = sum over unique query terms, top-k tie-break
(score desc, doc_id asc).

Scale notes (100 TB):
* postings build is ONE shuffle: explode → groupBy(term, doc_id).count().
  Map-side partial aggregation absorbs per-partition repeats; skew on
  (term, doc_id) pairs is bounded because the pair is unique per doc.
* dl is denormalized onto postings (+1 long per row) so query-time scoring
  needs NO join with docstats.
* query-time join broadcasts the QUERY TERMS (tiny) against postings, so
  the 100-TB side never shuffles for the join; only matched candidates
  shuffle into the per-(query,doc) sum.
* term_stats (df) is joined to query terms first (semi-reduction), so the
  full vocabulary-sized table is never broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rerankers_spark.functions.tokenize import (
    tokenize_col,
    tokenize_pandas_udf,
)
from rerankers_spark.operators.topk import topk

K1 = 1.2
B = 0.75


def doc_tokens(corpus: DataFrame) -> DataFrame:
    """(doc_id, tokens, dl) — column-pruned before the explode.

    Uses the ARROW tokenizer on this hot path: Spark's native regex
    ``split`` measured 16 s for 50k docs on local[32] and ANTI-scales
    with threads (9 s on one core — java.util.regex allocation
    contention), while the Arrow-batched Python tokenizer does the same
    work in 4 s. This is precisely the "vectorized Arrow UDF tokenizer"
    the north star mandates; the native Column variant (tokenize_col)
    stays available for small/interactive queries and the two are
    property-tested to agree token-for-token.
    """
    return corpus.select(
        "doc_id", tokenize_pandas_udf(F.col("content")).alias("tokens")
    ).withColumn("dl", F.size("tokens"))


def doc_stats(corpus: DataFrame) -> DataFrame:
    """docstats(doc_id, dl) — broadcast-sized per shard at query time."""
    return doc_tokens(corpus).select("doc_id", "dl")


def corpus_scalars(corpus: DataFrame) -> tuple[int, float]:
    """(N, avgdl) — one scalar aggregate, collected to the driver and
    passed as literals (the 'broadcast scalar' of the north star)."""
    row = doc_stats(corpus).agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"])


def postings(corpus: DataFrame) -> DataFrame:
    """postings(term, doc_id, tf, dl). One shuffle (hash agg w/ map-side
    partial). dl denormalized so scoring never joins docstats."""
    dt = doc_tokens(corpus)
    return (
        dt.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def term_stats(postings_df: DataFrame) -> DataFrame:
    """termstats(term, df) — postings has one row per (term, doc), so
    df = count(*), no countDistinct needed."""
    return postings_df.groupBy("term").agg(F.count("*").alias("df"))


def idf_col(df_col, n_docs: int):
    """Lucene idf: ln(1 + (N - df + 0.5)/(df + 0.5)), float64."""
    dfd = df_col.cast("double")
    return F.log(1.0 + (F.lit(float(n_docs)) - dfd + 0.5) / (dfd + 0.5))


def tf_sat_col(tf_col, dl_col, avgdl: float):
    """BM25 tf saturation with length norm, float64."""
    tfd = tf_col.cast("double")
    dld = dl_col.cast("double")
    return (tfd * (K1 + 1.0)) / (
        tfd + K1 * (1.0 - B + B * dld / F.lit(float(avgdl)))
    )


def query_terms(queries: DataFrame) -> DataFrame:
    """(query_id, term) — UNIQUE terms per query (FIXTURES.md §4: score
    sums over unique query terms)."""
    return (
        queries.select(
            "query_id", F.explode(tokenize_col("query")).alias("term")
        )
        .dropDuplicates(["query_id", "term"])
    )


def score_candidates(
    queries: DataFrame,
    postings_df: DataFrame,
    termstats: DataFrame,
    n_docs: int,
    avgdl: float,
) -> DataFrame:
    """(query_id, doc_id, score): exhaustive BM25 over all matching docs.

    Join order matters at scale: query_terms ⋈ termstats first (both tiny
    after the semi-reduction), broadcast the result into the postings
    scan, THEN aggregate the matches.
    """
    qt = query_terms(queries)
    qt_idf = qt.join(termstats, "term", "inner").select(
        "query_id", "term", idf_col(F.col("df"), n_docs).alias("idf")
    )
    matched = postings_df.join(F.broadcast(qt_idf), "term", "inner")
    contrib = matched.select(
        "query_id",
        "doc_id",
        (F.col("idf") * tf_sat_col(F.col("tf"), F.col("dl"), avgdl)).alias(
            "contrib"
        ),
    )
    return contrib.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("score")
    )


def bm25_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    precomputed: tuple[DataFrame, DataFrame, int, float] | None = None,
) -> DataFrame:
    """End-to-end exhaustive BM25 top-k: (query_id, doc_id, score, rank).

    ``precomputed`` = (postings, termstats, N, avgdl) skips the index-side
    recomputation (used when stats are already materialized as parquet).
    """
    if precomputed is None:
        p = postings(corpus)
        ts = term_stats(p)
        n_docs, avgdl = corpus_scalars(corpus)
    else:
        p, ts, n_docs, avgdl = precomputed
    scored = score_candidates(queries, p, ts, n_docs, avgdl)
    return topk(scored, k)
