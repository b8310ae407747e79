"""Text-analysis functions for training-data pipelines: language-ID,
quality scoring, token counting, document fingerprinting.

All native Column expressions (JVM/codegen, no Python anywhere) so they
hold up on a 100 TB corpus and are exactly mirrorable in the DuckDB
oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rerankers_spark.functions.tokenize import tokenize_col

# Tiny per-language stopword tables for the n-gram/stopword-hit heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "les", "de", "et", "est"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
}


def _hits(tokens: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang): argmax of stopword hits; ties and zero-hit →
    'und' / lexicographically-first language (deterministic)."""
    toks = tokenize_col(text_col)
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("tokens"))
    for lang, words in sorted(LANG_STOPWORDS.items()):
        d = d.withColumn(f"hits_{lang}", _hits(F.col("tokens"), words))
    best = F.greatest(*[F.col(f"hits_{lang}")
                        for lang in sorted(LANG_STOPWORDS)])
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_STOPWORDS):
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return d.select("doc_id", pred.alias("pred_lang"))


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, stopword_ratio,
    quality): length/stopword heuristics, rounded for oracle parity."""
    toks = tokenize_col(text_col)
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars"),
        toks.alias("tokens"),
    ).select(
        "doc_id",
        "n_chars",
        F.size("tokens").cast("long").alias("n_tokens"),
        _hits(F.col("tokens"), LANG_STOPWORDS["en"]).cast("long")
        .alias("n_stop"),
        F.aggregate(
            "tokens", F.lit(0).cast("long"),
            lambda acc, t: acc + F.length(t)
        ).alias("sum_token_len"),
    )
    avg_len = F.col("sum_token_len") / F.col("n_tokens")
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    # simple composite: long-enough docs with natural stopword density
    quality = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.5
        + F.least(stop_ratio * 10.0, F.lit(1.0)) * 0.5
    )
    return d.select(
        "doc_id", "n_chars", "n_tokens",
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(quality, 4).alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ws_tokens, re_tokens, approx_bpe_tokens): whitespace
    count, frozen-spec regex count, and a BPE-ish estimate
    (chars/4, the common LLM rule of thumb, deterministic)."""
    ws = F.size(
        F.filter(F.split(F.col(text_col), " +"), lambda t: F.length(t) > 0)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.cast("long").alias("ws_tokens"),
        F.size(tokenize_col(text_col)).cast("long").alias("re_tokens"),
        F.ceil(F.length(text_col) / 4.0).cast("long")
        .alias("approx_bpe_tokens"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp): canonicalized content fingerprint — md5 over the
    normalized token stream, so whitespace/punctuation-variant copies
    collide (a cheap dedup key stronger than raw-text md5)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.concat_ws(" ", tokenize_col(text_col))).alias("fp"),
    )
