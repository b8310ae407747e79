"""Listwise (permutation) reranking — the RankGPT/RankLLM family.

Reference semantics reproduced exactly (rerankers/models/rankgpt_rankers.py):
* numbered-passage prompt with 300-word truncation per doc
  (rankgpt_rankers.py:36-60)
* response parsing: extract digit runs, order-preserving dedup, complete
  missing indices in original order (clean_response:62-74,
  remove_duplicate:77-82, receive_permutation:85-99)
* result carries RANKS ONLY — ``has_scores=False``
  (rankgpt_rankers.py:157-159)
* sliding-window mode: window_size=min(20, n), stride=10, processed back
  to front (rankllm_ranker.py:90-95 semantics)

The "LLM" is pluggable: any ``fn(prompt) -> str`` (an API call in
production; a deterministic stub in tests — no network in this sandbox).
Distributed path: one permutation call per query GROUP via
``applyInPandas`` — listwise ops see the whole candidate list at once,
which is exactly what per-query grouping gives.
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rerankers_spark.results import Document, RankedResults, Result
from rerankers_spark.rerank.ranker import prep_docs

MAX_PROMPT_WORDS = 300


def truncate_words(text: str, max_words: int = MAX_PROMPT_WORDS) -> str:
    """Whitespace word-truncation (reference rankgpt_rankers.py:54-58)."""
    words = text.split()
    return " ".join(words[:max_words])


def build_permutation_prompt(query: str, docs: Sequence[str]) -> str:
    """Numbered-passage instruction (reference create_permutation_
    instruction, rankgpt_rankers.py:36-60)."""
    lines = [
        f"I will provide you with {len(docs)} passages, each indicated by "
        f"number identifier []. Rank the passages based on their relevance "
        f"to query: {query}."
    ]
    for i, d in enumerate(docs):
        lines.append(f"[{i + 1}] {truncate_words(d or '')}")
    lines.append(
        f"Search Query: {query}. Rank the {len(docs)} passages above. "
        "The output format should be [] > [], e.g., [1] > [2]."
    )
    return "\n".join(lines)


def clean_response(response: str) -> List[int]:
    """Digit-run extraction → 0-based indices (reference
    clean_response, rankgpt_rankers.py:62-74)."""
    return [int(x) - 1 for x in re.findall(r"\d+", response)]


def remove_duplicate(indices: Sequence[int]) -> List[int]:
    """Order-preserving dedup (reference rankgpt_rankers.py:77-82)."""
    seen: set[int] = set()
    out = []
    for i in indices:
        if i not in seen:
            seen.add(i)
            out.append(i)
    return out


def receive_permutation(n: int, response: str) -> List[int]:
    """Response → full permutation of range(n): parse, dedup, drop
    out-of-range, complete missing in original order (reference
    rankgpt_rankers.py:85-99)."""
    perm = [i for i in remove_duplicate(clean_response(response)) if 0 <= i < n]
    perm += [i for i in range(n) if i not in set(perm)]
    return perm


def stub_permutation_fn(query: str, docs: Sequence[str]) -> str:
    """Deterministic stand-in for the LLM call: orders by lexical overlap
    with the query (desc), stable. Returns the reference's '[i] > [j]'
    format so the full parse path is exercised."""
    from rerankers_spark.functions.tokenize import tokenize_py

    q = set(tokenize_py(query))
    scored = sorted(
        range(len(docs)),
        key=lambda i: -len(q & set(tokenize_py(docs[i] or ""))),
    )  # python sort is stable → ties keep passed order
    return " > ".join(f"[{i + 1}]" for i in scored)


class ListwiseReranker:
    """rank() returns has_scores=False RankedResults (rank only)."""

    def __init__(
        self,
        permutation_fn: Optional[Callable[[str, Sequence[str]], str]] = None,
        window_size: int = 20,
        stride: int = 10,
    ) -> None:
        self.permutation_fn = permutation_fn or stub_permutation_fn
        self.window_size = window_size
        self.stride = stride

    def _permute(self, query: str, texts: List[str]) -> List[int]:
        n = len(texts)
        if n <= self.window_size:
            return receive_permutation(
                n, self.permutation_fn(query, texts)
            )
        # sliding window back→front (reference rankllm window semantics)
        order = list(range(n))
        end = n
        while end > 0:
            start = max(0, end - self.window_size)
            window = order[start:end]
            resp = self.permutation_fn(query, [texts[i] for i in window])
            perm = receive_permutation(len(window), resp)
            order[start:end] = [window[p] for p in perm]
            if start == 0:
                break
            end -= self.stride
        return order

    def rank(self, query: str, docs, doc_ids=None, metadata=None
             ) -> RankedResults:
        prepped = prep_docs(docs, doc_ids, metadata)
        order = self._permute(query, [d.text for d in prepped])
        # results in RANK order, rank = idx+1 — matching the reference
        # (rankgpt_rankers.py:150-159 returns the permuted hits order)
        # and this repo's pointwise Reranker.rank()
        results = [
            Result(document=prepped[i], rank=pos + 1)
            for pos, i in enumerate(order)
        ]
        return RankedResults(results, query=query, has_scores=False)

    def rank_df(self, candidates: DataFrame, query_col: str = "query",
                text_col: str = "text") -> DataFrame:
        """(query_id, doc_id, query, text) → + rank. One permutation call
        per query group (listwise = whole group in one call)."""
        fn = self.permutation_fn
        window_size, stride = self.window_size, self.stride

        def _group(pdf: pd.DataFrame) -> pd.DataFrame:
            rr = ListwiseReranker(fn, window_size, stride)
            order = rr._permute(
                str(pdf[query_col].iloc[0]), list(pdf[text_col])
            )
            ranks = [0] * len(order)
            for pos, i in enumerate(order):
                ranks[i] = pos + 1
            out = pdf[["query_id", "doc_id"]].copy()
            out["rank"] = ranks
            return out

        return candidates.groupBy("query_id").applyInPandas(
            _group, "query_id long, doc_id long, rank int"
        )
