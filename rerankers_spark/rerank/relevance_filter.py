"""Binary LLM relevance filtering — reference models/llm_relevance_filter.py.

Semantics ported exactly:

* XML prompt with ``<document id=N>`` blocks — reference :136-144
* ``<answer>RELEVANT|NOT_RELEVANT</answer>`` parse, case-insensitive,
  malformed → default label — reference :124-134
* per-document response blocks re-parsed by id; missing ids score 0.0
  — reference :174-181
* stable sort by (-score, original_index), rank = idx + 1 — reference
  :183-192

The LLM call is pluggable (``completion_fn(prompt) -> str``) like
listwise.py's permutation_fn: a litellm/API client in production, a
deterministic stub in tests. ``filter_relevant`` is the DataFrame
operator: one LLM call per query group via ``applyInPandas``, then a
native threshold filter.
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rerankers_spark.results import RankedResults, Result
from rerankers_spark.rerank.ranker import prep_docs

# reference llm_relevance_filter.py:18-22
SYSTEM = (
    "You are a friendly AI assistant, working on document relevance "
    "filtering. Your task is to determine if a document is relevant to "
    "answering a given query. You must assign a binary RELEVANT or "
    "NOT_RELEVANT label to each document by carefully analysing them and "
    "the query."
)

# reference llm_relevance_filter.py:23-67 (verbatim contract: {query} and
# {docu_inputs} placeholders)
DEFAULT_PROMPT_TEMPLATE = """<instructions>
Think carefully about whether the following documents would be useful to answer the query.
For each document, explain your reasoning and then provide a binary decision (RELEVANT or NOT_RELEVANT). If a document is partially relevant, you will assign the RELEVANT label.

The documents will be given to you in the following format:

<input>
<query>
Text of the query.
</query>

<documents>
<document id=0>
Text of the first document.
</document>
<document id=1>
Text of the second document.
</document>
</documents>
</input>
And you will respond in the following format:

<document id=X>
<explanation>
Your reasoning regarding the document's relevance.
</explanation>
<answer>
RELEVANT or NOT_RELEVANT
</answer>
</document>
</instructions>

Here is the query and documents:

<input>
<query>
{query}
</query>

<documents>
{docu_inputs}
</documents>
</input>

Analyse the above documents and provide your responses using the provided format. You must assign either the RELEVANT or NOT_RELEVANT label, no other option is permitted."""

_ANSWER_RE = re.compile(
    r"<answer>\s*(RELEVANT|NOT_RELEVANT)\s*</answer>", re.IGNORECASE)
_DOC_BLOCK_RE = re.compile(r"<document id=(\d+)>(.*?)</document>", re.DOTALL)


def parse_answer(response: str, default_label: str = "RELEVANT") -> str:
    """<answer> tag → label; malformed falls back to default_label
    (reference _parse_response, llm_relevance_filter.py:124-134)."""
    match = _ANSWER_RE.search(response)
    if match:
        return match.group(1).upper()
    return default_label


def format_doc_inputs(docs: Sequence[str]) -> str:
    """Documents → enumerated <document id=N> XML blocks (reference
    _format_doc_inputs, llm_relevance_filter.py:136-144)."""
    return "\n".join(
        f"<document id={i}>\n{text}\n</document>"
        for i, text in enumerate(docs)
    )


def build_prompt(query: str, docs: Sequence[str],
                 template: str = DEFAULT_PROMPT_TEMPLATE) -> str:
    return template.format(query=query, docu_inputs=format_doc_inputs(docs))


def parse_doc_scores(response: str, n_docs: int,
                     default_label: str = "RELEVANT") -> List[float]:
    """Full response → per-document 1.0/0.0 scores by re-parsing the
    <document id=N> blocks; ids missing from the response get 0.0
    (reference rank(), llm_relevance_filter.py:174-181)."""
    doc_scores: dict[int, float] = {}
    for doc_id, content in _DOC_BLOCK_RE.findall(response):
        ans = parse_answer(content, default_label)
        doc_scores[int(doc_id)] = 1.0 if ans == "RELEVANT" else 0.0
    return [doc_scores.get(i, 0.0) for i in range(n_docs)]


def stub_completion_fn(prompt: str) -> str:
    """Deterministic LLM stand-in: a document is RELEVANT iff it shares a
    token with the query. Emits the reference's response format so the
    whole parse path is exercised."""
    from rerankers_spark.functions.tokenize import tokenize_py

    # only the FINAL <input> section holds the real query/docs — the
    # instruction preamble contains format examples the regexes would
    # otherwise pick up
    body = prompt[prompt.rfind("<input>"):]
    q_match = re.search(r"<query>\n(.*?)\n</query>", body, re.DOTALL)
    q_terms = set(tokenize_py(q_match.group(1))) if q_match else set()
    blocks = []
    for doc_id, text in _DOC_BLOCK_RE.findall(body):
        label = "RELEVANT" if q_terms & set(tokenize_py(text)) \
            else "NOT_RELEVANT"
        blocks.append(
            f"<document id={doc_id}>\n<explanation>\nstub\n</explanation>\n"
            f"<answer>\n{label}\n</answer>\n</document>"
        )
    return "\n".join(blocks)


class LLMRelevanceFilter:
    """Reference LLMRelevanceFilter (llm_relevance_filter.py:69-193) with
    a pluggable completion backend."""

    def __init__(
        self,
        model_name: str = "stub",
        completion_fn: Optional[Callable[[str], str]] = None,
        prompt_template: Optional[str] = None,
        default_label: str = "RELEVANT",
        verbose: int = 1,
    ) -> None:
        self.model_name = model_name
        self.completion_fn = completion_fn or stub_completion_fn
        self.prompt_template = prompt_template or DEFAULT_PROMPT_TEMPLATE
        self.default_label = default_label
        self.verbose = verbose
        self.ranking_type = "pointwise"

    def score(self, query: str, doc: str) -> float:
        """Single-document 1.0/0.0 (reference :146-156)."""
        prompt = build_prompt(query, [doc], self.prompt_template)
        answer = parse_answer(self.completion_fn(prompt), self.default_label)
        return 1.0 if answer == "RELEVANT" else 0.0

    def rank(self, query: str, docs, doc_ids=None, metadata=None
             ) -> RankedResults:
        """Binary-score every doc, stable sort (-score, original index),
        rank = idx + 1 (reference :158-192)."""
        prepped = prep_docs(docs, doc_ids, metadata)
        prompt = build_prompt(query, [d.text for d in prepped],
                              self.prompt_template)
        scores = parse_doc_scores(self.completion_fn(prompt), len(prepped),
                                  self.default_label)
        with_index = sorted(
            ((score, i, doc) for i, (score, doc)
             in enumerate(zip(scores, prepped))),
            key=lambda x: (-x[0], x[1]),
        )
        results = [
            Result(document=doc, score=score, rank=idx + 1)
            for idx, (score, _, doc) in enumerate(with_index)
        ]
        return RankedResults(results=results, query=query, has_scores=True)

    def rank_df(self, candidates: DataFrame, query_col: str = "query",
                text_col: str = "text") -> DataFrame:
        """(query_id, doc_id, query, text) → + score (1.0/0.0): one LLM
        call per query group."""
        fn = self.completion_fn
        template = self.prompt_template
        default_label = self.default_label

        def _group(pdf: pd.DataFrame) -> pd.DataFrame:
            prompt = build_prompt(str(pdf[query_col].iloc[0]),
                                  list(pdf[text_col]), template)
            scores = parse_doc_scores(fn(prompt), len(pdf), default_label)
            out = pdf[["query_id", "doc_id"]].copy().reset_index(drop=True)
            out["score"] = pd.Series(scores, dtype="float64")
            return out

        return candidates.groupBy("query_id").applyInPandas(
            _group, "query_id long, doc_id long, score double"
        )

    def filter_relevant(self, candidates: DataFrame,
                        threshold: float = 0.5,
                        query_col: str = "query",
                        text_col: str = "text") -> DataFrame:
        """DataFrame operator: keep rows the LLM labels RELEVANT (score >
        threshold) — the filtering use the reference class is named for."""
        scored = self.rank_df(candidates, query_col, text_col)
        keep = scored.where(F.col("score") > threshold) \
            .select("query_id", "doc_id")
        return candidates.join(keep, ["query_id", "doc_id"], "left_semi")
