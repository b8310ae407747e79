"""Second stage: the unified ``Reranker.rank()`` API over pandas-UDF scorers.

API parity with the reference's unified interface:
* factory dispatch model_name/model_type → concrete scorer
  (reference rerankers/reranker.py:196-247 + registry models/__init__.py:1-86)
* ``prep_docs`` doc normalization with positional id autogeneration and
  explicit-id override warning (reference rerankers/utils.py:68-120)
* ``rank(query, docs, doc_ids, metadata) -> RankedResults`` with the
  reference's ordering contract: stable desc sort by score, rank=idx+1
  (transformer_ranker.py:90-95), single-doc special case returns score
  but NO rank (transformer_ranker.py:87-88)
* ``score(query, doc) -> float`` (models/ranker.py:14-16)

Execution model: scorers are BATCHED Arrow pandas UDFs over
``(query, text)`` columns — the Spark inversion of the reference's
fixed-size batch loop (transformer_ranker.py:72-78). The distributed
entry point is :meth:`Reranker.rank_df` (DataFrame in → DataFrame out,
used by the two-stage engine); :meth:`Reranker.rank` is the driver-side
list API for reference-compatible callers.

Model-backed scorers (cross-encoder/T5/ColBERT — reference models/*.py)
are gated behind import-try: torch/transformers are not in this sandbox,
so they register lazily and raise a clear error if requested without the
dependency. The deterministic scorers below make the pipeline fully
testable without downloads.
"""

from __future__ import annotations

import warnings
from typing import Callable, Iterator, List, Optional, Sequence, Tuple, Union

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from rerankers_spark.operators.topk import with_rank
from rerankers_spark.results import Document, RankedResults, Result

# ---------------------------------------------------------------------------
# Scorer registry — mirrors AVAILABLE_RANKERS (reference models/__init__.py)
# ---------------------------------------------------------------------------

# name -> factory() -> pandas-series scorer fn(query: pd.Series, text:
# pd.Series) -> pd.Series[float64]. Wrapped into a pandas_udf at use time.
AVAILABLE_SCORERS: dict[str, Callable[[], Callable]] = {}


def register_scorer(name: str):
    def deco(factory):
        AVAILABLE_SCORERS[name] = factory
        return factory

    return deco


@register_scorer("stub")
def _stub_scorer():
    """Deterministic test scorer (FIXTURES.md §3): no model download.
    score = -|len(text) - len(query)| — higher when lengths are closer."""

    def score(query: pd.Series, text: pd.Series) -> pd.Series:
        return -(text.str.len() - query.str.len()).abs().astype("float64")

    return score


@register_scorer("overlap")
def _overlap_scorer():
    """Lexical-overlap scorer: |query_terms ∩ doc_terms| / |query_terms|.
    A deterministic, vectorized stand-in with cross-encoder-like shape."""
    from rerankers_spark.functions.tokenize import tokenize_py

    def score(query: pd.Series, text: pd.Series) -> pd.Series:
        out = []
        for q, t in zip(query, text):
            qs = set(tokenize_py(q or ""))
            ts = set(tokenize_py(t or ""))
            out.append(len(qs & ts) / len(qs) if qs else 0.0)
        return pd.Series(out, dtype="float64")

    return score


@register_scorer("cross-encoder")
def _cross_encoder_scorer():
    """Real cross-encoder (reference models/transformer_ranker.py:57-103).
    Requires torch+transformers on executors; loads once per worker."""
    try:
        import torch  # noqa: F401
        from transformers import (  # noqa: F401
            AutoModelForSequenceClassification,
            AutoTokenizer,
        )
    except ImportError as e:  # pragma: no cover - sandbox has no torch
        raise ImportError(
            "cross-encoder scorer needs torch+transformers; use scorer="
            "'stub'/'overlap' in environments without them"
        ) from e

    model_name = "mixedbread-ai/mxbai-rerank-base-v1"
    tok = AutoTokenizer.from_pretrained(model_name)
    model = AutoModelForSequenceClassification.from_pretrained(model_name)
    model.eval()

    def score(query: pd.Series, text: pd.Series) -> pd.Series:  # pragma: no cover
        import torch

        with torch.inference_mode():
            inputs = tok(
                list(zip(query.tolist(), text.tolist())),
                padding=True,
                truncation=True,
                return_tensors="pt",
                max_length=512,
            )
            logits = model(**inputs).logits
            if logits.shape[1] == 1:
                vals = logits.squeeze(-1)
            else:
                # monobert diff — reference transformer_ranker.py:86
                vals = logits[:, 1] - logits[:, 0]
            return pd.Series(vals.float().cpu().numpy(), dtype="float64")

    return score


# Model-family × lang → concrete default, analog of the reference's
# DEFAULTS table + _get_defaults (reranker.py:7-52, 171-194). Families
# resolve to in-sandbox scorers; model-backed names keep their HF ids so
# a torch-equipped deployment loads the real checkpoint.
DEFAULTS: dict[str, dict[str, str]] = {
    "stub": {"en": "stub", "other": "stub"},
    "overlap": {"en": "overlap", "other": "overlap"},
    "cross-encoder": {
        "en": "mixedbread-ai/mxbai-rerank-base-v1",
        "other": "corrius/cross-encoder-mmarco-mMiniLMv2-L12-H384-v1",
    },
}


def get_defaults(family: str, lang: str = "en") -> str:
    """Family+lang → concrete model name (reference reranker.py:171-194:
    unknown lang falls back to the 'other' entry)."""
    table = DEFAULTS[family]
    return table.get(lang, table["other"])


# Keyword → scorer-type mapping, analog of reference reranker.py:92-169.
_MODEL_TYPE_KEYWORDS = [
    ("stub", "stub"),
    ("overlap", "overlap"),
    ("rankgpt", "listwise"),
    ("rankllm", "listwise"),
    ("listwise", "listwise"),
    ("colbert", "cross-encoder"),
    ("cross-encoder", "cross-encoder"),
    ("t5", "cross-encoder"),
    ("flashrank", "flashrank"),
    ("rerank", "cross-encoder"),
]


@register_scorer("flashrank")
def _flashrank_scorer():
    """ONNX scorer family (reference models/flashrank_ranker.py:32-64).
    Gated: onnxruntime/flashrank are not in this sandbox."""
    try:
        from flashrank import Ranker  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "flashrank scorer needs the flashrank package; use "
            "scorer='stub'/'overlap' in environments without it"
        ) from e
    raise NotImplementedError  # pragma: no cover


#: substring-matched API providers (reference reranker.py:71-90); API
#: scorers need network access — absent here, the registry entry raises.
PROVIDERS = ["cohere", "jina", "voyage", "mixedbread.ai", "pinecone", "isaacus"]


def _get_api_provider(model_name: str,
                      model_type: Optional[str] = None) -> Optional[str]:
    """Reference _get_api_provider semantics: substring match on the
    model name (or explicit type) against known providers."""
    for p in PROVIDERS:
        if p in (model_type or "").lower() or p in model_name.lower():
            return p
    return None


@register_scorer("api")
def _api_scorer():
    """HTTP API scorer family (reference models/api_rankers.py:87-143).
    Needs network + requests; per-partition connection reuse would live
    in mapInPandas. Unavailable in this sandbox by design."""
    raise ImportError(
        "API scorers need network access (cohere/jina/voyage/...); "
        "use a local scorer ('stub'/'overlap'/'cross-encoder') here"
    )


def get_reranker(model_name: str = "stub", model_type: Optional[str] = None,
                 lang: str = "en", **kw):
    """Unified factory (reference rerankers/reranker.py:196-247 returns a
    DIFFERENT ranker class per model type): listwise names dispatch to
    ListwiseReranker, everything else to the pointwise Reranker."""
    # explicit non-provider model_type always wins (reference passes the
    # explicit type through before provider-substring fallback)
    explicit_known = model_type in AVAILABLE_SCORERS or model_type == "listwise"
    if not explicit_known:
        provider = _get_api_provider(model_name, model_type)
        if provider is not None:
            return Reranker(model_name, model_type="api", lang=lang, **kw)
    mtype = _get_model_type(model_name, model_type)
    if mtype == "listwise":
        from rerankers_spark.rerank.listwise import ListwiseReranker

        return ListwiseReranker(**kw)
    return Reranker(model_name, model_type=mtype, lang=lang, **kw)


def _get_model_type(model_name: str, explicit: Optional[str]) -> str:
    if explicit is not None:
        return explicit
    lowered = model_name.lower()
    for kw, mtype in _MODEL_TYPE_KEYWORDS:
        if kw in lowered:
            return mtype
    warnings.warn(
        f"Could not infer model type from {model_name!r}; defaulting to "
        "'cross-encoder' (reference fallback: reranker.py:162-169)"
    )
    return "cross-encoder"


# ---------------------------------------------------------------------------
# prep_docs — reference utils.py:68-120 semantics
# ---------------------------------------------------------------------------

DocsInput = Union[str, Document, Sequence[Union[str, Document]]]


def prep_docs(
    docs: DocsInput,
    doc_ids: Optional[Sequence[Union[str, int]]] = None,
    metadata: Optional[Sequence[dict]] = None,
) -> List[Document]:
    if isinstance(docs, (str, Document)):
        docs = [docs]
    out: List[Document] = []
    for d in docs:
        out.append(d if isinstance(d, Document) else Document(text=d))
    if doc_ids is not None:
        if len(doc_ids) != len(out):
            raise ValueError("doc_ids length must match docs length")
        if any(d.doc_id is not None for d in out):
            # reference utils.py:78-88: explicit ids override with warning
            warnings.warn(
                "explicit doc_ids override ids set on Document objects"
            )
        for d, i in zip(out, doc_ids):
            d.doc_id = i
    else:
        # positional autogeneration — reference utils.py:63-64, 110-120
        for pos, d in enumerate(out):
            if d.doc_id is None:
                d.doc_id = pos
    if metadata is not None:
        if len(metadata) != len(out):
            raise ValueError("metadata length must match docs length")
        for d, m in zip(out, metadata):
            d.metadata = m
    return out


# ---------------------------------------------------------------------------
# Reranker
# ---------------------------------------------------------------------------


class Reranker:
    """Unified reranker (reference rerankers/reranker.py:196-247).

    ``Reranker("stub")`` / ``Reranker("overlap")`` are dependency-free;
    model-backed names resolve to the cross-encoder scorer family.
    """

    def __init__(
        self,
        model_name: str = "stub",
        model_type: Optional[str] = None,
        lang: str = "en",
        spark: Optional[SparkSession] = None,
        verbose: int = 1,
    ) -> None:
        if model_name in DEFAULTS:
            # family name → lang-specific default (reference reranker.py:223)
            model_name = get_defaults(model_name, lang)
        self.model_name = model_name
        self.model_type = _get_model_type(model_name, model_type)
        if self.model_type not in AVAILABLE_SCORERS:
            raise KeyError(
                f"unknown scorer {self.model_type!r}; available: "
                f"{sorted(AVAILABLE_SCORERS)}"
            )
        self._factory = AVAILABLE_SCORERS[self.model_type]
        self._spark = spark
        self.verbose = verbose

    # -- distributed path ---------------------------------------------------

    def scorer_udf(self):
        """Batched Arrow pandas UDF (iterator form: scorer/model is built
        ONCE per executor task — the Spark analog of the reference's
        per-process model load, transformer_ranker.py:35-39)."""
        factory = self._factory

        @F.pandas_udf(DoubleType())
        def _score(
            it: Iterator[Tuple[pd.Series, pd.Series]],
        ) -> Iterator[pd.Series]:
            fn = factory()
            for query, text in it:
                yield fn(query, text)

        return _score

    def rank_df(
        self,
        candidates: DataFrame,
        query_col: str = "query",
        text_col: str = "text",
        partition_cols: Sequence[str] = ("query_id",),
    ) -> DataFrame:
        """DataFrame[..., query, text] → + (score, rank) per query group.
        This is the hot path of stage two (SURVEY.md §2C.11)."""
        scored = candidates.withColumn(
            "score", self.scorer_udf()(F.col(query_col), F.col(text_col))
        )
        return with_rank(scored, partition_cols)

    # -- reference-compatible driver API -------------------------------------

    def rank(
        self,
        query: str,
        docs: DocsInput,
        doc_ids: Optional[Sequence[Union[str, int]]] = None,
        metadata: Optional[Sequence[dict]] = None,
    ) -> RankedResults:
        prepped = prep_docs(docs, doc_ids, metadata)
        scores = self._score_pairs(query, [d.text for d in prepped])
        if len(prepped) == 1:
            # single-doc special case: score, NO rank
            # (reference transformer_ranker.py:87-88)
            return RankedResults(
                [Result(document=prepped[0], score=scores[0])],
                query=query,
                has_scores=True,
            )
        # stable desc sort over passed order, rank = idx+1
        # (reference transformer_ranker.py:90-95)
        order = sorted(
            range(len(prepped)), key=lambda i: -scores[i]
        )  # python sort is stable → ties keep passed order
        results = [
            Result(document=prepped[i], score=scores[i], rank=pos + 1)
            for pos, i in enumerate(order)
        ]
        return RankedResults(results, query=query, has_scores=True)

    async def rank_async(self, query: str, docs: DocsInput, **kw) -> RankedResults:
        """reference models/ranker.py:30-39 — thread-pool wrapper."""
        import asyncio
        from functools import partial

        loop = asyncio.get_event_loop()
        return await loop.run_in_executor(
            None, partial(self.rank, query, docs, **kw)
        )

    def score(self, query: str, doc: Union[str, Document]) -> float:
        """Single-pair score (reference models/ranker.py:14-16)."""
        text = doc.text if isinstance(doc, Document) else doc
        return self._score_pairs(query, [text])[0]

    def _score_pairs(self, query: str, texts: Sequence[str]) -> List[float]:
        fn = self._factory()
        out = fn(
            pd.Series([query] * len(texts), dtype="object"),
            pd.Series(list(texts), dtype="object"),
        )
        return [float(x) for x in out]

    # langchain-compressor analog (reference integrations/langchain.py:13-33)
    def compress(self, query: str, docs: DocsInput, k: int = 3) -> List[Document]:
        ranked = self.rank(query, docs)
        out = []
        for r in ranked.top_k(k):
            r.document.metadata = dict(r.document.metadata or {})
            r.document.metadata["relevance_score"] = r.score
            out.append(r.document)
        return out
