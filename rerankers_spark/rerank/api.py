"""HTTP reranking-API scorer family (cohere/jina/voyage/mixedbread.ai/
pinecone/isaacus), reference models/api_rankers.py.

The provider-specific request/response shapes are pure dict logic, ported
here as free functions so they are unit-testable offline:

* per-provider URL / auth-header / api-version tables — api_rankers.py:13-52
* ``format_payload``  — api_rankers.py:117-135
* ``parse_response`` / ``get_score`` / ``get_document_text``
  — api_rankers.py:73-102

Transport is injected (``transport(url, headers, payload) -> dict``): the
default uses ``requests`` lazily; tests pass a stub. The distributed path
(:meth:`APIRanker.rank_df`) makes ONE API call per query group inside
``applyInPandas`` and reuses the transport per task — at scale the rate
limiter is the API, so parallelism = number of concurrent query groups.
"""

from __future__ import annotations

import json
from string import Template
from typing import Callable, List, Optional, Sequence, Union

import pandas as pd
from pyspark.sql import DataFrame

from rerankers_spark.results import Document, RankedResults, Result

# --- provider tables (reference api_rankers.py:13-52) ----------------------

URLS = {
    "cohere": "https://api.cohere.ai/v1/rerank",
    "jina": "https://api.jina.ai/v1/rerank",
    "isaacus": "https://api.isaacus.com/v1/rerankings",
    "voyage": "https://api.voyageai.com/v1/rerank",
    "mixedbread.ai": "https://api.mixedbread.ai/v1/reranking",
    "pinecone": "https://api.pinecone.io/rerank",
}
AUTHORIZATION_KEY_MAPPING = {"pinecone": "Api-Key"}
API_VERSION_MAPPING = {"pinecone": {"X-Pinecone-API-Version": "2024-10"}}
API_KEY_MAPPING = {"pinecone": Template("$api_key")}
DOCUMENT_KEY_MAPPING = {
    "mixedbread.ai": "input",
    "text-embeddings-inference": "texts",
    "isaacus": "texts",
}
RETURN_DOCUMENTS_KEY_MAPPING = {
    "mixedbread.ai": "return_input",
    "text-embeddings-inference": "return_text",
}
RESULTS_KEY_MAPPING = {
    "voyage": "data",
    "mixedbread.ai": "data",
    "pinecone": "data",
    "text-embeddings-inference": None,
}
SCORE_KEY_MAPPING = {
    "mixedbread.ai": "score",
    "pinecone": "score",
    "text-embeddings-inference": "score",
    "isaacus": "score",
}


def build_headers(provider: str, api_key: str) -> dict:
    """Auth + version headers (reference api_rankers.py:56-70: pinecone
    uses a bare Api-Key header + version header, everyone else Bearer)."""
    provider = provider.lower()
    key_value = API_KEY_MAPPING.get(
        provider, Template("Bearer $api_key")
    ).substitute(api_key=api_key)
    headers = {
        "accept": "application/json",
        "content-type": "application/json",
        AUTHORIZATION_KEY_MAPPING.get(provider, "Authorization"): key_value,
    }
    version = API_VERSION_MAPPING.get(provider)
    if version:
        headers.update(version)
    return headers


def format_payload(provider: str, model: str, query: str,
                   texts: Sequence[str]) -> str:
    """JSON request body (reference _format_payload,
    api_rankers.py:117-135): voyage/mixedbread use top_k (not top_n),
    pinecone wraps documents as {'text': ...} dicts, mixedbread/isaacus
    rename the documents and return_documents keys."""
    provider = provider.lower()
    top_key = "top_n" if provider not in ("voyage", "mixedbread.ai") \
        else "top_k"
    documents_key = DOCUMENT_KEY_MAPPING.get(provider, "documents")
    return_documents_key = RETURN_DOCUMENTS_KEY_MAPPING.get(
        provider, "return_documents")
    documents: list = list(texts) if provider != "pinecone" \
        else [{"text": t} for t in texts]
    return json.dumps({
        "model": model,
        "query": query,
        documents_key: documents,
        top_key: len(texts),
        return_documents_key: True,
    })


def get_score(provider: str, r: dict) -> float:
    """Per-result score key (reference api_rankers.py:84-86)."""
    return r[SCORE_KEY_MAPPING.get(provider.lower(), "relevance_score")]


def get_document_text(provider: str, r: dict) -> str:
    """Returned-document text key (reference api_rankers.py:74-82)."""
    provider = provider.lower()
    if provider == "voyage":
        return r["document"]
    if provider == "mixedbread.ai":
        return r["input"]
    if provider == "text-embeddings-inference":
        return r["text"]
    return r["document"]["text"]


def parse_response(provider: str, response: dict,
                   docs: Sequence[Document]) -> List[Result]:
    """Response rows → Result list in API order, rank = position + 1
    (reference _parse_response, api_rankers.py:88-102); each row's
    'index' points into the REQUEST's doc list."""
    results_key = RESULTS_KEY_MAPPING.get(provider.lower(), "results")
    rows = response[results_key] if results_key else response
    return [
        Result(document=docs[r["index"]], score=get_score(provider, r),
               rank=i + 1)
        for i, r in enumerate(rows)
    ]


def requests_transport(url: str, headers: dict, payload: str) -> dict:
    """Default transport (reference api_rankers.py:113-114). Lazy import:
    offline callers inject their own transport instead."""
    try:
        import requests
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "API scorers need the requests package (or an injected "
            "transport fn)"
        ) from e
    return requests.post(url, headers=headers, data=payload).json()


Transport = Callable[[str, dict, str], dict]


class APIRanker:
    """Reference APIRanker (api_rankers.py:54-143) with injectable
    transport; url override supported the same way."""

    def __init__(self, model: str, api_key: str, api_provider: str,
                 verbose: int = 1, url: Optional[str] = None,
                 transport: Optional[Transport] = None):
        self.api_provider = api_provider.lower()
        self.model = model
        self.verbose = verbose
        self.ranking_type = "pointwise"
        self.headers = build_headers(self.api_provider, api_key)
        self.url = url if url else URLS[self.api_provider]
        self.transport = transport or requests_transport

    def rank(self, query: str, docs, doc_ids=None, metadata=None
             ) -> RankedResults:
        from rerankers_spark.rerank.ranker import prep_docs

        prepped = prep_docs(docs, doc_ids, metadata)
        payload = format_payload(
            self.api_provider, self.model, query, [d.text for d in prepped])
        response = self.transport(self.url, self.headers, payload)
        results = parse_response(self.api_provider, response, prepped)
        return RankedResults(results=results, query=query, has_scores=True)

    def score(self, query: str, doc: Union[str, Document]) -> float:
        text = doc.text if isinstance(doc, Document) else doc
        payload = format_payload(self.api_provider, self.model, query,
                                 [text])
        response = self.transport(self.url, self.headers, payload)
        results = parse_response(self.api_provider, response,
                                 [Document(text=text, doc_id=0)])
        return results[0].score

    def rank_df(self, candidates: DataFrame, query_col: str = "query",
                text_col: str = "text") -> DataFrame:
        """(query_id, doc_id, query, text) → + (score, rank): one API call
        per query group. The transport must be picklable (a stub in
        tests; requests_transport in production)."""
        provider, model = self.api_provider, self.model
        headers, url, transport = self.headers, self.url, self.transport

        def _group(pdf: pd.DataFrame) -> pd.DataFrame:
            docs = [Document(text=t, doc_id=i)
                    for i, t in enumerate(pdf[text_col])]
            payload = format_payload(
                provider, model, str(pdf[query_col].iloc[0]),
                [d.text for d in docs])
            results = parse_response(
                provider, transport(url, headers, payload), docs)
            out = pdf[["query_id", "doc_id"]].copy().reset_index(drop=True)
            scores = [0.0] * len(pdf)
            ranks = [0] * len(pdf)
            for r in results:
                scores[r.document.doc_id] = float(r.score)
                ranks[r.document.doc_id] = int(r.rank)
            out["score"] = pd.Series(scores, dtype="float64")
            out["rank"] = pd.Series(ranks, dtype="int32")
            return out

        return candidates.groupBy("query_id").applyInPandas(
            _group, "query_id long, doc_id long, score double, rank int"
        )
