"""API-parity facade: Document / Result / RankedResults.

Mirrors the reference's result semantics exactly (they are the "query
semantics" of rerankers — SURVEY.md §1.1):

* ``Document``: text/doc_id/metadata, text required for text documents
  (reference rerankers/documents.py:4-24).
* ``Result``: score-or-rank validation (reference rerankers/results.py:12-13);
  attribute passthrough to document and metadata (results.py:15-26).
* ``RankedResults``: iterable, indexable in PASSED-DOCUMENT order not rank
  order (results.py:48-50); ``top_k`` with None-score → -inf / None-rank →
  +inf and Python-stable-sort tie behavior (results.py:56-68);
  ``get_score_by_docid`` first-match linear scan (results.py:70-78).

These are plain driver-side objects: the distributed representation is a
DataFrame[query_id, doc_id, score, rank]; this facade wraps a per-query
``.collect()`` so code written against the reference API keeps working.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Union


class Document:
    """Text or image document — full reference field surface
    (rerankers/documents.py:4-24: text/base64/image_path/doc_id/metadata/
    document_type, text required only for text documents). Image PAYLOAD
    processing lives in sources/multimodal.py; these fields carry the
    per-document pointers the reference API exposes."""

    _attrs = ("text", "base64", "image_path", "doc_id", "metadata",
              "document_type")

    def __init__(
        self,
        text: Optional[str] = None,
        doc_id: Optional[Union[str, int]] = None,
        metadata: Optional[dict] = None,
        document_type: str = "text",
        image_path: Optional[str] = None,
        base64: Optional[str] = None,
    ) -> None:
        if document_type == "text" and text is None:
            raise ValueError(
                "text field is required when document_type is 'text'")
        self.attributes = list(self._attrs)
        self.document_type = document_type
        self.text = text
        self.base64 = base64
        self.image_path = image_path
        self.doc_id = doc_id
        self.metadata = metadata if metadata is not None else {}

    def __repr__(self) -> str:  # pragma: no cover
        fields = {
            "text": self.text,
            "doc_id": self.doc_id,
            "metadata": self.metadata,
            "document_type": self.document_type,
            "image_path": self.image_path,
            "base64": self.base64,
        }
        field_str = ", ".join(f"{k}={v!r}" for k, v in fields.items())
        return f"Document({field_str})"


class Result:
    """score-or-rank invariant + attribute passthrough
    (reference rerankers/results.py:6-26)."""

    def __init__(
        self,
        document: Document,
        score: Optional[float] = None,
        rank: Optional[int] = None,
    ) -> None:
        if score is None and rank is None:
            raise ValueError("Either score or rank must be provided.")
        self.document = document
        self.score = score
        self.rank = rank

    def __getattr__(self, item: str):
        # Called only when normal lookup fails. Passthrough order mirrors
        # the reference: own fields → document attrs → metadata keys.
        document = self.__dict__.get("document")
        if document is not None:
            if item in Document._attrs:
                return getattr(document, item)
            if item in document.metadata:
                return document.metadata[item]
        raise AttributeError(
            f"'{type(self).__name__}' object has no attribute '{item}'"
        )

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"Result(doc_id={self.document.doc_id!r}, "
            f"score={self.score!r}, rank={self.rank!r})"
        )


class RankedResults:
    """Reference rerankers/results.py:38-78 semantics."""

    def __init__(self, results: List[Result], query: str, has_scores: bool = False):
        self.results = results
        self.query = query
        self.has_scores = has_scores

    def __iter__(self) -> Iterator[Result]:
        return iter(self.results)

    def __getitem__(self, idx: int) -> Result:
        # NOTE: passed-document order, not rank order (reference
        # results.py:48-50 and the warning at README.md:247).
        return self.results[idx]

    def __len__(self) -> int:
        return len(self.results)

    def results_count(self) -> int:
        return len(self.results)

    def top_k(self, k: int) -> List[Result]:
        """None-handling + stable ties exactly as reference results.py:56-68."""
        if self.has_scores:
            return sorted(
                self.results,
                key=lambda r: r.score if r.score is not None else float("-inf"),
                reverse=True,
            )[:k]
        return sorted(
            self.results,
            key=lambda r: r.rank if r.rank is not None else float("inf"),
        )[:k]

    def get_score_by_docid(self, doc_id: Union[int, str]) -> Optional[float]:
        for r in self.results:
            if r.document.doc_id == doc_id:
                return r.score
        return None

    def get_result_by_docid(self, doc_id: Union[int, str]) -> Optional[Result]:
        for r in self.results:
            if r.document.doc_id == doc_id:
                return r
        return None
