"""Image Document parity: reference documents.py:4-24 field surface,
utils.py:123-189 prep_image_docs, and the bridge into the multimodal
binary-column pipeline."""

from __future__ import annotations

import base64

import pytest

from rerankers_spark.results import Document, Result
from rerankers_spark.rerank.ranker import prep_docs, prep_image_docs
from rerankers_spark.sources.multimodal import (
    extract_features,
    image_docs_to_df,
)

# 1x1 transparent PNG (standard minimal fixture)
PNG_B64 = (
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk"
    "YPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
)


def test_document_image_fields_default_none():
    d = Document(text="hi")
    assert d.base64 is None and d.image_path is None
    assert d.document_type == "text"
    assert set(d.attributes) == {
        "text", "base64", "image_path", "doc_id", "metadata",
        "document_type"}


def test_text_document_requires_text():
    with pytest.raises(ValueError):
        Document(document_type="text")
    # image documents don't need text (reference documents.py:22-24)
    Document(document_type="image", base64=PNG_B64)


def test_result_attribute_passthrough_includes_image_fields():
    # the round-1 defect: result.base64 raised AttributeError where the
    # reference returns None (reference results.py:15-26)
    r = Result(document=Document(text="t", doc_id=1), score=0.5)
    assert r.base64 is None
    assert r.image_path is None
    ri = Result(
        document=Document(document_type="image", base64=PNG_B64,
                          image_path="/x.png", doc_id=2),
        rank=1,
    )
    assert ri.base64 == PNG_B64
    assert ri.image_path == "/x.png"


def test_prep_image_docs_base64_input():
    docs = prep_image_docs(PNG_B64)
    assert len(docs) == 1
    assert docs[0].document_type == "image"
    assert docs[0].base64 == PNG_B64
    assert docs[0].image_path is None
    assert docs[0].doc_id == 0


def test_prep_image_docs_path_input(tmp_path):
    p = tmp_path / "img.png"
    p.write_bytes(base64.b64decode(PNG_B64))
    docs = prep_image_docs([str(p)], doc_ids=[7], metadata=[{"k": "v"}])
    assert docs[0].image_path == str(p)
    assert docs[0].base64 == PNG_B64
    assert docs[0].doc_id == 7 and docs[0].metadata == {"k": "v"}


def test_prep_image_docs_rejects_text_documents():
    with pytest.raises(ValueError, match="type 'image'"):
        prep_image_docs(Document(text="not an image"))


def test_prep_image_docs_document_passthrough():
    d = Document(document_type="image", base64=PNG_B64)
    out = prep_image_docs([d], doc_ids=[3])
    assert out[0] is d and out[0].doc_id == 3


def test_prep_image_docs_bad_input_raises():
    with pytest.raises(ValueError, match="Could not process"):
        prep_image_docs("/nonexistent/file.png")


def test_prep_docs_positional_ids_still_hold():
    out = prep_docs(["a", "b"])
    assert [d.doc_id for d in out] == [0, 1]


def test_image_docs_bridge_to_binary_columns(spark):
    docs = prep_image_docs([PNG_B64, PNG_B64], doc_ids=[10, 11],
                           metadata=[{"src": "cam"}, {}])
    media = image_docs_to_df(spark, docs)
    rows = {r["doc_id"]: r for r in media.collect()}
    assert rows[10]["media_type"] == "image"
    assert bytes(rows[10]["payload"]) == base64.b64decode(PNG_B64)
    assert rows[10]["meta"]["src"] == "cam"
    feats = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert feats[10]["n_bytes"] == len(base64.b64decode(PNG_B64))
    assert len(feats[11]["feature"]) == 16
