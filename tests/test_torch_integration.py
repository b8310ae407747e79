"""Torch-present integration suite for the model-backed scorer families.

This sandbox has no torch, so every test here collects and SKIPS; in any
torch-equipped environment (with network access for the checkpoint
downloads) the same suite exercises the FULL runtime scorer bodies —
tokenize → forward → score extraction — with no code changes, wiring the
consistency-gate harness (eval.ndcg_at_k, the reference notebooks'
NDCG±0.01 shape) to real checkpoints. Checkpoints are the smallest
public member of each family.

Offline counterparts (always run): tests/test_model_families.py
(dispatch + gates), tests/test_prompt_assembly.py (input assembly),
and the model_math score-extraction tests.
"""

from __future__ import annotations

import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from rerankers_spark.eval import ndcg_at_k  # noqa: E402
from rerankers_spark.rerank.ranker import Reranker  # noqa: E402

# A tiny fixture where relevance is unambiguous for any trained ranker.
QUERY = "how do solar panels generate electricity"
DOCS = [
    "Solar panels convert sunlight into electricity using photovoltaic "
    "cells made of semiconductor materials like silicon.",
    "The recipe calls for two cups of flour, a teaspoon of baking soda, "
    "and a pinch of salt.",
    "Photovoltaic systems produce electrical power from solar radiation "
    "through the photovoltaic effect in solar cells.",
    "The football match ended in a two-two draw after extra time.",
]
RELEVANT = {0, 2}
QRELS = {i: 1.0 for i in RELEVANT}


def _rank_or_skip(family: str, model_name: str):
    """Build the scorer and rank the fixture; skip (not fail) when the
    checkpoint can't be fetched — this suite's contract is 'runs wherever
    torch + network exist', not 'fails where they don't'."""
    try:
        rr = Reranker(model_name, model_type=family, verbose=0)
        return rr.rank(QUERY, DOCS)
    except (OSError, ValueError, ImportError) as e:  # download/load failure
        pytest.skip(f"checkpoint {model_name} unavailable: {e}")


def _assert_quality(ranked):
    """The consistency-gate shape: scores finite, ranks contiguous, and
    the two on-topic docs beat the two off-topic ones (NDCG@4 == 1.0 for
    a binary qrel set iff relevant docs occupy the top ranks; any
    trained ranker clears 0.9 on this fixture)."""
    results = sorted(ranked.results, key=lambda r: r.rank)
    assert [r.rank for r in results] == [1, 2, 3, 4]
    assert all(r.score == r.score for r in results)  # no NaN
    order = [r.doc_id for r in results]
    assert ndcg_at_k(order, QRELS, k=4) >= 0.9, order


@pytest.mark.parametrize(
    "family,model_name",
    [
        ("cross-encoder", "cross-encoder/ms-marco-TinyBERT-L-2-v2"),
        ("t5", "unicamp-dl/InRanker-small"),
        ("colbert", "answerdotai/answerai-colbert-small-v1"),
        ("upr", "google/t5-small-lm-adapt"),
        ("llm-layerwise", "BAAI/bge-reranker-v2.5-gemma2-lightweight"),
        ("mxbaiv2", "mixedbread-ai/mxbai-rerank-base-v2"),
    ],
)
def test_family_runtime_body(family, model_name):
    _assert_quality(_rank_or_skip(family, model_name))


def test_single_doc_score_no_rank():
    """Single-doc special case through a real checkpoint (reference
    transformer_ranker.py:87-88: score, no rank)."""
    try:
        rr = Reranker("cross-encoder/ms-marco-TinyBERT-L-2-v2",
                      model_type="cross-encoder", verbose=0)
    except (OSError, ValueError) as e:
        pytest.skip(f"checkpoint unavailable: {e}")
    out = rr.rank(QUERY, [DOCS[0]])
    assert len(out.results) == 1
    assert out.results[0].rank is None
    assert isinstance(rr.score(QUERY, DOCS[1]), float)


def test_monovlm_runtime_body():
    """MonoVLM image reranking through the real Qwen2-VL checkpoint
    (reference monovlm_ranker.py:93-143, examples/reranker_images.ipynb):
    two synthetic images — one containing the query term rendered as
    text, one blank — scored by P(True); ranks contiguous, scores are
    probabilities."""
    PIL = pytest.importorskip("PIL")
    import base64
    import io

    from PIL import Image, ImageDraw

    def _png_b64(draw_text=None):
        img = Image.new("RGB", (96, 96), "white")
        if draw_text:
            ImageDraw.Draw(img).text((4, 40), draw_text, fill="black")
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    try:
        rr = Reranker("lightonai/MonoQwen2-VL-v0.1", model_type="monovlm",
                      verbose=0)
        out = rr.rank("a picture containing the word cat",
                      [_png_b64("cat"), _png_b64()])
    except (OSError, ValueError, ImportError) as e:
        pytest.skip(f"MonoQwen2 checkpoint unavailable: {e}")
    results = sorted(out.results, key=lambda r: r.rank)
    assert [r.rank for r in results] == [1, 2]
    assert all(0.0 <= r.score <= 1.0 for r in results)


def test_pylate_runtime_body():
    pytest.importorskip("pylate")
    _assert_quality(_rank_or_skip("pylate", "lightonai/GTE-ModernColBERT-v1"))


def test_flashrank_runtime_body():
    pytest.importorskip("flashrank")
    _assert_quality(_rank_or_skip("flashrank", "ms-marco-MiniLM-L-12-v2"))
