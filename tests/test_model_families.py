"""Offline unit tests for the model-backed scorer families' portable
math (rerank/model_math.py), the API ranker payload/parse logic
(rerank/api.py), and the LLM relevance filter (rerank/relevance_filter.py).

These mirror the reference semantics on synthetic tensors / stubbed
transports — no torch, no network, no model downloads."""

from __future__ import annotations

import json
import math
import warnings

import numpy as np
import pytest

from rerankers_spark.rerank import model_math as mm
from rerankers_spark.rerank import api as api_mod
from rerankers_spark.rerank import relevance_filter as rf
from rerankers_spark.rerank.ranker import (
    _get_api_provider,
    _get_model_type,
    get_reranker,
)
from rerankers_spark.results import Document


# --- T5 -------------------------------------------------------------------

def test_t5_scores_is_pairwise_softmax():
    f = np.array([0.0, 2.0, -1.0])
    t = np.array([0.0, 1.0, 3.0])
    got = mm.t5_scores(f, t)
    want = [math.exp(ti) / (math.exp(fi) + math.exp(ti))
            for fi, ti in zip(f, t)]
    np.testing.assert_allclose(got, want, atol=1e-12)
    # probabilities, monotone in (t - f)
    assert got[0] == pytest.approx(0.5)
    assert got[1] < 0.5 < got[2]


def test_t5_scores_stable_at_large_logits():
    got = mm.t5_scores(np.array([1000.0]), np.array([1004.0]))
    assert got[0] == pytest.approx(1 / (1 + math.exp(-4.0)), abs=1e-12)


def test_t5_scores_return_logits():
    t = np.array([1.5, -2.0])
    np.testing.assert_array_equal(
        mm.t5_scores(np.array([9.0, 9.0]), t, return_logits=True), t)


def test_t5_output_tokens_table():
    # known model → its table entry (reference t5ranker.py:64-82)
    assert mm.get_output_tokens("castorini/monot5-base-msmarco") == (
        "▁false", "▁true")
    assert mm.get_output_tokens("unicamp-dl/mt5-base-mmarco-v2") == (
        "▁no", "▁yes")
    # TWOLAR uses raw ids
    assert mm.get_output_tokens("Dundalia/TWOLAR-xl") == (6136, 1176)
    # explicit tokens pass through untouched
    assert mm.get_output_tokens("anything", "▁F", "▁T") == ("▁F", "▁T")
    # unknown model warns and falls back to the default pair
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert mm.get_output_tokens("mystery/t5") == ("▁false", "▁true")
        assert len(w) == 2


# --- ColBERT ---------------------------------------------------------------

def _maxsim_loop(q_reps, p_reps, q_mask, p_mask):
    """Literal-loop re-derivation of the reference _colbert_score
    (colbert_ranker.py:71-84) to check the vectorized port against."""
    Q, I, _ = q_reps.shape
    P, J, _ = p_reps.shape
    out = np.zeros((Q, P))
    for q in range(Q):
        for p in range(P):
            s = 0.0
            for i in range(I):
                best = -1e4
                for j in range(J):
                    v = float(q_reps[q, i] @ p_reps[p, j]) \
                        if p_mask[p, j] else -1e4
                    best = max(best, v)
                s += best
            out[q, p] = s / q_mask[q].sum()
    return out


def test_colbert_maxsim_matches_loop_oracle():
    rng = np.random.default_rng(7)
    q_reps = rng.normal(size=(2, 4, 8))
    p_reps = rng.normal(size=(3, 5, 8))
    q_mask = np.array([[1, 1, 1, 0], [1, 1, 0, 0]])
    p_mask = np.array([[1, 1, 1, 1, 0], [1, 1, 0, 0, 0], [1, 1, 1, 1, 1]])
    got = mm.colbert_maxsim(q_reps, p_reps, q_mask, p_mask)
    np.testing.assert_allclose(
        got, _maxsim_loop(q_reps, p_reps, q_mask, p_mask), atol=1e-12)


def test_colbert_maxsim_identical_doc_scores_higher():
    # a doc sharing the query's token vectors beats an orthogonal one
    q = np.zeros((1, 2, 4))
    q[0, 0, 0] = 1.0
    q[0, 1, 1] = 1.0
    p = np.zeros((2, 2, 4))
    p[0] = q[0]             # same vectors
    p[1, 0, 2] = 1.0        # orthogonal
    p[1, 1, 3] = 1.0
    ones = np.ones((2, 2), dtype=int)
    scores = mm.colbert_maxsim(q, p, np.ones((1, 2), dtype=int), ones)
    assert scores[0, 0] > scores[0, 1]
    assert scores[0, 0] == pytest.approx(1.0)


def test_colbert_maxsim_rejects_short_q_reps():
    with pytest.raises(ValueError):
        mm.colbert_maxsim(np.zeros((1, 2, 4)), np.zeros((1, 3, 4)),
                          np.ones((1, 3)), np.ones((1, 3)))


def test_colbert_query_length_rule():
    # remainder <= 8 → extend by 8; else round up to the multiple
    # (reference colbert_ranker.py:150-156)
    assert mm.colbert_query_length(7) == 15
    assert mm.colbert_query_length(32) == 40      # 32 % 32 == 0 <= 8
    assert mm.colbert_query_length(40) == 48
    assert mm.colbert_query_length(41) == 64      # 41 % 32 = 9 > 8
    # 16-multiple variant (reference colbert_ranker.py:352-357)
    assert mm.colbert_query_length(20, multiple=16) == 28  # 20%16=4 <= 8
    assert mm.colbert_query_length(26, multiple=16) == 32  # 26%16=10 > 8


def test_colbert_doc_max_length_clamps():
    # round up to 32, floor at query_max_length, cap at doc_max_length
    # (reference colbert_ranker.py:310-324)
    assert mm.colbert_doc_max_length([10, 20], 32, 512) == 32
    assert mm.colbert_doc_max_length([33], 32, 512) == 64
    assert mm.colbert_doc_max_length([5], 96, 512) == 96
    assert mm.colbert_doc_max_length([1000], 32, 512) == 512


# --- layerwise / UPR / MxBai v2 ---------------------------------------------

def test_layerwise_scores_takes_last_layer_last_token():
    layers = [np.array([[1.0, 2.0], [3.0, 4.0]]),
              np.array([[5.0, 6.0], [7.0, 8.0]])]
    np.testing.assert_array_equal(mm.layerwise_scores(layers), [6.0, 8.0])


def test_upr_scores_sums_token_log_probs():
    tlp = np.array([[-1.0, -2.0, -3.0], [-0.5, -0.5, -0.5]])
    np.testing.assert_allclose(mm.upr_scores(tlp), [-6.0, -1.5])
    # better (less negative) log-likelihood ranks higher
    assert mm.upr_scores(tlp)[1] > mm.upr_scores(tlp)[0]


def test_mxbai_v2_scores_logit_diff():
    logits = np.array([[0.1, 2.0, 5.0], [0.2, 3.0, 1.0]])
    np.testing.assert_allclose(
        mm.mxbai_v2_scores(logits, pos_id=2, neg_id=1), [3.0, -2.0])


# --- MonoVLM ----------------------------------------------------------------

def test_monovlm_scores_is_pairwise_softmax():
    """P(True) = softmax over the [False, True] logit pair (reference
    monovlm_ranker.py:135-139) — the same pair-softmax identity as T5."""
    f = np.array([0.0, 2.0, -1.0])
    t = np.array([0.0, 1.0, 3.0])
    got = mm.monovlm_scores(f, t)
    want = [math.exp(ti) / (math.exp(fi) + math.exp(ti))
            for fi, ti in zip(f, t)]
    np.testing.assert_allclose(got, want, atol=1e-12)
    # return_logits=True returns the raw True logit
    # (monovlm_ranker.py:136-137)
    np.testing.assert_array_equal(
        mm.monovlm_scores(f, t, return_logits=True), t)


def test_monovlm_output_tokens_table():
    # known checkpoint → its table entry (reference monovlm_ranker.py:13-16)
    assert mm.monovlm_output_tokens("lightonai/MonoQwen2-VL-v0.1") == (
        "False", "True")
    # explicit tokens pass through untouched
    assert mm.monovlm_output_tokens("x", "F", "T") == ("F", "T")
    # unknown model warns (twice: false + true) and falls back to default
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert mm.monovlm_output_tokens("mystery/vlm") == ("False", "True")
        assert len(w) == 2


def test_monovlm_prompt_template_verbatim():
    """The prompt string IS the checkpoint contract (reference
    monovlm_ranker.py:50, kept byte-identical)."""
    assert mm.MONOVLM_PROMPT_TEMPLATE == (
        "Assert the relevance of the previous image document to the "
        "following query, answer True or False. The query is: {query}"
    )
    assert mm.MONOVLM_PROMPT_TEMPLATE.format(query="q?").endswith(
        "The query is: q?")


def test_monovlm_model_type_inference_and_gated_import():
    import base64

    assert _get_model_type("lightonai/MonoQwen2-VL-v0.1", None) == "monovlm"
    try:
        import torch  # noqa: F401
        pytest.skip("torch present: gated-import branch not reachable")
    except ImportError:
        pass
    # a base64 payload with PNG magic passes prep_image_docs' torch-free
    # classifier, so rank() reaches the scorer factory and hits the gate
    png_b64 = base64.b64encode(b"\x89PNG\r\n\x1a\n0000").decode()
    with pytest.raises(ImportError, match="monovlm scorer"):
        get_reranker("monovlm").rank("q", [png_b64, png_b64])


# --- API ranker payload/parse -----------------------------------------------

def test_payload_cohere_default_shape():
    p = json.loads(api_mod.format_payload("cohere", "rerank-english-v3.0",
                                          "q", ["a", "b"]))
    assert p == {"model": "rerank-english-v3.0", "query": "q",
                 "documents": ["a", "b"], "top_n": 2,
                 "return_documents": True}


def test_payload_voyage_uses_top_k():
    p = json.loads(api_mod.format_payload("voyage", "m", "q", ["a"]))
    assert "top_k" in p and "top_n" not in p


def test_payload_mixedbread_keys():
    p = json.loads(api_mod.format_payload("mixedbread.ai", "m", "q", ["a"]))
    assert p["input"] == ["a"]
    assert p["return_input"] is True and "return_documents" not in p
    assert "top_k" in p


def test_payload_pinecone_wraps_documents():
    p = json.loads(api_mod.format_payload("pinecone", "m", "q", ["a", "b"]))
    assert p["documents"] == [{"text": "a"}, {"text": "b"}]
    assert "top_n" in p


def test_payload_isaacus_texts_key():
    p = json.loads(api_mod.format_payload("isaacus", "m", "q", ["a"]))
    assert p["texts"] == ["a"]


def test_headers_bearer_vs_pinecone():
    h = api_mod.build_headers("cohere", "KEY")
    assert h["Authorization"] == "Bearer KEY"
    hp = api_mod.build_headers("pinecone", "KEY")
    assert hp["Api-Key"] == "KEY"
    assert hp["X-Pinecone-API-Version"] == "2024-10"
    assert "Authorization" not in hp


def test_parse_response_results_and_data_shapes():
    docs = [Document(text="a", doc_id=10), Document(text="b", doc_id=11)]
    cohere_resp = {"results": [
        {"index": 1, "relevance_score": 0.9},
        {"index": 0, "relevance_score": 0.2},
    ]}
    out = api_mod.parse_response("cohere", cohere_resp, docs)
    assert [(r.document.doc_id, r.score, r.rank) for r in out] == [
        (11, 0.9, 1), (10, 0.2, 2)]
    mb_resp = {"data": [{"index": 0, "score": 0.7}]}
    out2 = api_mod.parse_response("mixedbread.ai", mb_resp, docs)
    assert out2[0].score == 0.7 and out2[0].document.doc_id == 10


def test_get_document_text_per_provider():
    assert api_mod.get_document_text("voyage", {"document": "txt"}) == "txt"
    assert api_mod.get_document_text("mixedbread.ai", {"input": "t"}) == "t"
    assert api_mod.get_document_text(
        "cohere", {"document": {"text": "t"}}) == "t"


def _stub_transport(score_by_index):
    calls = []

    def transport(url, headers, payload):
        calls.append((url, headers, json.loads(payload)))
        body = json.loads(payload)
        docs_key = "documents" if "documents" in body else (
            "input" if "input" in body else "texts")
        n = len(body[docs_key])
        rows = sorted(
            ({"index": i, "relevance_score": score_by_index(i)}
             for i in range(n)),
            key=lambda r: -r["relevance_score"],
        )
        return {"results": rows}

    transport.calls = calls
    return transport


def test_api_ranker_rank_with_stub_transport():
    t = _stub_transport(lambda i: float(i))
    r = api_mod.APIRanker("m", "KEY", "cohere", transport=t)
    ranked = r.rank("q", ["a", "b", "c"])
    assert [x.document.doc_id for x in ranked.top_k(3)] == [2, 1, 0]
    assert ranked.top_k(1)[0].rank == 1
    url, headers, body = t.calls[0]
    assert url == api_mod.URLS["cohere"]
    assert headers["Authorization"] == "Bearer KEY"
    assert body["top_n"] == 3


def test_api_ranker_score_single():
    t = _stub_transport(lambda i: 0.42)
    r = api_mod.APIRanker("m", "K", "jina", transport=t)
    assert r.score("q", "doc") == 0.42


def test_api_ranker_rank_df(spark):
    t = _stub_transport(lambda i: float(i))
    r = api_mod.APIRanker("m", "K", "cohere", transport=t)
    cands = spark.createDataFrame(
        [(0, 100, "q0", "a"), (0, 101, "q0", "b"), (1, 200, "q1", "z")],
        "query_id long, doc_id long, query string, text string",
    )
    rows = {(x["query_id"], x["doc_id"]): (x["score"], x["rank"])
            for x in r.rank_df(cands).collect()}
    assert rows[(0, 101)] == (1.0, 1)
    assert rows[(0, 100)] == (0.0, 2)
    assert rows[(1, 200)][1] == 1


# --- factory dispatch --------------------------------------------------------

def test_model_type_keywords_route_model_classes():
    # the round-1 defect: t5/colbert must NOT resolve to cross-encoder
    assert _get_model_type("castorini/monot5-base-msmarco", None) == "t5"
    assert _get_model_type("unicamp-dl/InRanker-base", None) == "t5"
    assert _get_model_type("colbert-ir/colbertv2.0", None) == "colbert"
    assert _get_model_type("castorini/LiT5-Distill-base", None) == "listwise"
    assert _get_model_type(
        "mixedbread-ai/mxbai-rerank-base-v1", None) == "cross-encoder"
    assert _get_model_type(
        "mixedbread-ai/mxbai-rerank-base-v2", None) == "mxbaiv2"
    assert _get_model_type(
        "BAAI/bge-reranker-v2.5-gemma2-lightweight", None) == "llm-layerwise"
    assert _get_model_type("ms-marco-MiniLM-L-12-v2".lower(), None) == \
        "flashrank"
    assert _get_model_type("rank_zephyr", None) == "listwise"
    assert _get_model_type("google/t5-large-lm-adapt", None) == "t5"


def test_api_provider_detection():
    assert _get_api_provider("cohere-rerank-english") == "cohere"
    assert _get_api_provider("jina-reranker-v1-base-en") == "jina"
    # explicit non-provider type suppresses detection
    # (reference reranker.py:75-77)
    assert _get_api_provider("cohere-x", "cross-encoder") is None
    # family whose defaults embed a provider name
    assert _get_api_provider("pinecone") == "pinecone"


def test_get_reranker_returns_api_ranker_for_provider():
    r = get_reranker("cohere", api_key="K", transport=lambda *a: {})
    assert isinstance(r, api_mod.APIRanker)
    assert r.api_provider == "cohere"
    # bare provider name resolved to the provider's default model
    assert r.model == "rerank-english-v3.0"


def test_get_reranker_t5_family_raises_gated_import():
    with pytest.raises(ImportError, match="t5 scorer"):
        get_reranker("t5").rank("q", ["a", "b"])


def test_get_reranker_colbert_family_raises_gated_import():
    with pytest.raises(ImportError, match="colbert scorer"):
        get_reranker("colbert").rank("q", ["a", "b"])


def test_get_reranker_relevance_filter():
    # explicit model_type, as in the reference (family-name resolution
    # maps to a gpt default whose NAME would infer listwise)
    r = get_reranker("gpt-4", model_type="llm-relevance-filter",
                     completion_fn=rf.stub_completion_fn)
    assert isinstance(r, rf.LLMRelevanceFilter)


# --- LLM relevance filter ----------------------------------------------------

def test_parse_answer_extracts_and_defaults():
    assert rf.parse_answer("<answer>RELEVANT</answer>") == "RELEVANT"
    assert rf.parse_answer("<answer>\n not_relevant \n</answer>") == \
        "NOT_RELEVANT"
    # malformed → default label (reference llm_relevance_filter.py:130-134)
    assert rf.parse_answer("garbage") == "RELEVANT"
    assert rf.parse_answer("garbage", default_label="NOT_RELEVANT") == \
        "NOT_RELEVANT"


def test_format_doc_inputs_enumerates():
    xml = rf.format_doc_inputs(["aaa", "bbb"])
    assert "<document id=0>\naaa\n</document>" in xml
    assert "<document id=1>\nbbb\n</document>" in xml


def test_parse_doc_scores_missing_ids_are_zero():
    resp = ("<document id=1>\n<answer>RELEVANT</answer>\n</document>")
    assert rf.parse_doc_scores(resp, 3) == [0.0, 1.0, 0.0]


def test_filter_rank_stable_order():
    # ties (same score) keep original index order; rank = idx + 1
    # (reference llm_relevance_filter.py:183-192)
    f = rf.LLMRelevanceFilter()
    ranked = f.rank("hash join", ["hash here", "nothing", "join it"])
    got = [(r.document.doc_id, r.score, r.rank) for r in ranked]
    assert got == [(0, 1.0, 1), (2, 1.0, 2), (1, 0.0, 3)]


def test_filter_score_single():
    f = rf.LLMRelevanceFilter()
    assert f.score("hash", "hash table") == 1.0
    assert f.score("hash", "unrelated words") == 0.0


def test_filter_relevant_dataframe_op(spark):
    f = rf.LLMRelevanceFilter()
    cands = spark.createDataFrame(
        [(0, 1, "hash join", "hash impl"), (0, 2, "hash join", "zzz"),
         (1, 3, "merge", "merge sort")],
        "query_id long, doc_id long, query string, text string",
    )
    kept = {(r["query_id"], r["doc_id"])
            for r in f.filter_relevant(cands).collect()}
    assert kept == {(0, 1), (1, 3)}
