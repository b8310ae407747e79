"""Offline tests for the LLM rankers' input assembly (pure token-id
arithmetic, tokenizer injected): MxBai v2 chat-template + 3/4-1/4 token
budgets (reference mxbai_v2.py:186-320), layerwise-LLM _get_inputs
(llm_layerwise_ranker.py:91-137), shared only-second pair truncation and
multiple-of-8 padding, and the PyLate score normalization
(pylate_ranker.py:63-68). No torch, no model downloads — a char-level
fake tokenizer makes every length assertion exact."""

from __future__ import annotations

import numpy as np
import pytest

from rerankers_spark.rerank import model_math as mm


def char_tok(s, ml=None):
    """Deterministic fake tokenizer: one id per character (codepoint),
    truncating to ml when given — mirrors the injected `tok` contract."""
    ids = [ord(c) for c in s]
    if ml is not None:
        ids = ids[:ml]
    return ids


# -- primitives ---------------------------------------------------------------


def test_ensure_multiple_of_8():
    assert mm.ensure_multiple_of_8(15) == 8
    assert mm.ensure_multiple_of_8(16) == 16
    assert mm.ensure_multiple_of_8(0) == 0
    # max_value is floored to a multiple of 8 FIRST (reference
    # mxbai_v2.py:87-92), then clamps
    assert mm.ensure_multiple_of_8(15, max_value=12) == 8
    assert mm.ensure_multiple_of_8(100, max_value=24) == 24


def test_pair_truncate_second():
    assert mm.pair_truncate_second([1, 2, 3], [4, 5, 6, 7], 5) == \
        [1, 2, 3, 4, 5]
    assert mm.pair_truncate_second([1, 2, 3], [4], 10) == [1, 2, 3, 4]
    # second can be cut to nothing; first is NEVER cut (both reference
    # callers pre-truncate it to the 3/4 budget)
    assert mm.pair_truncate_second([1, 2, 3], [4, 5], 3) == [1, 2, 3]
    assert mm.pair_truncate_second([1, 2, 3, 4], [5], 2) == [1, 2, 3, 4]


@pytest.mark.parametrize("side", ["left", "right"])
def test_pad_token_batch_multiple_of_8(side):
    ids, mask = mm.pad_token_batch([[1, 2, 3], [4]], pad_id=0,
                                   padding_side=side)
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    if side == "left":
        assert ids[0].tolist() == [0] * 5 + [1, 2, 3]
        assert mask[0].tolist() == [0] * 5 + [1] * 3
        assert ids[1].tolist() == [0] * 7 + [4]
        # the scored position (last) is always a real token under left
        # padding — the property the MxBai last-logit extraction needs
        assert mask[:, -1].tolist() == [1, 1]
    else:
        assert ids[0].tolist() == [1, 2, 3] + [0] * 5
        assert mask[1].tolist() == [1] + [0] * 7


def test_pad_token_batch_exact_multiple_no_extra_padding():
    ids, _ = mm.pad_token_batch([[1] * 16, [2] * 3], pad_id=0)
    assert ids.shape == (2, 16)


def test_pad_token_batch_empty():
    ids, mask = mm.pad_token_batch([], pad_id=0)
    assert ids.shape == (0, 0) and mask.shape == (0, 0)


# -- MxBai v2 -----------------------------------------------------------------


def _static():
    return mm.mxbai_v2_static_ids(char_tok)


def test_mxbai_static_segments():
    s = _static()
    t = mm.MXBAI_V2_TEMPLATES
    assert s["prefix_ids"] == char_tok(t["chat_prefix"])
    assert s["suffix_ids"] == char_tok(t["chat_suffix"])
    assert s["sep_ids"] == char_tok("\n")
    assert s["static_len"] == (
        len(s["prefix_ids"]) + len(s["task_prompt_ids"])
        + len(s["suffix_ids"]) + len(s["sep_ids"]))
    assert s["pos_id"] == ord("1") and s["neg_id"] == ord("0")


def test_mxbai_effective_lengths():
    # fits: untouched; padding = window floored to multiple of 8
    assert mm.mxbai_v2_effective_lengths(100, 50, 1000) == (100, 1000 - 0)
    # overflow: max_length shrinks so the static template always fits
    eff, pad = mm.mxbai_v2_effective_lengths(8192, 300, 4096)
    assert eff == 4096 - 300
    assert pad == 4096
    eff2, pad2 = mm.mxbai_v2_effective_lengths(8192, 300, 4100)
    assert eff2 == 4100 - 300 and pad2 == 4096  # floored to multiple of 8


def test_mxbai_prepare_layout_no_truncation():
    """Short inputs: exact segment concatenation in reference order
    (mxbai_v2.py:222-238 _create_full_input_ids)."""
    s = _static()
    t = mm.MXBAI_V2_TEMPLATES
    got = mm.mxbai_v2_prepare_ids(char_tok, "hi", "dog", max_length=8192,
                                  model_max_length=32768)
    q_ids = char_tok(str(t["query_prompt"]).format(query="hi"))
    d_ids = char_tok(str(t["doc_prompt"]).format(document="dog"))
    expected = (s["prefix_ids"] + q_ids + s["sep_ids"] + d_ids
                + s["sep_ids"] + s["task_prompt_ids"] + s["suffix_ids"])
    assert got == expected


def test_mxbai_prepare_instruction_prefix():
    s = _static()
    t = mm.MXBAI_V2_TEMPLATES
    got = mm.mxbai_v2_prepare_ids(char_tok, "hi", "dog",
                                  instruction="rank well",
                                  max_length=8192, model_max_length=32768)
    q_text = (str(t["instruction_prompt"]).format(instruction="rank well")
              + "\n" + str(t["query_prompt"]).format(query="hi"))
    expected = (s["prefix_ids"] + char_tok(q_text) + s["sep_ids"]
                + char_tok(str(t["doc_prompt"]).format(document="dog"))
                + s["sep_ids"] + s["task_prompt_ids"] + s["suffix_ids"])
    assert got == expected


def test_mxbai_query_budget_is_three_quarters():
    """An over-long query is truncated to 3/4 of the effective
    max_length (mxbai_v2.py:264-271)."""
    s = _static()
    max_length = 400
    got = mm.mxbai_v2_prepare_ids(char_tok, "q" * 1000, "d",
                                  max_length=max_length,
                                  model_max_length=32768)
    content = got[len(s["prefix_ids"]):len(got) - len(s["sep_ids"])
                  - len(s["task_prompt_ids"]) - len(s["suffix_ids"])]
    # query segment = first 300 ids of "query: qqq..."
    q_full = char_tok("query: " + "q" * 1000)
    assert content[:max_length * 3 // 4] == q_full[:max_length * 3 // 4]


def test_mxbai_doc_budget_is_quarter():
    """An over-long doc is capped at max_length // 4 tokens
    (mxbai_v2.py:273-276) when the window is not the binding limit."""
    s = _static()
    max_length = 400
    got = mm.mxbai_v2_prepare_ids(char_tok, "hi", "d" * 5000,
                                  max_length=max_length,
                                  model_max_length=32768)
    q_ids = char_tok("query: hi")
    tail_len = (len(s["sep_ids"]) + len(s["task_prompt_ids"])
                + len(s["suffix_ids"]))
    doc_seg = got[len(s["prefix_ids"]) + len(q_ids) + len(s["sep_ids"]):
                  len(got) - tail_len]
    assert len(doc_seg) == max_length // 4
    assert doc_seg == char_tok("document: " + "d" * 5000)[:max_length // 4]


def test_mxbai_window_binds_doc_budget():
    """When the model window is small, the doc budget is the remaining
    window, not max_length // 4 (mxbai_v2.py:273-274)."""
    s = _static()
    model_max = s["static_len"] + 100
    # effective max_length = 100; query takes 3/4 = 75 of it
    got = mm.mxbai_v2_prepare_ids(char_tok, "q" * 200, "d" * 200,
                                  max_length=8192,
                                  model_max_length=model_max)
    # query got 75; window leaves 100-75=25 for the doc; max_length//4
    # would have allowed 25 too (eff=100) — tighten: make query shorter
    got2 = mm.mxbai_v2_prepare_ids(char_tok, "q", "d" * 200,
                                   max_length=8192,
                                   model_max_length=model_max)
    # query: "query: q" = 8 ids; window leaves 92; eff//4 = 25 binds
    q_len = len(char_tok("query: q"))
    tail = (len(s["sep_ids"]) + len(s["task_prompt_ids"])
            + len(s["suffix_ids"]))
    doc_seg2 = got2[len(s["prefix_ids"]) + q_len + len(s["sep_ids"]):
                    len(got2) - tail]
    assert len(doc_seg2) == 100 // 4
    # and the first call never exceeds the pair cap (only-second
    # truncation at eff=100)
    content1 = got[len(s["prefix_ids"]):len(got) - tail]
    assert len(content1) <= 100


def test_mxbai_total_never_exceeds_window():
    s = _static()
    for model_max in (s["static_len"] + 64, s["static_len"] + 256, 4096):
        got = mm.mxbai_v2_prepare_ids(char_tok, "q" * 999, "d" * 999,
                                      max_length=8192,
                                      model_max_length=model_max)
        assert len(got) <= model_max


# -- layerwise ----------------------------------------------------------------


def test_layerwise_prepare_layout():
    got = mm.layerwise_prepare_ids(char_tok, "q", "p", bos_id=7,
                                   max_sequence_length=512)
    expected = ([7] + char_tok("A: q") + char_tok("\n") + char_tok("B: p")
                + char_tok("\n") + char_tok(mm.LAYERWISE_PROMPT))
    assert got == expected


def test_layerwise_passage_truncation_only_second():
    max_seq = 64
    got = mm.layerwise_prepare_ids(char_tok, "qq", "p" * 500, bos_id=7,
                                   max_sequence_length=max_seq)
    prompt_ids = char_tok(mm.LAYERWISE_PROMPT)
    sep = char_tok("\n")
    # item (bos + query + sep + passage) is capped at max_seq, then the
    # sep+prompt tail is appended UNCAPPED (reference
    # llm_layerwise_ranker.py:117-128)
    assert len(got) == max_seq + len(sep) + len(prompt_ids)
    q_part = [7] + char_tok("A: qq")
    assert got[:len(q_part)] == q_part
    assert got[-len(prompt_ids):] == prompt_ids


def test_layerwise_query_budget():
    max_seq = 100
    got = mm.layerwise_prepare_ids(char_tok, "q" * 500, "p", bos_id=7,
                                   max_sequence_length=max_seq)
    # query truncated to 3/4 of max_seq BEFORE the bos is prepended
    q_ids = char_tok("A: " + "q" * 500, max_seq * 3 // 4)
    assert got[:1 + len(q_ids)] == [7] + q_ids


def test_layerwise_scores_extraction():
    layer0 = np.array([[0.1, 0.2], [0.3, 0.4]])
    layer1 = np.array([[1.0, 2.0], [3.0, 4.0]])
    got = mm.layerwise_scores([layer0, layer1])
    assert got.tolist() == [2.0, 4.0]  # last layer, last token


# -- pylate -------------------------------------------------------------------


def test_pylate_normalize():
    got = mm.pylate_normalize([3.0, 1.5, 0.0], query_token_count=3)
    assert got.tolist() == [1.0, 0.5, 0.0]
    assert got.dtype == np.float64
