"""Pure-numpy score-extraction math for the model-backed scorer families.

Every function here is the torch-free core of a reference ranker's scoring
step, unit-testable on synthetic tensors without model downloads:

* T5 pointwise true/false softmax      — reference models/t5ranker.py:239-246
* T5 output-token resolution table     — reference models/t5ranker.py:30-82
* ColBERT MaxSim late interaction      — reference models/colbert_ranker.py:71-84
* ColBERT dynamic-length encoding      — reference models/colbert_ranker.py:150-156,
                                         310-324, 352-357
* layerwise-LLM last-token extraction  — reference models/llm_layerwise_ranker.py:168-177
* layerwise-LLM input assembly         — reference models/llm_layerwise_ranker.py:91-137
* UPR query log-likelihood             — reference models/upr.py:153-169
* MxBai v2 pos/neg logit difference    — reference models/mxbai_v2.py:355-356
* MxBai v2 chat-template assembly      — reference models/mxbai_v2.py:186-320
  (pre-tokenized segments, 3/4-query / 1/4-doc budgets, only-second pair
  truncation, left multiple-of-8 padding)
* PyLate score normalization           — reference models/pylate_ranker.py:63-68

The torch-gated pandas-UDF factories in rerank/ranker.py wrap these; the
heavy lifting (tokenize + forward pass) stays in the model library, the
score semantics live here where they can be asserted.
"""

from __future__ import annotations

import math
import warnings
from typing import List, Sequence, Tuple, Union

import numpy as np

# Model → [false_token, true_token] (reference models/t5ranker.py:30-62;
# entries are SentencePiece tokens except TWOLAR's raw ids).
PREDICTION_TOKENS: dict[str, List[Union[str, int]]] = {
    "default": ["▁false", "▁true"],
    "castorini/monot5-base-msmarco": ["▁false", "▁true"],
    "castorini/monot5-base-msmarco-10k": ["▁false", "▁true"],
    "castorini/monot5-large-msmarco": ["▁false", "▁true"],
    "castorini/monot5-large-msmarco-10k": ["▁false", "▁true"],
    "castorini/monot5-base-med-msmarco": ["▁false", "▁true"],
    "castorini/monot5-3b-med-msmarco": ["▁false", "▁true"],
    "castorini/monot5-3b-msmarco-10k": ["▁false", "▁true"],
    "unicamp-dl/InRanker-small": ["▁false", "▁true"],
    "unicamp-dl/InRanker-base": ["▁false", "▁true"],
    "unicamp-dl/InRanker-3B": ["▁false", "▁true"],
    "unicamp-dl/mt5-base-en-msmarco": ["▁no", "▁yes"],
    "unicamp-dl/ptt5-base-pt-msmarco-10k-v2": ["▁não", "▁sim"],
    "unicamp-dl/ptt5-base-pt-msmarco-100k-v2": ["▁não", "▁sim"],
    "unicamp-dl/ptt5-base-en-pt-msmarco-100k-v2": ["▁não", "▁sim"],
    "unicamp-dl/mt5-base-en-pt-msmarco-v2": ["▁no", "▁yes"],
    "unicamp-dl/mt5-base-mmarco-v2": ["▁no", "▁yes"],
    "unicamp-dl/mt5-base-en-pt-msmarco-v1": ["▁no", "▁yes"],
    "unicamp-dl/mt5-base-mmarco-v1": ["▁no", "▁yes"],
    "unicamp-dl/ptt5-base-pt-msmarco-10k-v1": ["▁não", "▁sim"],
    "unicamp-dl/ptt5-base-pt-msmarco-100k-v1": ["▁não", "▁sim"],
    "unicamp-dl/ptt5-base-en-pt-msmarco-10k-v1": ["▁não", "▁sim"],
    "unicamp-dl/mt5-3B-mmarco-en-pt": ["▁", "▁true"],
    "unicamp-dl/mt5-13b-mmarco-100k": ["▁", "▁true"],
    "unicamp-dl/monoptt5-small": ["▁Não", "▁Sim"],
    "unicamp-dl/monoptt5-base": ["▁Não", "▁Sim"],
    "unicamp-dl/monoptt5-large": ["▁Não", "▁Sim"],
    "unicamp-dl/monoptt5-3b": ["▁Não", "▁Sim"],
    "Dundalia/TWOLAR-large": [6136, 1176],
    "Dundalia/TWOLAR-xl": [6136, 1176],
}

#: prompt template for pointwise T5 (reference t5ranker.py:96)
T5_INPUTS_TEMPLATE = "Query: {query} Document: {text} Relevant:"


def get_output_tokens(
    model_name: str,
    token_false: Union[str, int] = "auto",
    token_true: Union[str, int] = "auto",
) -> Tuple[Union[str, int], Union[str, int]]:
    """Resolve the (false, true) output tokens for a T5 checkpoint
    (reference t5ranker.py:64-82: 'auto' looks up PREDICTION_TOKENS,
    unknown models warn and fall back to the default pair)."""
    if token_false == "auto":
        if model_name in PREDICTION_TOKENS:
            token_false = PREDICTION_TOKENS[model_name][0]
        else:
            token_false = PREDICTION_TOKENS["default"][0]
            warnings.warn(
                f"Model {model_name} does not have known True/False tokens;"
                f" defaulting token_false to {token_false!r}"
            )
    if token_true == "auto":
        if model_name in PREDICTION_TOKENS:
            token_true = PREDICTION_TOKENS[model_name][1]
        else:
            token_true = PREDICTION_TOKENS["default"][1]
            warnings.warn(
                f"Model {model_name} does not have known True/False tokens;"
                f" defaulting token_true to {token_true!r}"
            )
    return token_false, token_true


def t5_scores(
    false_logits: np.ndarray,
    true_logits: np.ndarray,
    return_logits: bool = False,
) -> np.ndarray:
    """Pointwise T5 relevance from the decoder's first-step logits at the
    [false, true] token ids: softmax over the PAIR, probability of true
    (reference t5ranker.py:239-246). return_logits=True returns the raw
    true-token logit instead (t5ranker.py:242-243)."""
    f = np.asarray(false_logits, dtype=np.float64)
    t = np.asarray(true_logits, dtype=np.float64)
    if return_logits:
        return t
    # log_softmax over [f, t] then exp of the true column == sigmoid(t-f)
    m = np.maximum(f, t)
    log_z = m + np.log(np.exp(f - m) + np.exp(t - m))
    return np.exp(t - log_z)


def colbert_maxsim(
    q_reps: np.ndarray,
    p_reps: np.ndarray,
    q_mask: np.ndarray,
    p_mask: np.ndarray,
) -> np.ndarray:
    """Late-interaction MaxSim (reference _colbert_score,
    colbert_ranker.py:71-84): token_scores = einsum('qin,pjn->qipj'),
    padded DOC tokens masked to -1e4, max over doc tokens, sum over query
    tokens, normalized by the real query length. Query positions are NOT
    masked in the sum — ColBERT's query augmentation (MASK padding)
    contributes deliberately, matching the reference bit for bit.

    q_reps (Q, i, n), p_reps (P, j, n), q_mask (Q, i), p_mask (P, j)
    → scores (Q, P) float64.
    """
    q_reps = np.asarray(q_reps, dtype=np.float64)
    p_reps = np.asarray(p_reps, dtype=np.float64)
    q_mask = np.asarray(q_mask)
    p_mask = np.asarray(p_mask)
    if q_reps.shape[1] < q_mask.shape[1]:
        raise ValueError(
            f"q_reps should have at least {q_mask.shape[1]} tokens, "
            f"but has {q_reps.shape[1]}"
        )
    token_scores = np.einsum("qin,pjn->qipj", q_reps, p_reps)
    token_scores = np.where(
        (p_mask == 0)[None, None, :, :], -1e4, token_scores
    )
    scores = token_scores.max(axis=-1)  # (Q, i, P)
    return scores.sum(axis=1) / q_mask.sum(axis=-1, keepdims=True)


def colbert_query_length(original_length: int, multiple: int = 32) -> int:
    """Dynamic QLEN for query augmentation (reference
    colbert_ranker.py:150-156 with multiple=32 inside ColBERTModel,
    :352-357 with multiple=16 inside ColBERTRanker): short remainders
    extend by 8, otherwise round up to the next multiple."""
    if original_length % multiple <= 8:
        return original_length + 8
    return math.ceil(original_length / multiple) * multiple


def colbert_doc_max_length(
    tokenized_doc_lengths: Sequence[int],
    query_max_length: int = 32,
    doc_max_length: int = 512,
) -> int:
    """Dynamic per-batch document encode length (reference
    colbert_ranker.py:310-324): longest doc rounded up to a multiple of
    32, clamped to [query_max_length, doc_max_length]."""
    max_length = max(tokenized_doc_lengths)
    max_length = math.ceil(max_length / 32) * 32
    max_length = max(max_length, query_max_length)
    return int(min(max_length, doc_max_length))


def layerwise_scores(per_layer_scores: Sequence[np.ndarray]) -> np.ndarray:
    """Layerwise-LLM extraction (reference llm_layerwise_ranker.py:168-177):
    each cutoff layer contributes (batch, seq) scores; take the LAST
    token of the LAST requested layer."""
    last = np.asarray(per_layer_scores[-1], dtype=np.float64)
    return last[:, -1].reshape(-1)


def upr_scores(token_log_probs: np.ndarray) -> np.ndarray:
    """UPR query log-likelihood (reference upr.py:153-169): score =
    -sum(NLL over query tokens) = sum of per-token gold log-probs; the
    best document minimizes the query's negative log-likelihood."""
    tlp = np.asarray(token_log_probs, dtype=np.float64)
    return tlp.sum(axis=1)


# MonoVLM prompt + output-token contract (reference
# monovlm_ranker.py:13-16, 50, 108-110 — the strings ARE the checkpoint
# contract, kept verbatim).
MONOVLM_PROMPT_TEMPLATE = (
    "Assert the relevance of the previous image document to the "
    "following query, answer True or False. The query is: {query}"
)

MONOVLM_PREDICTION_TOKENS: dict[str, List[str]] = {
    "default": ["False", "True"],
    "lightonai/MonoQwen2-VL-v0.1": ["False", "True"],
}


def monovlm_output_tokens(
    model_name: str,
    token_false: str = "auto",
    token_true: str = "auto",
) -> Tuple[str, str]:
    """Resolve the (False, True) answer tokens for a MonoVLM checkpoint
    (reference monovlm_ranker.py:18-36: 'auto' looks up
    MONOVLM_PREDICTION_TOKENS, unknown models warn and fall back)."""
    if token_false == "auto":
        if model_name in MONOVLM_PREDICTION_TOKENS:
            token_false = MONOVLM_PREDICTION_TOKENS[model_name][0]
        else:
            token_false = MONOVLM_PREDICTION_TOKENS["default"][0]
            warnings.warn(
                f"Model {model_name} does not have known True/False "
                f"tokens; defaulting token_false to {token_false!r}"
            )
    if token_true == "auto":
        if model_name in MONOVLM_PREDICTION_TOKENS:
            token_true = MONOVLM_PREDICTION_TOKENS[model_name][1]
        else:
            token_true = MONOVLM_PREDICTION_TOKENS["default"][1]
            warnings.warn(
                f"Model {model_name} does not have known True/False "
                f"tokens; defaulting token_true to {token_true!r}"
            )
    return token_false, token_true


def monovlm_scores(
    false_logits: np.ndarray,
    true_logits: np.ndarray,
    return_logits: bool = False,
) -> np.ndarray:
    """MonoVLM relevance from the last-position logits at the
    [False, True] token ids: softmax over the PAIR, probability of True
    (reference monovlm_ranker.py:131-140); return_logits=True returns
    the raw True logit (monovlm_ranker.py:136-137). Same pair-softmax
    identity as :func:`t5_scores`, kept separate because each cites its
    own reference contract."""
    return t5_scores(false_logits, true_logits, return_logits)


def mxbai_v2_scores(
    last_position_logits: np.ndarray, pos_id: int, neg_id: int
) -> np.ndarray:
    """MxBai v2 score (reference mxbai_v2.py:355-356): logit difference
    between the positive and negative answer tokens at the final
    position. last_position_logits: (batch, vocab)."""
    lg = np.asarray(last_position_logits, dtype=np.float64)
    return lg[:, pos_id] - lg[:, neg_id]


# -- prompt / input-id assembly (tokenizer-injected pure functions) ----------
#
# The functions below are the PORTABLE halves of the LLM rankers' input
# preparation: every decision is token-id list arithmetic, with the
# tokenizer injected as ``tok(text, max_length=None) -> list[int]``
# (no special tokens; truncate when max_length is given) — so the exact
# reference layout (segment order, 3/4-1/4 budgets, only-second pair
# truncation, multiple-of-8 padding) is unit-testable without a model.

# MxBai v2 prompt contract (reference mxbai_v2.py:22-84 — the 'default'
# entries; per-checkpoint entries are identical for both released models).
# These strings ARE the checkpoint contract, kept verbatim.
MXBAI_V2_TEMPLATES: dict[str, object] = {
    "sep": "\n",
    "instruction_prompt": "instruction: {instruction}",
    "query_prompt": "query: {query}",
    "doc_prompt": "document: {document}",
    "task_prompt": (
        "You are a search relevance expert who evaluates how well "
        "documents match search queries. For each query-document pair, "
        "carefully analyze the semantic relationship between them, then "
        "provide your binary relevance judgment (0 for not relevant, 1 "
        "for relevant).\nRelevance:"
    ),
    "chat_prefix": (
        "<|im_start|>system\nYou are Qwen, created by Alibaba Cloud. You "
        "are a helpful assistant.<|im_end|>\n<|im_start|>user\n"
    ),
    "chat_suffix": "<|im_end|>\n<|im_start|>assistant\n",
    "pos_token": "1",
    "neg_token": "0",
}

# Layerwise-LLM prompt/params contract (reference
# llm_layerwise_ranker.py:10-26), verbatim.
LAYERWISE_PROMPT = (
    "Given a query A and a passage B, determine whether the passage "
    "contains an answer to the query by providing a prediction of "
    "either 'Yes' or 'No'."
)
LAYERWISE_DEFAULT_PARAMS: dict[str, dict] = {
    "default": {},
    "BAAI/bge-multilingual-gemma2": {},
    "BAAI/bge-reranker-v2-gemma": {},
    "BAAI/bge-reranker-v2-minicpm-layerwise": {"cutoff_layers": [28]},
    "BAAI/bge-reranker-v2.5-gemma2-lightweight": {
        "cutoff_layers": [28],
        "compress_ratio": 2,
        "compress_layer": [24, 40],
    },
}


def ensure_multiple_of_8(x: int, max_value: int | None = None) -> int:
    """Round DOWN to a multiple of 8, clamped to max_value first
    (reference mxbai_v2.py:87-92 _ensure_multiple_of_8)."""
    if max_value is not None:
        max_value = max_value - max_value % 8
        x = min(x, max_value)
    return x - x % 8


def pair_truncate_second(
    first_ids: Sequence[int], second_ids: Sequence[int], max_length: int
) -> List[int]:
    """``tokenizer.prepare_for_model(first, second,
    truncation='only_second', add_special_tokens=False)``: concatenate,
    truncating ONLY the second segment (from its end) to fit
    max_length. The first segment is never cut (both reference callers
    pre-truncate it to the 3/4 budget)."""
    first_ids = list(first_ids)
    second_ids = list(second_ids)
    overflow = len(first_ids) + len(second_ids) - max_length
    if overflow > 0:
        keep = max(0, len(second_ids) - overflow)
        second_ids = second_ids[:keep]
    return first_ids + second_ids


def pad_token_batch(
    seqs: Sequence[Sequence[int]],
    pad_id: int,
    padding_side: str = "left",
    pad_to_multiple_of: int = 8,
    max_length: int | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """``tokenizer.pad(padding='longest', pad_to_multiple_of=8)``:
    (input_ids, attention_mask) int64 arrays padded to the longest
    sequence rounded UP to a multiple of 8 (capped at max_length when
    given — HF semantics: the multiple-of-8 round-up applies to the
    longest length; max_length only caps when shorter would violate it).
    padding_side: 'left' (MxBai v2, decoder scoring at the last
    position) or 'right' (layerwise ranker)."""
    if not seqs:
        return (np.zeros((0, 0), dtype=np.int64),
                np.zeros((0, 0), dtype=np.int64))
    longest = max(len(s) for s in seqs)
    target = longest
    if pad_to_multiple_of and target % pad_to_multiple_of:
        target = ((target // pad_to_multiple_of) + 1) * pad_to_multiple_of
    if max_length is not None:
        target = max(target, 0)
    ids = np.full((len(seqs), target), pad_id, dtype=np.int64)
    mask = np.zeros((len(seqs), target), dtype=np.int64)
    for i, s in enumerate(seqs):
        n = len(s)
        if padding_side == "left":
            ids[i, target - n:] = s
            mask[i, target - n:] = 1
        else:
            ids[i, :n] = s
            mask[i, :n] = 1
    return ids, mask


def mxbai_v2_static_ids(tok, templates: dict | None = None) -> dict:
    """Pre-tokenized template segments + static length (reference
    mxbai_v2.py:186-220 _prepare_tokenized_templates)."""
    t = templates or MXBAI_V2_TEMPLATES
    prefix = tok(t["chat_prefix"], None)
    suffix = tok(t["chat_suffix"], None)
    task = tok(t["task_prompt"], None)
    sep = tok(t["sep"], None)
    return {
        "prefix_ids": prefix,
        "suffix_ids": suffix,
        "task_prompt_ids": task,
        "sep_ids": sep,
        "pos_id": tok(t["pos_token"], None)[0],
        "neg_id": tok(t["neg_token"], None)[0],
        "static_len": len(prefix) + len(task) + len(suffix) + len(sep),
    }


def mxbai_v2_effective_lengths(
    max_length: int, static_len: int, model_max_length: int
) -> Tuple[int, int]:
    """(effective_max_length, padding_length): max_length shrunk so the
    static template always fits the context window; padding_length is
    the model window rounded down to a multiple of 8 (reference
    mxbai_v2.py:211-220)."""
    eff = max_length
    if eff + static_len > model_max_length:
        eff = model_max_length - static_len
    padding_length = ensure_multiple_of_8(
        max(model_max_length, eff + static_len), max_value=model_max_length)
    return eff, padding_length


def mxbai_v2_prepare_ids(
    tok,
    query: str,
    document: str,
    instruction: str | None = None,
    max_length: int = 8192,
    model_max_length: int = 32768,
    templates: dict | None = None,
    static: dict | None = None,
) -> List[int]:
    """Full reference input assembly for ONE (query, document) pair
    (mxbai_v2.py:239-320 _prepare_batch + _create_full_input_ids):

    1. query text = query_prompt (+ optional instruction prefix),
       tokenized under a 3/4 budget of the effective max_length;
    2. doc budget = min(window - query - static, max_length // 4);
    3. pair-combined with only-second truncation at max_length;
    4. wrapped prefix + content + sep + task + suffix.

    Returns the unpadded id list; batch padding is pad_token_batch
    (padding_side='left', multiple of 8, capped at the model window).
    """
    t = templates or MXBAI_V2_TEMPLATES
    s = static or mxbai_v2_static_ids(tok, t)
    eff, _ = mxbai_v2_effective_lengths(
        max_length, s["static_len"], model_max_length)

    query_text = str(t["query_prompt"]).format(query=query)
    if instruction:
        query_text = (str(t["instruction_prompt"]).format(
            instruction=instruction) + str(t["sep"]) + query_text)
    query_ids = tok(query_text, eff * 3 // 4)

    available = model_max_length - len(query_ids) - s["static_len"]
    doc_budget = min(available, eff // 4)
    doc_ids = tok(str(t["doc_prompt"]).format(document=document),
                  doc_budget)

    content = pair_truncate_second(
        query_ids, list(s["sep_ids"]) + list(doc_ids), eff)
    return (list(s["prefix_ids"]) + content + list(s["sep_ids"])
            + list(s["task_prompt_ids"]) + list(s["suffix_ids"]))


def layerwise_prepare_ids(
    tok,
    query: str,
    passage: str,
    bos_id: int,
    max_sequence_length: int = 512,
    prompt: str = LAYERWISE_PROMPT,
) -> List[int]:
    """Layerwise-LLM input assembly for ONE pair (reference
    llm_layerwise_ranker.py:91-137 _get_inputs): 'A: {query}' under a
    3/4 budget with a leading BOS, '\\n' separator, 'B: {passage}'
    with only-second truncation at max_sequence_length, then the
    trailing '\\n' + prompt. Batch padding: pad_token_batch
    (padding_side='right', multiple of 8, max_length =
    max_sequence_length + len(sep) + len(prompt))."""
    prompt_ids = tok(prompt, None)
    sep_ids = tok("\n", None)
    q_ids = tok(f"A: {query}", max_sequence_length * 3 // 4)
    p_ids = tok(f"B: {passage}", max_sequence_length)
    item = pair_truncate_second(
        [bos_id] + list(q_ids), list(sep_ids) + list(p_ids),
        max_sequence_length)
    return item + list(sep_ids) + list(prompt_ids)


def pylate_normalize(scores, query_token_count: int) -> np.ndarray:
    """PyLate score normalization (reference pylate_ranker.py:63-68):
    rank.rerank's raw MaxSim sums divided by the query token count."""
    return np.asarray(scores, dtype=np.float64) / float(query_token_count)
