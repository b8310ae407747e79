"""Pure-numpy score-extraction math for the model-backed scorer families.

Every function here is the torch-free core of a reference ranker's scoring
step, unit-testable on synthetic tensors without model downloads:

* T5 pointwise true/false softmax      — reference models/t5ranker.py:239-246
* T5 output-token resolution table     — reference models/t5ranker.py:30-82
* ColBERT MaxSim late interaction      — reference models/colbert_ranker.py:71-84
* ColBERT dynamic-length encoding      — reference models/colbert_ranker.py:150-156,
                                         310-324, 352-357
* layerwise-LLM last-token extraction  — reference models/llm_layerwise_ranker.py:168-177
* UPR query log-likelihood             — reference models/upr.py:153-169
* MxBai v2 pos/neg logit difference    — reference models/mxbai_v2.py:355-356

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


def mxbai_v2_scores(
    last_position_logits: np.ndarray, pos_id: int, neg_id: int
) -> np.ndarray:
    """MxBai v2 score (reference mxbai_v2.py:355-356): logit difference
    between the positive and negative answer tokens at the final
    position. last_position_logits: (batch, vocab)."""
    lg = np.asarray(last_position_logits, dtype=np.float64)
    return lg[:, pos_id] - lg[:, neg_id]
