"""Single-node pure-Python/numpy BM25 oracle (SURVEY.md §5.2).

This is "the reference" the north rule demands rank-identity with: same
frozen tokenizer and BM25 spec (FIXTURES.md §4), implemented with plain
dicts + math so it shares no code path with the Spark engine.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Sequence, Tuple

from rerankers_spark.functions.tokenize import tokenize_py

K1 = 1.2
B = 0.75


class BM25Oracle:
    def __init__(self, doc_ids: Sequence[int], contents: Sequence[str]):
        assert len(doc_ids) == len(contents)
        self.doc_ids = list(doc_ids)
        self.tfs: List[Dict[str, int]] = []
        self.dls: List[int] = []
        self.df: Counter = Counter()
        for content in contents:
            toks = tokenize_py(content)
            tf = Counter(toks)
            self.tfs.append(dict(tf))
            self.dls.append(len(toks))
            for t in tf:
                self.df[t] += 1
        self.n = len(self.doc_ids)
        self.avgdl = (sum(self.dls) / self.n) if self.n else 0.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        if df == 0:
            return 0.0
        return math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))

    def score_doc(self, i: int, q_terms: Sequence[str]) -> float:
        s = 0.0
        dl = self.dls[i]
        for t in q_terms:
            tf = self.tfs[i].get(t, 0)
            if tf == 0:
                continue
            sat = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
            s += self.idf(t) * sat
        return s

    def topk(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        """[(doc_id, score)] — only docs matching >=1 term; tie-break
        (score desc, doc_id asc); unique query terms in query order."""
        q_terms = list(dict.fromkeys(tokenize_py(query)))
        hits = []
        for i, doc_id in enumerate(self.doc_ids):
            if not any(t in self.tfs[i] for t in q_terms):
                continue
            hits.append((doc_id, self.score_doc(i, q_terms)))
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:k]
