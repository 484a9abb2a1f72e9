"""Pure-python reference engine for rank-identity tests.

Mirrors the reference scoring semantics exactly (SURVEY §2.5/§7.4):
- per-split BM25 statistics (each split is its own index; scores merge by
  value across splits, never with global stats),
- k1=1.2, b=0.75, idf = ln(1 + (N - df + 0.5) / (df + 0.5)),
- |d| = SmallFloat-dequantized doc length (fieldnorm quantization),
- avgdl = exact total_tokens / num_docs per split,
- tie-break: (score desc, split_id asc, docid asc)
  (quickwit-search/src/lib.rs:101-106, search_api.proto:207-218).

Used only by pytest — never by the engine itself.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from quickwit_spark import BM25_B, BM25_K1
from quickwit_spark.functions.fieldnorm import quantize_len
from quickwit_spark.functions.tokenize import tokenize_py


@dataclass
class OracleSplit:
    split_id: str
    docs: dict[int, list[str]] = field(default_factory=dict)  # docid -> tokens
    tf: dict[str, dict[int, int]] = field(default_factory=dict)
    num_docs: int = 0
    total_tokens: int = 0

    @property
    def avgdl(self) -> float:
        return self.total_tokens / self.num_docs if self.num_docs else 0.0


class OracleIndex:
    def __init__(self, quantize: bool = True):
        self.splits: dict[str, OracleSplit] = {}
        self.quantize = quantize

    def add(self, split_id: str, docid: int, text: str) -> None:
        sp = self.splits.setdefault(split_id, OracleSplit(split_id))
        toks = tokenize_py(text)
        sp.docs[docid] = toks
        sp.num_docs += 1
        sp.total_tokens += len(toks)
        for t, c in Counter(toks).items():
            sp.tf.setdefault(t, {})[docid] = c

    def _dl(self, sp: OracleSplit, docid: int) -> float:
        n = len(sp.docs[docid])
        return float(quantize_len(n)) if self.quantize else float(n)

    def term_scores(self, sp: OracleSplit, term: str) -> dict[int, float]:
        postings = sp.tf.get(term, {})
        df = len(postings)
        if df == 0:
            return {}
        idf = math.log(1.0 + (sp.num_docs - df + 0.5) / (df + 0.5))
        out = {}
        for docid, tf in postings.items():
            dl = self._dl(sp, docid)
            tf_norm = (
                tf
                * (BM25_K1 + 1.0)
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / sp.avgdl))
            )
            out[docid] = idf * tf_norm
        return out

    def search(
        self,
        terms: list[str],
        mode: str = "and",
        k: int = 10,
        exclude_terms: list[str] | None = None,
    ) -> list[tuple[str, int, float]]:
        """-> [(split_id, docid, score)] with the reference tie-break."""
        hits: list[tuple[str, int, float]] = []
        for sid in self.splits:
            sp = self.splits[sid]
            per_term = [self.term_scores(sp, t) for t in terms]
            if mode == "and":
                if not per_term or any(not p for p in per_term):
                    docids: set[int] = set()
                else:
                    docids = set.intersection(*(set(p) for p in per_term))
            else:
                docids = set().union(*(set(p) for p in per_term)) if per_term else set()
            if exclude_terms:
                for t in exclude_terms:
                    docids -= set(sp.tf.get(t, {}))
            for d in docids:
                score = sum(p.get(d, 0.0) for p in per_term)
                hits.append((sid, d, score))
        hits.sort(key=lambda h: (-h[2], h[0], h[1]))
        return hits[:k]
