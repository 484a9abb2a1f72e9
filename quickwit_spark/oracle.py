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
    ts: dict[int, object] = field(default_factory=dict)  # docid -> datetime
    num_docs: int = 0
    total_tokens: int = 0

    @property
    def avgdl(self) -> float:
        return self.total_tokens / self.num_docs if self.num_docs else 0.0


class OracleIndex:
    def __init__(self, quantize: bool = True):
        self.splits: dict[str, OracleSplit] = {}
        self.quantize = quantize

    def add(self, split_id: str, docid: int, text: str, ts=None) -> None:
        sp = self.splits.setdefault(split_id, OracleSplit(split_id))
        toks = tokenize_py(text)
        sp.docs[docid] = toks
        if ts is not None:
            sp.ts[docid] = ts
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

    # ------------------------------------------------------------------
    # Query-AST evaluation: an independent implementation of the engine's
    # documented scoring semantics over the SAME parsed AST the engine
    # consumes, for differential fuzzing (tests/test_fuzz_differential.py).
    # Mirrors the reference semantics, not the engine code: Bool must =
    # intersection with clause scores summed, should = optional additive
    # (union when no must), must_not = filter; TermSet = per-term score sum
    # over docs containing any member; Phrase = BM25 with tf = phrase
    # frequency and idf summed over the token sequence (tantivy
    # Bm25Weight::for_terms / PhraseQuery); Boost multiplies; MatchAll and
    # pure-negative queries yield score 0.0 for every doc.
    # ------------------------------------------------------------------

    def search_query(
        self,
        query: str,
        k: int = 10,
        offset: int = 0,
        default_fields: tuple[str, ...] = ("text",),
        text_field: str = "text",
    ) -> list[tuple[str, int, float]]:
        """Parse ``query`` with the production parser and evaluate it here.

        -> [(split_id, docid, score)] with the reference tie-break
        (score desc, split_id asc, docid asc), sliced [offset, offset+k).
        """
        from quickwit_spark.plans.query import expand_default_fields, parse_query

        ast = expand_default_fields(parse_query(query), tuple(default_fields))
        hits: list[tuple[str, int, float]] = []
        for sid in self.splits:
            sp = self.splits[sid]
            for d, s in self._eval_node(sp, ast, text_field).items():
                hits.append((sid, d, s))
        hits.sort(key=lambda h: (-h[2], h[0], h[1]))
        return hits[offset : offset + k]

    def search_request(
        self,
        query: str,
        k: int = 10,
        offset: int = 0,
        sort_by_field: str | None = None,
        sort_order: str = "desc",
        start_timestamp=None,
        end_timestamp=None,
        default_fields: tuple[str, ...] = ("text",),
        text_field: str = "text",
    ) -> list[tuple[str, int, float]]:
        """Request-level mirror of ``search()``: BM25 (or fast-field sort
        value as the score, like the engine's ``cast("double")``), semi-open
        ``[start, end)`` timestamp window, asc/desc with the (split_id,
        docid) tie-break, and ``start_offset`` slicing. Timestamps are
        naive-UTC datetimes (the session timezone is pinned to UTC)."""
        from datetime import datetime

        from quickwit_spark.plans.query import expand_default_fields, parse_query

        ast = expand_default_fields(parse_query(query), tuple(default_fields))
        epoch = datetime(1970, 1, 1)
        hits: list[tuple[str, int, float]] = []
        for sid in self.splits:
            sp = self.splits[sid]
            for d, s in self._eval_node(sp, ast, text_field).items():
                t = sp.ts.get(d)
                if start_timestamp is not None and (
                    t is None or t < start_timestamp
                ):
                    continue
                if end_timestamp is not None and (
                    t is None or t >= end_timestamp
                ):
                    continue
                if sort_by_field == "ts":
                    if t is None:
                        continue
                    s = (t - epoch).total_seconds()
                elif sort_by_field not in (None, "_score"):
                    raise ValueError(f"oracle: unsupported sort {sort_by_field!r}")
                hits.append((sid, d, s))
        sign = 1.0 if sort_order == "asc" else -1.0
        hits.sort(key=lambda h: (sign * h[2], h[0], h[1]))
        return hits[offset : offset + k]

    def _eval_node(self, sp: OracleSplit, node, text_field: str) -> dict[int, float]:
        from quickwit_spark.plans.query import (
            Bool,
            Boost,
            MatchAll,
            Phrase,
            Term,
            TermSet,
        )

        if isinstance(node, MatchAll):
            return {d: 0.0 for d in sp.docs}
        if isinstance(node, Boost):
            return {
                d: s * node.factor
                for d, s in self._eval_node(sp, node.child, text_field).items()
            }
        if isinstance(node, Term):
            if node.field != text_field:
                raise ValueError(f"oracle only evaluates {text_field!r} terms")
            toks = [node.value] if node.pre_analyzed else tokenize_py(node.value)
            if not toks:
                return {}
            if len(toks) == 1:
                return dict(self.term_scores(sp, toks[0]))
            # multi-token atom: implicit AND of its pre-analyzed tokens
            return self._eval_node(
                sp,
                Bool(must=[Term(node.field, t, pre_analyzed=True) for t in toks]),
                text_field,
            )
        if isinstance(node, TermSet):
            if node.field != text_field:
                raise ValueError(f"oracle only evaluates {text_field!r} term sets")
            toks = sorted({t for v in node.values for t in tokenize_py(v)})
            out: dict[int, float] = {}
            for t in toks:
                for d, s in self.term_scores(sp, t).items():
                    out[d] = out.get(d, 0.0) + s
            return out
        if isinstance(node, Phrase):
            if node.field != text_field:
                raise ValueError(f"oracle only evaluates {text_field!r} phrases")
            return self._eval_phrase(sp, node)
        from quickwit_spark.plans.query import Range

        if isinstance(node, Range):
            # differential fuzzing evaluates ranges over doc_len only —
            # the one fast field derivable from the oracle's own state
            # (doc_len == raw token count, pinned at 1M scale in
            # tests/test_scale_fuzz.py)
            if node.field != "doc_len":
                raise ValueError("oracle ranges support only doc_len")
            lo = float(node.lo) if node.lo is not None else None
            hi = float(node.hi) if node.hi is not None else None
            out2: dict[int, float] = {}
            for d, toks in sp.docs.items():
                v = len(toks)
                if lo is not None and not (v >= lo if node.lo_inc else v > lo):
                    continue
                if hi is not None and not (v <= hi if node.hi_inc else v < hi):
                    continue
                out2[d] = 0.0
            return out2
        if isinstance(node, Bool):
            parts = [self._eval_node(sp, c, text_field) for c in node.must]
            base: dict[int, float] | None
            if parts:
                ids = set(parts[0])
                for p in parts[1:]:
                    ids &= set(p)
                base = {d: sum(p[d] for p in parts) for d in ids}
            elif node.should:
                base = None
            else:
                # pure-negative query: every doc, score 0.0, minus must_nots
                base = {d: 0.0 for d in sp.docs}
            if node.should:
                sdf: dict[int, float] = {}
                for p in (self._eval_node(sp, c, text_field) for c in node.should):
                    for d, s in p.items():
                        sdf[d] = sdf.get(d, 0.0) + s
                if base is None:
                    base = sdf
                else:
                    base = {d: s + sdf.get(d, 0.0) for d, s in base.items()}
            for c in node.must_not:
                for d in self._eval_node(sp, c, text_field):
                    base.pop(d, None)
            return base
        raise ValueError(f"oracle: unsupported node {node!r}")

    def _eval_phrase(self, sp: OracleSplit, node) -> dict[int, float]:
        from quickwit_spark.functions.phrase import phrase_freq, positions_of

        toks = tokenize_py(node.text)
        if not toks:
            return {}
        if len(toks) == 1:
            return dict(self.term_scores(sp, toks[0]))
        per_tok = [set(sp.tf.get(t, {})) for t in set(toks)]
        cand = set.intersection(*per_tok) if all(per_tok) else set()
        # idf summed over the token SEQUENCE (duplicates counted per
        # occurrence), df per split — tests/test_phrase.py::_expected_phrase
        idf_sum = sum(
            math.log(
                1.0
                + (sp.num_docs - len(sp.tf.get(t, {})) + 0.5)
                / (len(sp.tf.get(t, {})) + 0.5)
            )
            for t in toks
        )
        out: dict[int, float] = {}
        for d in cand:
            pf = phrase_freq(toks, positions_of(sp.docs[d]), node.slop)
            if pf:
                dl = self._dl(sp, d)
                tfn = (
                    pf
                    * (BM25_K1 + 1.0)
                    / (pf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / sp.avgdl))
                )
                out[d] = idf_sum * tfn
        return out
