"""Phrase-frequency kernel shared by the engine, the pure-python oracle and
the DuckDB oracle SQL generators.

Semantics (documented contract of this engine, mirroring tantivy's ordered
phrase matching — quickwit docs/reference/query-language.md:55-61; tantivy
PhraseQuery counts phrase occurrences and scores them like a term with
tf = phrase frequency):

A phrase ``t_1 .. t_n`` with slop ``s`` matches at a position ``p`` of ``t_1``
iff choosing each subsequent ``q_i`` as the SMALLEST position of ``t_i``
greater than ``q_{i-1}`` (``q_1 = p``) succeeds for all terms and the total
stretch ``q_n - p - (n - 1) <= s``. Greedy-minimal ``q_i`` minimizes ``q_n``,
so this is exactly "some ordered occurrence within slop". ``phrase_freq`` =
number of matching start positions; slop 0 degenerates to exact adjacency
(the shifted-intersection count).
"""

from __future__ import annotations

import numpy as np


def phrase_freq(
    tokens: list[str],
    positions_by_term: dict[str, np.ndarray],
    slop: int = 0,
) -> int:
    """Number of phrase matches in one document.

    ``positions_by_term`` maps each distinct token to its ascending position
    array; a missing/empty entry means the doc cannot match.
    """
    lists = []
    for t in tokens:
        arr = positions_by_term.get(t)
        if arr is None or len(arr) == 0:
            return 0
        lists.append(np.asarray(arr, dtype=np.int64))
    n = len(tokens)
    if n == 1:
        return int(len(lists[0]))
    count = 0
    for p in lists[0]:
        prev = int(p)
        ok = True
        for arr in lists[1:]:
            j = int(np.searchsorted(arr, prev + 1))
            if j == len(arr):
                ok = False
                break
            prev = int(arr[j])
        if ok and prev - int(p) - (n - 1) <= slop:
            count += 1
    return count


def positions_of(tokens: list[str]) -> dict[str, np.ndarray]:
    """Token list -> {term: ascending positions} (test/oracle helper)."""
    out: dict[str, list[int]] = {}
    for i, t in enumerate(tokens):
        out.setdefault(t, []).append(i)
    return {t: np.asarray(v, dtype=np.int64) for t, v in out.items()}
