"""Differential fuzz: batched ``search_many`` vs per-request ``search()``.

``search_many`` re-plans every request under a shared ``query_id`` lane and
ranks with one window pass instead of per-request TakeOrdered heaps — this
battery pins that the two code paths stay hit-for-hit identical (docids,
scores, order) across random query strings (the grammar generator from
``test_fuzz_differential``), offsets, ts-sort in both orders, and time
windows, batched in random groups. ``search()`` itself is differentially
fuzzed against the pure-python oracle elsewhere, so identity to it is
end-to-end correctness for the batch path.
"""

from __future__ import annotations

import random

import pytest

from quickwit_spark.operators.search import SearchRequest, search, search_many
from tests.test_fuzz_differential import Vocab, build_oracle, gen_query


@pytest.fixture(scope="module")
def vocab(small_index):
    return Vocab(build_oracle(small_index))


def _gen_request(rng: random.Random, vocab: Vocab, all_ts) -> SearchRequest:
    q = gen_query(rng.randrange(1 << 30), vocab)
    start = end = None
    if rng.random() < 0.3 and all_ts:
        i = rng.randrange(len(all_ts) // 2)
        j = rng.randrange(len(all_ts) // 2, len(all_ts))
        if rng.random() < 0.8:
            start = all_ts[i].isoformat()
        if rng.random() < 0.8:
            end = all_ts[j].isoformat()
    sort_by = "ts" if rng.random() < 0.3 else None
    return SearchRequest(
        query=q,
        max_hits=rng.choice([5, 10, 25]),
        start_offset=rng.choice([0, 0, 0, 3, 11]),
        sort_by_field=sort_by,
        sort_order=rng.choice(["asc", "desc"]) if sort_by else "desc",
        start_timestamp=start,
        end_timestamp=end,
        search_fields=("text",),
    )


@pytest.mark.parametrize("seed", range(10))
def test_search_many_fuzz_matches_search(small_index, vocab, seed):
    rng = random.Random(9000 + seed)
    all_ts = sorted(
        r["ts"] for r in small_index.docstore().select("ts").collect()
    )
    reqs = {
        f"q{i}": _gen_request(rng, vocab, all_ts)
        for i in range(rng.choice([2, 4, 6]))
    }
    batched = search_many(
        small_index, reqs, quantize_norms=True, fetch_fields=("url",)
    )
    got: dict[str, list] = {qid: [] for qid in reqs}
    for row in batched.collect():
        got[row["query_id"]].append(
            (row["split_id"], row["docid"], row["score"], row["url"])
        )
    for qid, req in reqs.items():
        want = [
            (r["split_id"], r["docid"], r["score"], r["url"])
            for r in search(
                small_index, req, quantize_norms=True, fetch_fields=("url",)
            ).collect()
        ]
        assert got[qid] == want, (qid, req.query, req)
