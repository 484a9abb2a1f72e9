"""Merge policies: pure metadata planners over SplitMetadata rows.

Semantics follow the reference policies (behavior, not code):

- **StableLogMergePolicy** — quickwit-indexing/src/merge_policy/
  stable_log_merge_policy.rs: splits sorted by reverse time-end (ties:
  num_docs asc, split_id asc — the determinism contract at :173-186), grouped
  into exponential levels (level 0 holds up to ``max(3 * first_split_docs,
  min_level_num_docs)`` docs, each next level 3x — :224-252), and within each
  level (scanned smallest-level first, i.e. reverse level order) the policy
  takes the longest suffix of the level that is not "one more split would be
  too big": >= merge_factor splits, <= max_merge_factor, stop growing once the
  merged doc count reaches split_num_docs_target (:254-303).
- **ConstWriteAmplificationMergePolicy** — merge_policy/
  const_write_amplification.rs:50-170: only splits sharing the same
  ``num_merge_ops`` merge together (capping write amplification at
  max_merge_ops); within a level, sort by (create_timestamp, split_id) and
  greedily chunk.

Maturity (a split that will never merge again): ``num_docs >=
split_num_docs_target`` or ``age > maturation_period`` (stable_log :120-131).

Defaults from quickwit-config/src/merge_policy_config.rs:80-109 and
index_config/mod.rs:168-170 (10M-doc split target).

This is driver-side logic on purpose: like the reference's MergePlanner actor,
it consumes only manifest rows (thousands, not billions) — the cluster is
involved only in executing the planned operations (operators/merge.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from quickwit_spark.index.manifest import SplitMetadata

DEFAULT_SPLIT_NUM_DOCS_TARGET = 10_000_000  # index_config/mod.rs:168-170


@dataclass
class StableLogConfig:
    merge_factor: int = 10
    max_merge_factor: int = 12
    min_level_num_docs: int = 100_000
    maturation_period_s: float = 48 * 3600.0


@dataclass
class ConstWriteAmplificationConfig:
    merge_factor: int = 10
    max_merge_factor: int = 12
    max_merge_ops: int = 4
    maturation_period_s: float = 48 * 3600.0


@dataclass
class MergeOperation:
    """One planned merge: the splits to be replaced by a single new split."""

    splits: list[SplitMetadata] = field(default_factory=list)

    @property
    def num_docs(self) -> int:
        return sum(s.num_docs for s in self.splits)

    @property
    def split_ids(self) -> list[str]:
        return [s.split_id for s in self.splits]


def _reverse_time_end_key(s: SplitMetadata):
    """Total order: reverse time-end, then num_docs, then split_id.

    In the reference, splits without a time range sort *after* all splits with
    one (Option ordering reversed). We encode that with a leading group flag.
    """
    if s.time_range_end is None:
        return (1, "", s.num_docs, s.split_id)
    # isoformat strings compare chronologically; invert via a group trick:
    # sort key uses negative epoch-free approach — use tuple with reversed
    # lexicographic ordering emulated by sorting on the string descending.
    return (0, s.time_range_end, s.num_docs, s.split_id)


def _sort_by_reverse_time_end(splits: list[SplitMetadata]) -> list[SplitMetadata]:
    with_ts = [s for s in splits if s.time_range_end is not None]
    without = [s for s in splits if s.time_range_end is None]
    # descending time-end; ties ascending (num_docs, split_id). Two-pass
    # stable sort keeps the semantics without needing a negatable time key.
    with_ts.sort(key=lambda s: (s.num_docs, s.split_id))
    with_ts.sort(key=lambda s: s.time_range_end, reverse=True)
    without.sort(key=lambda s: (s.num_docs, s.split_id))
    return with_ts + without


class StableLogMergePolicy:
    def __init__(
        self,
        config: StableLogConfig | None = None,
        split_num_docs_target: int = DEFAULT_SPLIT_NUM_DOCS_TARGET,
    ):
        self.config = config or StableLogConfig()
        self.split_num_docs_target = split_num_docs_target

    # -- maturity (stable_log_merge_policy.rs:120-131) ---------------------
    def is_mature(self, split: SplitMetadata, now: float | None = None) -> bool:
        if split.num_docs >= self.split_num_docs_target:
            return True
        now = time.time() if now is None else now
        return now >= split.create_timestamp + self.config.maturation_period_s

    # -- planning ----------------------------------------------------------
    def operations(
        self, splits: list[SplitMetadata], now: float | None = None
    ) -> tuple[list[MergeOperation], list[SplitMetadata]]:
        """Plan merges. Returns (operations, splits left untouched).

        Invariant (checked by the reference's debug_assert): every input
        split appears exactly once — either inside one operation or in the
        leftover list.
        """
        if len(splits) < 2:
            return [], list(splits)
        mature = [s for s in splits if self.is_mature(s, now)]
        young = _sort_by_reverse_time_end(
            [s for s in splits if not self.is_mature(s, now)]
        )
        ops: list[MergeOperation] = []
        levels = self._build_split_levels(young)
        # smallest-split levels first (reverse level order); deleting a slice
        # at [start, end) never disturbs earlier levels' indices.
        for start, end in reversed(levels):
            rng = self._merge_candidate_from_level(young, start, end)
            if rng is None:
                continue
            a, b = rng
            ops.append(MergeOperation(splits=young[a:b]))
            del young[a:b]
        return ops, young + mature

    def _build_split_levels(
        self, splits: list[SplitMetadata]
    ) -> list[tuple[int, int]]:
        assert all(s.num_docs < self.split_num_docs_target for s in splits)
        if not splits:
            return []
        levels: list[tuple[int, int]] = []
        level_start = 0
        level_max_docs = max(
            splits[0].num_docs * 3, self.config.min_level_num_docs
        )
        for ord_, split in enumerate(splits):
            if split.num_docs >= level_max_docs:
                levels.append((level_start, ord_))
                level_start = ord_
                level_max_docs = 3 * split.num_docs
        levels.append((level_start, len(splits)))
        return levels

    def _merge_candidate_from_level(
        self, splits: list[SplitMetadata], start: int, end: int
    ) -> tuple[int, int] | None:
        cand_start = end
        for ord_ in range(end - 1, start - 1, -1):
            if self._candidate_size(splits, cand_start, end) == "too_big":
                break
            cand_start = ord_
        if self._candidate_size(splits, cand_start, end) == "too_small":
            return None
        return (cand_start, end)

    def _candidate_size(
        self, splits: list[SplitMetadata], start: int, end: int
    ) -> str:
        n = end - start
        if n <= 1:
            return "too_small"
        if n >= self.config.max_merge_factor:
            return "too_big"
        if sum(s.num_docs for s in splits[start:end]) >= self.split_num_docs_target:
            return "too_big"
        if n < self.config.merge_factor:
            return "too_small"
        return "valid"


class ConstWriteAmplificationMergePolicy:
    """Alternative planner bounding write amplification: merge only splits
    with equal ``num_merge_ops``, never beyond ``max_merge_ops`` merges."""

    def __init__(
        self,
        config: ConstWriteAmplificationConfig | None = None,
        split_num_docs_target: int = DEFAULT_SPLIT_NUM_DOCS_TARGET,
    ):
        self.config = config or ConstWriteAmplificationConfig()
        self.split_num_docs_target = split_num_docs_target

    def is_mature(self, split: SplitMetadata, now: float | None = None) -> bool:
        if split.num_docs >= self.split_num_docs_target:
            return True
        if split.num_merge_ops >= self.config.max_merge_ops:
            return True
        now = time.time() if now is None else now
        return now >= split.create_timestamp + self.config.maturation_period_s

    def operations(
        self, splits: list[SplitMetadata], now: float | None = None
    ) -> tuple[list[MergeOperation], list[SplitMetadata]]:
        mature = [s for s in splits if self.is_mature(s, now)]
        young = [s for s in splits if not self.is_mature(s, now)]
        by_ops: dict[int, list[SplitMetadata]] = {}
        for s in young:
            by_ops.setdefault(s.num_merge_ops, []).append(s)
        ops: list[MergeOperation] = []
        leftover: list[SplitMetadata] = list(mature)
        for level in sorted(by_ops):
            group = sorted(
                by_ops[level], key=lambda s: (s.create_timestamp, s.split_id)
            )
            while True:
                op = self._one_op(group)
                if op is None:
                    break
                ops.append(op)
            leftover.extend(group)
        return ops, leftover

    def _one_op(self, group: list[SplitMetadata]) -> MergeOperation | None:
        n_docs = 0
        n_splits = 0
        for s in group[: self.config.max_merge_factor]:
            n_docs += s.num_docs
            n_splits += 1
            if n_docs >= self.split_num_docs_target:
                break
        if n_docs < self.split_num_docs_target and n_splits < self.config.merge_factor:
            return None
        taken = group[:n_splits]
        del group[:n_splits]
        return MergeOperation(splits=taken)


# -- merged-split attribute algebra (merge_executor.rs:195-258) -------------

_U64 = (1 << 64) - 1


def combine_two_hashes(lhs: int, rhs: int) -> int:
    """Boost hash_combine over u64 (merge_executor.rs:201-208)."""
    update = (rhs + 0x9E3779B9 + ((lhs << 6) & _U64) + (lhs >> 2)) & _U64
    return lhs ^ update


def combine_partition_ids(partition_ids: list[int]) -> int:
    """Fold sorted-unique partition ids with hash_combine; result masked into
    the non-negative int64 domain (Spark LongType has no u64 — SURVEY §7.4)."""
    uniq = sorted({p & _U64 for p in partition_ids})
    if not uniq:
        return 0
    acc = uniq[0]
    for p in uniq[1:]:
        acc = combine_two_hashes(acc, p)
    return acc & 0x7FFFFFFFFFFFFFFF
