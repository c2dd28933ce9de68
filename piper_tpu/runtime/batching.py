"""Length bucketing for static-shape jit caches.

XLA compiles one executable per input shape; bucketing phoneme and
frame lengths to a small geometric ladder bounds compilations while
keeping padding waste low (SURVEY.md §7 step 4). The reference has no
batching at all (batch=1 serial loop, piper.cpp:484); this is where
the TPU build departs structurally.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple


def bucket_ladder(min_size: int, max_size: int, growth: float = 1.5) -> List[int]:
    """Geometric ladder of bucket sizes, multiples of 16 (sublane-friendly)."""
    sizes = []
    s = float(min_size)
    while True:
        size = min(int(-(-s // 16) * 16), max_size)
        if not sizes or size > sizes[-1]:
            sizes.append(size)
        if size >= max_size:
            break
        s *= growth
    return sizes


DEFAULT_PHONEME_BUCKETS = bucket_ladder(32, 512)
DEFAULT_FRAME_BUCKETS = bucket_ladder(128, 4096)


def pick_bucket(length: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if length <= b:
            return b
    raise ValueError(
        f"length {length} exceeds the largest bucket {buckets[-1]}; "
        "split the input (sentence/phrase segmentation) or raise max bucket"
    )


def group_by_bucket(
    lengths: Sequence[int], buckets: Sequence[int]
) -> List[Tuple[int, List[int]]]:
    """Group item indices by their padded bucket size.

    Returns [(bucket_size, [indices])], preserving input order inside
    each group.
    """
    groups: dict = {}
    for i, l in enumerate(lengths):
        b = pick_bucket(l, buckets)
        groups.setdefault(b, []).append(i)
    return sorted(groups.items())


def plan_packed_groups(
    lengths: Sequence[int],
    buckets: Sequence[int],
    round_rows=lambda n: n,
    dispatch_cost: int = 512,
) -> List[Tuple[int, List[int]]]:
    """Partition rows into decode groups minimizing total padded
    compute (sum over groups of round_rows(|group|) * bucket(max)),
    plus `dispatch_cost` row-frames per group for the fixed launch
    overhead.

    Rows are sorted by length (desc); an optimal partition is then a
    set of contiguous segments of that order (any group's cost is set
    by its longest row, so swapping a longer row into a later group
    never helps) — found by an O(n^2) DP. `round_rows` mirrors the
    caller's jit row-count rounding (e.g. next power of two) so the
    cost model prices exactly what the device will execute, and every
    group lands on a (rounded rows x bucket) shape the warmup already
    compiled.

    Against one-bucket-per-batch ("uniform") this removes the
    short-rows-decoded-at-the-longest-row's-bucket waste (measured
    2.2x padded-vs-true frames on the bench batch); against plain
    per-bucket grouping ("bucketed") it merges small neighbor groups
    when the row-count rounding or dispatch cost makes a shared,
    taller decode cheaper. Returns [(bucket, [original indices])].
    """
    n = len(lengths)
    if n == 0:
        return []
    order = sorted(range(n), key=lambda i: (-int(lengths[i]), i))
    inf = float("inf")
    best = [0.0] + [inf] * n
    cut = [0] * (n + 1)
    for j in range(1, n + 1):
        for i in range(j):
            b = pick_bucket(int(lengths[order[i]]), buckets)
            c = best[i] + round_rows(j - i) * b + dispatch_cost
            if c < best[j]:
                best[j] = c
                cut[j] = i
    segs = []
    j = n
    while j > 0:
        i = cut[j]
        segs.append((i, j))
        j = i
    return [
        (pick_bucket(int(lengths[order[i]]), buckets), order[i:j])
        for i, j in reversed(segs)
    ]
