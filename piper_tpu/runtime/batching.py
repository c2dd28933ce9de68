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
