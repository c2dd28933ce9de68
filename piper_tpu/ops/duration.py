"""Duration-aligned frame expansion as an on-device gather.

The reference builds a dense (T_frames, T_phonemes) 0/1 alignment
matrix via cumsum+mask tricks and expands the prior with a matmul
(reference: src/python/piper_train/vits/commons.py:116-129 and
models.py:711-716) — O(T_y * T_x) work and memory.

TPU-native replacement: frame t belongs to the phoneme p(t) whose
cumulative-duration interval contains t; p(t) is a vectorized
comparison-sum (searchsorted) and the expansion is a take_along_axis
gather — O(T_y * (T_x + C)), no dense alignment matrix. Exactly
equivalent to the reference matmul for valid frames; frames beyond the
total duration gather phoneme 0 rows times 0 (masked), matching the
all-zero alignment rows of the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def duration_to_frame_indices(
    durations: jnp.ndarray, num_frames: int, offset=0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map integer durations to per-frame phoneme indices.

    durations: (B, T_x) int32 — frames per phoneme (already masked so
        padded phonemes have 0 duration).
    offset: absolute index of the first frame (static or traced int32)
        — the long-form windowed decode expands frames
        [offset, offset + num_frames) of the full utterance.
    Returns (indices (B, num_frames) int32, frame_valid (B, num_frames) bool).
    """
    cum = jnp.cumsum(durations.astype(jnp.int32), axis=-1)  # (B, T_x)
    frames = offset + jnp.arange(num_frames, dtype=jnp.int32)  # (T_y,)
    # p(t) = #{phonemes whose cumulative duration <= t}
    idx = jnp.sum(cum[:, None, :] <= frames[None, :, None], axis=-1)
    total = cum[:, -1:]
    valid = frames[None, :] < total
    return jnp.minimum(idx, durations.shape[-1] - 1), valid


def expand_by_duration(
    values: jnp.ndarray,
    durations: jnp.ndarray,
    num_frames: int,
    offset=0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand (B, T_x, C) phoneme-level values to (B, T_y, C) frames.

    Returns (expanded, frame_valid (B, T_y, 1) mask). Expanded rows for
    invalid frames are zeroed (parity with the reference's zero
    alignment rows). `offset` selects the absolute frame window
    [offset, offset + num_frames) (long-form decode).
    """
    idx, valid = duration_to_frame_indices(durations, num_frames, offset)
    expanded = jnp.take_along_axis(values, idx[..., None], axis=1)
    mask = valid[..., None]
    return expanded * mask.astype(values.dtype), mask
