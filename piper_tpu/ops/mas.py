"""Monotonic Alignment Search — on-device Viterbi DP.

The reference runs this on the host CPU through a Cython kernel with a
GPU->numpy->C->GPU round trip every training step
(reference: vits/monotonic_align/__init__.py:7-20, core.pyx:5-42).
Here the DP is a lax.scan over spectrogram frames, vectorized over the
batch and the phoneme axis on the VPU — no host transfer, fully
jittable and differentiable-free (it returns an integer path).

Recurrence (same as core.pyx): Q[y, x] = value[y, x] + max(Q[y-1, x],
Q[y-1, x-1]), with the x == y boundary forcing the diagonal; backtrack
chooses x-1 when Q[y-1, x-1] >= Q[y-1, x].
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

NEG_INF = -1e9


def maximum_path(
    neg_cent: jnp.ndarray, x_lengths: jnp.ndarray, y_lengths: jnp.ndarray
) -> jnp.ndarray:
    """Best monotonic alignment.

    neg_cent: (B, T_y, T_x) alignment scores (frames x phonemes).
    x_lengths: (B,) valid phonemes; y_lengths: (B,) valid frames.
    Returns path: (B, T_y, T_x) float32 in {0, 1}; rows beyond
    y_lengths are all-zero, exactly like the reference's masked output.
    """
    b, t_y, t_x = neg_cent.shape
    xs = jnp.arange(t_x)

    x_len = x_lengths.astype(jnp.int32)[:, None]  # (B, 1)
    y_len = y_lengths.astype(jnp.int32)[:, None]

    # Mask invalid cells (outside the x<y band or beyond lengths).
    valid_x = xs[None, :] < x_len  # (B, T_x)

    def forward(prev_q, y):
        # prev_q: (B, T_x) row y-1 of Q
        prev_shift = jnp.concatenate(
            [jnp.full((b, 1), NEG_INF, prev_q.dtype), prev_q[:, :-1]], axis=1
        )
        # On the diagonal x == y the path must come from (y-1, x-1)
        # (core.pyx: v_cur = max_neg_val when x == y).
        from_same = jnp.where(xs[None, :] == y, NEG_INF, prev_q)
        best_prev = jnp.maximum(from_same, prev_shift)
        # First row: Q[0, 0] = value[0, 0] (both predecessors absent).
        best_prev = jnp.where(
            y == 0, jnp.where(xs[None, :] == 0, 0.0, NEG_INF), best_prev
        )
        q = neg_cent[:, y, :] + best_prev
        q = jnp.where(valid_x, q, NEG_INF)
        return q, q

    init = jnp.full((b, t_x), NEG_INF, jnp.float32)
    _, q_rows = lax.scan(forward, init, jnp.arange(t_y))
    q = jnp.transpose(q_rows, (1, 0, 2))  # (B, T_y, T_x)

    # Backtrack from (y_len-1, x_len-1) downwards.
    def backward(x_cur, y):
        # x_cur: (B,) current phoneme index at frame y (counting down)
        active = y < y_len[:, 0]
        started = y <= (y_len[:, 0] - 1)
        row = jnp.where(started, y, 0)
        # one-hot write for active rows
        onehot = (xs[None, :] == x_cur[:, None]) & active[:, None]
        # previous row values at x_cur and x_cur - 1
        q_prev = q[jnp.arange(b), jnp.maximum(row - 1, 0), :]
        at_x = jnp.take_along_axis(q_prev, x_cur[:, None], axis=1)[:, 0]
        at_xm1 = jnp.take_along_axis(
            q_prev, jnp.maximum(x_cur - 1, 0)[:, None], axis=1
        )[:, 0]
        move = (x_cur == row) | ((x_cur > 0) & (at_x < at_xm1))
        x_next = jnp.where(active & (row > 0) & move, x_cur - 1, x_cur)
        return x_next, onehot.astype(jnp.float32)

    x0 = jnp.maximum(x_len[:, 0] - 1, 0)
    _, path_rows = lax.scan(
        backward, x0, jnp.arange(t_y - 1, -1, -1)
    )
    path = jnp.transpose(path_rows[::-1], (1, 0, 2))
    return path


def maximum_path_numpy(neg_cent, x_lengths, y_lengths):
    """Pure-numpy oracle (independent reimplementation of the Viterbi
    recurrence) for testing the device kernel."""
    import numpy as np

    b, t_y, t_x = neg_cent.shape
    paths = np.zeros((b, t_y, t_x), np.float32)
    for i in range(b):
        ty, tx = int(y_lengths[i]), int(x_lengths[i])
        v = np.full((ty, tx), -np.inf, np.float64)
        for y in range(ty):
            for x in range(min(tx, y + 1)):
                if y == 0:
                    v[y, x] = neg_cent[i, 0, 0] if x == 0 else -np.inf
                    continue
                same = v[y - 1, x] if x != y else -np.inf
                diag = v[y - 1, x - 1] if x > 0 else -np.inf
                v[y, x] = neg_cent[i, y, x] + max(same, diag)
        x = tx - 1
        for y in range(ty - 1, -1, -1):
            paths[i, y, x] = 1.0
            if y > 0 and (x == y or (x > 0 and v[y - 1, x] < v[y - 1, x - 1])):
                x -= 1
    return paths
