"""Fused HiFiGAN MRF residual-stack kernel (Pallas, TPU).

The MRF section of each upsample stage (reference: models.py:353-363 +
modules.py:220-368) is a chain of small-channel dilated convolutions.
In XLA/NWC form every conv round-trips its activation through HBM with
channels on the 128-lane axis — at the late stages (64/32 channels)
that pads 2-4x, and the ~18 elementwise+conv passes per stage are all
HBM-bandwidth-bound.

This kernel runs the whole MRF stage in one pass, time-major:

  - activations live in VMEM as (C, T_tile + 2*halo) tiles with the
    time axis on lanes — zero layout padding for any C;
  - each dilated conv is k static lane-shifts, each a (C_out x C_in)
    @ (C_in x T) MXU matmul — contraction over channels;
  - the full residual chain (leaky_relu -> conv -> ... -> +x, averaged
    over kernels) is computed per tile; HBM sees one read of x and one
    write of the result;
  - per-row valid lengths mask intermediate activations exactly like
    the reference's x_mask, so batched == solo semantics are preserved
    at tile AND utterance boundaries (halo tiles read neighbor data
    from HBM; beyond-sequence positions are zeroed).

Weights are passed as one packed (n_convs, k_max, C, C) array + bias
matrix so the kernel signature is static across stages.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def _stage_plan(
    kernel_sizes: Sequence[int],
    dilation_sizes: Sequence[Sequence[int]],
    resblock_type: str,
) -> Tuple[List[List[Tuple[int, int]]], int]:
    """Per-resblock list of (kernel, dilation) conv steps + halo."""
    blocks: List[List[Tuple[int, int]]] = []
    for k, dils in zip(kernel_sizes, dilation_sizes):
        steps: List[Tuple[int, int]] = []
        if resblock_type == "1":
            for d in dils:
                steps.append((k, d))
                steps.append((k, 1))
        else:
            for d in dils:
                steps.append((k, d))
        blocks.append(steps)
    halo = max(
        sum((k * d - d) // 2 for k, d in steps) for steps in blocks
    )
    return blocks, halo


def _mrf_kernel(
    # prefetch scalars
    lengths_ref,  # (B,) int32 valid samples per row
    # inputs
    x_curr_ref,  # (1, C, T_tile) tile i of the halo-shifted input
    x_next_ref,  # (1, C, T_tile) tile i+1 (supplies the right halo)
    w_ref,  # (n_convs, k_max, C, C)
    b_ref,  # (n_convs, C)
    # outputs
    out_ref,  # (1, C, T_tile)
    # scratch
    win_ref,  # (C, W) assembled halo window
    tap_ref,  # (k_max*C, W) tap-stacking buffer
    *,
    blocks: List[List[Tuple[int, int]]],
    halo: int,
    t_tile: int,
    c: int,
    acc_dtype,
):
    b_idx = pl.program_id(0)
    tile_idx = pl.program_id(1)
    width = t_tile + 2 * halo
    t0 = tile_idx * t_tile - halo  # global position of tile column 0

    valid_len = lengths_ref[b_idx]
    # lane position -> global sample index
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1) + t0
    valid = (pos >= 0) & (pos < valid_len)  # (1, W)

    # Window i = x_shifted[i*t : i*t + t + 2h] = tile i ++ tile[i+1][:2h]
    # (the input was pre-shifted right by `halo`, so no left neighbor is
    # needed). Assembled through scratch: overlapping windows cannot be
    # expressed as a BlockSpec (stride != block), and restriding in XLA
    # costs 6-30x the kernel itself (gather/transpose).
    win_ref[:, :t_tile] = x_curr_ref[0]
    win_ref[:, t_tile:] = x_next_ref[0, :, : 2 * halo]
    x = jnp.where(valid, win_ref[...], 0.0)

    def lrelu(v):
        # max/min form: Mosaic rejects bf16 ordered compares on some
        # targets ("Target does not support this comparison")
        slope = jnp.asarray(LRELU_SLOPE, v.dtype)
        return jnp.maximum(v, 0) + slope * jnp.minimum(v, 0)

    def conv_step(h, conv_idx, k, d):
        """Same-padded dilated conv over the tile (edges read zeros).

        Tap-packed: the k lane-shifted copies of h are stacked on the
        sublane axis into (k*C, W) and contracted in ONE MXU matmul
        with the (k*C, C_out) packed weight — K = k*C (96..224) loads
        the systolic array far better than per-tap K = C matmuls.
        """
        pad = (k * d - d) // 2
        for kk in range(k):
            shift = kk * d - pad
            # h shifted by `shift` along lanes with zero fill
            if shift == 0:
                seg = h
            elif shift > 0:
                seg = jnp.pad(h, ((0, 0), (0, shift)))[:, shift:]
            else:
                seg = jnp.pad(h, ((0, 0), (-shift, 0)))[:, :width]
            # store through scratch: resolves Mosaic lane offsets that a
            # direct concat of shifted views cannot express
            tap_ref[kk * c : (kk + 1) * c, :] = seg
        stacked = tap_ref[: k * c, :]
        w_all = w_ref[conv_idx, :k].reshape(k * c, c).astype(h.dtype)
        acc = jax.lax.dot_general(
            w_all, stacked,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        # bias stored (n_convs, C, 1) f32: broadcasting along lanes
        # avoids a bf16 minor-dim insertion Mosaic rejects
        acc = acc + b_ref[conv_idx].astype(acc_dtype)
        return acc.astype(h.dtype)

    conv_idx = 0
    xs = None
    for steps in blocks:
        h = x
        if len(steps) and _is_resblock1(steps):
            # resblock1: pairs (conv_d, conv_1) with residual after each pair
            for i in range(0, len(steps), 2):
                k1, d1 = steps[i]
                k2, d2 = steps[i + 1]
                ht = lrelu(h)
                ht = jnp.where(valid, ht, 0.0)
                ht = conv_step(ht, conv_idx, k1, d1)
                conv_idx += 1
                ht = lrelu(ht)
                ht = jnp.where(valid, ht, 0.0)
                ht = conv_step(ht, conv_idx, k2, d2)
                conv_idx += 1
                h = ht + h
        else:
            for k, d in steps:
                ht = lrelu(h)
                ht = jnp.where(valid, ht, 0.0)
                ht = conv_step(ht, conv_idx, k, d)
                conv_idx += 1
                h = ht + h
        h = jnp.where(valid, h, 0.0)
        xs = h if xs is None else xs + h

    out = xs / len(blocks)
    out_ref[0] = out[:, halo : halo + t_tile]


def _is_resblock1(steps: List[Tuple[int, int]]) -> bool:
    # resblock1 steps come in (k,d),(k,1) pairs
    return (
        len(steps) % 2 == 0
        and all(steps[i + 1][1] == 1 for i in range(0, len(steps), 2))
        and any(d != 1 for _, d in steps[0::2])
    )


def pack_stage_weights(
    resblock_params: Sequence[Dict[str, Any]],
    kernel_sizes: Sequence[int],
    dilation_sizes: Sequence[Sequence[int]],
    resblock_type: str,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack per-stage conv weights into (n_convs, k_max, C, C) + biases.

    Weight layout inside: (C_in, C_out) per tap (kernel stores (k, C_in,
    C_out) as everywhere in this repo).
    """
    convs = []
    biases = []
    for j, p in enumerate(resblock_params):
        if resblock_type == "1":
            for c1, c2 in zip(p["convs1"], p["convs2"]):
                convs.append(c1["w"])
                biases.append(c1["b"])
                convs.append(c2["w"])
                biases.append(c2["b"])
        else:
            for cp in p["convs"]:
                convs.append(cp["w"])
                biases.append(cp["b"])
    k_max = max(w.shape[0] for w in convs)
    c = convs[0].shape[-1]
    packed = np.zeros((len(convs), k_max, c, c), np.float32)
    for i, w in enumerate(convs):
        packed[i, : w.shape[0]] = np.asarray(w, np.float32)
    packed_b = np.stack([np.asarray(b, np.float32) for b in biases])[..., None]
    return (
        jnp.asarray(packed, dtype),
        jnp.asarray(packed_b, jnp.float32),  # (n_convs, C, 1) f32
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_sizes", "dilation_sizes", "resblock_type", "t_tile", "interpret"
    ),
)
def mrf_fused(
    x_tm: jnp.ndarray,  # (B, C, T) time-major, already masked
    lengths: jnp.ndarray,  # (B,) int32 valid samples
    packed_w: jnp.ndarray,  # (n_convs, k_max, C, C)
    packed_b: jnp.ndarray,  # (n_convs, C)
    *,
    kernel_sizes: Tuple[int, ...],
    dilation_sizes: Tuple[Tuple[int, ...], ...],
    resblock_type: str,
    t_tile: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused MRF stage: returns mean of resblocks, (B, C, T)."""
    blocks, halo = _stage_plan(kernel_sizes, dilation_sizes, resblock_type)
    b, c, t = x_tm.shape
    # VMEM budget: the unrolled conv chain keeps ~10 live (C, width)
    # buffers (bf16 + f32 accumulators); keep C * t_tile ~ 128K elems.
    # VMEM fit: the packed weights live wholly in VMEM alongside the
    # tap scratch ((k_max*C, W)), the window, and ~12 live chain
    # buffers ((C, W) each). Solve the lane budget for t_tile; callers
    # must not use this kernel when the weights alone exceed VMEM
    # (mrf_weight_bytes below).
    # Empirical live-buffer model: Mosaic's scoped VMEM for this body
    # is ~(k_max + 30) C-rows per output lane (measured 20.1 MB at
    # C=128, k=7, width 2138).
    w_bytes = int(np.prod(packed_w.shape)) * 2
    per_lane = (packed_w.shape[1] + 30) * c * 2
    avail = 13 * 1024 * 1024 - w_bytes
    cap = (avail // per_lane - 2 * halo) // 128 * 128
    t_tile = min(t_tile, max(256, cap))
    t_tile = min(t_tile, -(-t // 128) * 128)
    # window assembly needs the right halo to fit in the next tile, and
    # Mosaic needs 128-aligned lane blocks
    t_tile = max(t_tile, -(-2 * halo // 128) * 128)
    n_tiles = pl.cdiv(t, t_tile)
    t_padded = n_tiles * t_tile
    if t_padded != t:
        x_tm = jnp.pad(x_tm, ((0, 0), (0, 0), (0, t_padded - t)))

    width = t_tile + 2 * halo
    assert 2 * halo <= t_tile, "halo larger than half a tile"
    # Shift right by halo and pad to (n_tiles+1) whole tiles: window i
    # = x_shifted[i*t : i*t+width] = tile i ++ head of tile i+1 — both
    # plain BlockSpec fetches (no restride; an XLA gather here costs
    # ~30x the kernel, a window-major transpose ~6x).
    x_shifted = jnp.pad(
        x_tm,
        ((0, 0), (0, 0), (halo, (n_tiles + 1) * t_tile - t_padded - halo)),
    )

    kernel = functools.partial(
        _mrf_kernel,
        blocks=blocks,
        halo=halo,
        t_tile=t_tile,
        c=c,
        acc_dtype=jnp.float32,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, c, t_tile),
                    lambda bi, ti, lens: (bi, 0, ti),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, c, t_tile),
                    lambda bi, ti, lens: (bi, 0, ti + 1),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, c, t_tile), lambda bi, ti, lens: (bi, 0, ti),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((c, width), x_tm.dtype),
                pltpu.VMEM((packed_w.shape[1] * c, width), x_tm.dtype),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, t_padded), x_tm.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), x_shifted, x_shifted, packed_w, packed_b)
    return out[:, :, :t]


def mrf_weight_bytes(c: int, kernel_sizes, dilation_sizes, resblock_type: str) -> int:
    """VMEM bytes the packed (n_convs, k_max, C, C) bf16 weights need —
    callers route stages whose table can't fit (plus working buffers)
    to the XLA path instead."""
    n_convs = sum(
        (2 if resblock_type == "1" else 1) * len(d) for d in dilation_sizes
    )
    return n_convs * max(kernel_sizes) * c * c * 2


# ---------------------------------------------------------------------------
# Fully fused upsample stage: lrelu -> ConvTranspose1d -> MRF [-> conv_post]
#
# The interleave problem: a transposed conv's u polyphase outputs must be
# merged sample-interleaved (out[u*w+p] = phase_p[w]), but Mosaic has no
# lane-expand/shuffle primitive and XLA materializes the strided merge at
# 6-12x bandwidth cost right at the Pallas input boundary (measured: the
# medium voice's last stage spent 8-9 ms interleaving 268 MB, then 5.7 ms
# re-reading it 7x for conv_post).
#
# Resolution: never interleave. Inside the kernel the activation lives
# PHASE-BLOCKED on lanes: A = (C, u*Wp) with plane p in lanes
# [p*Wp, (p+1)*Wp), where plane p holds the samples t === p (mod u) of the
# tile (w indexes frames, t = u*(w + tile_origin - Hp) + p). Each plane
# carries its own halo Hp = ceil(true_halo / u) + 1, so a true-time shift
# by o becomes a STATIC (source-plane p' = (p-o) mod u, lane-shift
# floor((p-o)/u)) block copy — the same bytes the interleaved kernel
# copies, re-indexed. Every MRF conv is still ONE tap-packed MXU matmul
# of identical shape ((k*C, u*Wp) @ (k*C, C)); only the tap-assembly
# copy table changes. The final conv_post consumes the planes the same
# way and emits u single-channel waveform planes; the only interleave
# left is the (B, u, V) -> (B, V*u) transpose of the int-ready waveform
# in XLA — 2 bytes/sample instead of 2*C.
# ---------------------------------------------------------------------------


def _fused_stage_kernel(
    # prefetch
    lengths_ref,  # (B,) int32 valid OUTPUT samples per row
    # inputs
    x_curr_ref,  # (1, u_in*C_in, Vt) tile i of halo-pre-shifted input frames
    x_next_ref,  # (1, u_in*C_in, Vt) tile i+1 (right halo)
    wt_ref,  # (u, nq*C_in, C_out) packed polyphase taps
    bt_ref,  # (C_out, 1) f32 tconv bias
    wm_ref,  # (n_convs, k_max*C, C) packed MRF weights
    bm_ref,  # (n_convs, C, 1) f32 MRF biases
    wp_ref,  # (1, k_post*C) conv_post weights (zeros row when post=False)
    # outputs
    out_ref,  # post: (1, u_out, Vt); else (1, u_out*C_out, Vt) sublane planes
    # scratch
    win_ref,  # (u_in*C_in, Wi) input window
    tapin_ref,  # (nq*C_in, u_in*Wi) tconv tap stack (lane-blocked by p1)
    a_ref,  # (C_out, u_out*Wp) phase-blocked activation
    tap_ref,  # (k_max*C_out, u_out*Wp) MRF tap stack
    mask_ref,  # (1, u_out*Wp) f32 out-validity (1.0 valid / 0.0 invalid)
    *,
    blocks: List[List[Tuple[int, int]]],
    u: int,  # this stage's upsample factor
    u_in: int,  # phase planes of the INPUT (1 = interleaved time-major)
    q0: int,
    nq: int,
    hp: int,
    h_in: int,
    t_tile: int,  # frames per tile (Vt)
    c_in: int,
    c_out: int,
    post: bool,
    acc_dtype,
):
    b_idx = pl.program_id(0)
    tile_idx = pl.program_id(1)
    u_out = u * u_in
    wi = t_tile + 2 * h_in
    wp = t_tile + 2 * hp
    out_len = lengths_ref[b_idx]
    v0 = tile_idx * t_tile  # global frame index of tile column 0

    # ---- input window: frames [v0 - h_in, v0 + Vt + h_in) ----
    win_ref[:, :t_tile] = x_curr_ref[0]
    win_ref[:, t_tile:] = x_next_ref[0, :, : 2 * h_in]
    if u_in == 1:
        in_len = out_len // u
        pos_in = jax.lax.broadcasted_iota(jnp.int32, (1, wi), 1) + (v0 - h_in)
        valid_in = (pos_in >= 0) & (pos_in < in_len)
        x = jnp.where(valid_in, win_ref[...], 0.0)
    else:
        # plane-form input comes from another fused stage, whose output
        # mask already zeroed every invalid sample exactly
        x = win_ref[...]
    slope = jnp.asarray(LRELU_SLOPE, x.dtype)
    x = jnp.maximum(x, 0) + slope * jnp.minimum(x, 0)

    # ---- polyphase transposed conv -> phase planes ----
    # Input true time s = u_in*w + p1; tap q reads s + q = plane
    # p1' = (p1+q) mod u_in at frame w + (p1+q-p1')/u_in. Output plane
    # index pi = u*p1 + p2 (t = u*s + p2 = u_out*w + pi).
    for p1 in range(u_in):
        for qi in range(nq):
            q = q0 + qi
            p1s = (p1 + q) % u_in
            delta = (p1 + q - p1s) // u_in
            blk = x[p1s * c_in : (p1s + 1) * c_in, :]
            if delta > 0:
                blk = jnp.pad(blk, ((0, 0), (0, delta)))[:, delta:]
            elif delta < 0:
                blk = jnp.pad(blk, ((0, 0), (-delta, 0)))[:, :wi]
            tapin_ref[
                qi * c_in : (qi + 1) * c_in, p1 * wi : (p1 + 1) * wi
            ] = blk
    taps_in = tapin_ref[...]
    # out-validity per plane: t = u_out*(v0 - hp + j) + pi for lane pi*Wp + j
    for p2 in range(u):
        ph = jax.lax.dot_general(
            wt_ref[p2].astype(x.dtype), taps_in,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )  # (C_out, u_in*Wi) lane-blocked by p1
        ph = (ph + bt_ref[...].astype(acc_dtype)).astype(x.dtype)
        for p1 in range(u_in):
            pi = u * p1 + p2
            a_ref[:, pi * wp : (pi + 1) * wp] = ph[
                :, p1 * wi + h_in - hp : p1 * wi + h_in - hp + wp
            ]
            pos_t = (
                jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1) + (v0 - hp)
            ) * u_out + pi
            mask_ref[:, pi * wp : (pi + 1) * wp] = jnp.where(
                (pos_t >= 0) & (pos_t < out_len), 1.0, 0.0
            )

    valid = mask_ref[...] > 0.5  # (1, u_out*Wp)
    x = jnp.where(valid, a_ref[...], 0.0)

    def lrelu(v):
        s = jnp.asarray(LRELU_SLOPE, v.dtype)
        return jnp.maximum(v, 0) + s * jnp.minimum(v, 0)

    def flat_shift(h, sh: int):
        """h lane-shifted by sh across the WHOLE (C, u_out*Wp) buffer
        (zero fill at the buffer ends)."""
        if sh == 0:
            return h
        wtot = h.shape[1]
        if sh > 0:
            return jnp.pad(h, ((0, 0), (0, sh)))[:, sh:]
        return jnp.pad(h, ((0, 0), (-sh, 0)))[:, :wtot]

    def tap_rows(h, o: int):
        """Assemble the tap row-block for true-time offset o as at most
        TWO flat run copies instead of u_out per-plane copies.

        Out time t = u_out*w + p reads t + o. With o = u_out*d0 + r
        (r in [0, u_out)), dest planes [0, u_out-r) map to src plane
        p+r at frame shift d0 and dest planes [u_out-r, u_out) wrap to
        src plane p+r-u_out at shift d0+1 — each run is CONTIGUOUS in
        the flat plane-major lane layout, so it is one lane-offset
        block copy (run1 flat offset r*Wp + d0, run2 (r-u_out)*Wp +
        d0 + 1). Columns shifted in across a plane boundary hold the
        neighboring plane's edge frames instead of the per-plane zero
        fill — wrong values at exactly the positions the halo
        discipline already discards (the old zero fill was equally
        wrong there: the true neighboring frames are nonzero), so
        retained output is unchanged.
        """
        r = o % u_out
        d0 = (o - r) // u_out
        if r == 0:
            return [(0, flat_shift(h, d0))]
        n1 = (u_out - r) * wp
        run1 = flat_shift(h, r * wp + d0)[:, :n1]
        run2 = flat_shift(h, (r - u_out) * wp + d0 + 1)[:, n1:]
        return [(0, run1), (n1, run2)]

    def conv_step(h, conv_idx, k, d):
        """True-time dilated conv on phase-blocked layout: per tap at
        most two flat run copies (see tap_rows), then ONE tap-packed
        MXU matmul."""
        pad = (k * d - d) // 2
        for kk in range(k):
            o = kk * d - pad
            for lo, blk in tap_rows(h, o):
                tap_ref[
                    kk * c_out : (kk + 1) * c_out, lo : lo + blk.shape[1]
                ] = blk
        stacked = tap_ref[: k * c_out, :]
        w_all = wm_ref[conv_idx, : k * c_out].astype(h.dtype)
        acc = jax.lax.dot_general(
            w_all, stacked,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        acc = acc + bm_ref[conv_idx].astype(acc_dtype)
        return acc.astype(h.dtype)

    conv_idx = 0
    xs = None
    for steps in blocks:
        h = x
        if len(steps) and _is_resblock1(steps):
            for i in range(0, len(steps), 2):
                k1, d1 = steps[i]
                k2, d2 = steps[i + 1]
                ht = lrelu(h)
                ht = jnp.where(valid, ht, 0.0)
                ht = conv_step(ht, conv_idx, k1, d1)
                conv_idx += 1
                ht = lrelu(ht)
                ht = jnp.where(valid, ht, 0.0)
                ht = conv_step(ht, conv_idx, k2, d2)
                conv_idx += 1
                h = ht + h
        else:
            for k, d in steps:
                ht = lrelu(h)
                ht = jnp.where(valid, ht, 0.0)
                ht = conv_step(ht, conv_idx, k, d)
                conv_idx += 1
                h = ht + h
        h = jnp.where(valid, h, 0.0)
        xs = h if xs is None else xs + h

    out = (xs / len(blocks)).astype(x.dtype)

    if not post:
        # sublane-plane output (1, u_out*C_out, Vt): plane-form for the
        # next fused stage to consume directly
        for p in range(u_out):
            out_ref[0, p * c_out : (p + 1) * c_out, :] = out[
                :, p * wp + hp : p * wp + hp + t_tile
            ]
        return

    # conv_post (k=7, C -> 1, no bias) + tanh on the planes
    s = jnp.asarray(0.01, out.dtype)
    g = jnp.maximum(out, 0) + s * jnp.minimum(out, 0)
    g = jnp.where(valid, g, 0.0)
    k_post = wp_ref.shape[1] // c_out
    pad = (k_post - 1) // 2
    for kk in range(k_post):
        o = kk - pad
        for lo, blk in tap_rows(g, o):
            tap_ref[
                kk * c_out : (kk + 1) * c_out, lo : lo + blk.shape[1]
            ] = blk
    y = jax.lax.dot_general(
        wp_ref[...].astype(g.dtype), tap_ref[: k_post * c_out, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
    )  # (1, u_out*Wp)
    y = jnp.tanh(y) * mask_ref[...].astype(acc_dtype)
    y = y.astype(out_ref.dtype)
    for p in range(u_out):
        out_ref[0, p : p + 1, :] = y[:, p * wp + hp : p * wp + hp + t_tile]


@functools.partial(
    jax.jit,
    static_argnames=(
        "u", "u_in", "q0", "kernel_sizes", "dilation_sizes", "resblock_type",
        "post", "t_tile", "interpret",
    ),
)
def fused_upsample_mrf(
    x_tm: jnp.ndarray,  # (B, u_in*C_in, V) stage input (pre-lrelu)
    lengths: jnp.ndarray,  # (B,) int32 valid OUTPUT samples of this stage
    wt: jnp.ndarray,  # (u, nq, C_in, C_out) polyphase taps (zeros unused)
    bt: jnp.ndarray,  # (C_out,) tconv bias
    wm: jnp.ndarray,  # (n_convs, k_max, C_out, C_out) packed MRF weights
    bm: jnp.ndarray,  # (n_convs, C_out, 1) MRF biases
    wpost: Optional[jnp.ndarray],  # (k_post, C_out, 1) conv_post or None
    *,
    u: int,
    u_in: int = 1,
    q0: int,
    kernel_sizes: Tuple[int, ...],
    dilation_sizes: Tuple[Tuple[int, ...], ...],
    resblock_type: str,
    post: bool = False,
    t_tile: int = 1024,
    interpret: bool = False,
):
    """One HiFiGAN upsample stage in a single Pallas pass.

    Input: interleaved time-major (u_in=1, V = input samples) or the
    sublane phase-plane output of a previous fused stage (u_in>1,
    rows = u_in*C_in plane-major, V = frames; MUST be exactly masked,
    which fused-stage outputs are). With u_out = u*u_in:
    - post=True: returns (B, u_out, Vpad) waveform planes; caller
      interleaves with a transpose+reshape (2 bytes/sample).
    - post=False: returns (B, u_out*C_out, Vpad) sublane planes for the
      next fused stage.
    Vpad = ceil(V / t_tile) * t_tile.
    """
    blocks, true_halo = _stage_plan(kernel_sizes, dilation_sizes, resblock_type)
    b, rows_in, v = x_tm.shape
    nq = wt.shape[1]
    c_in = wt.shape[2]
    c_out = wt.shape[3]
    assert rows_in == u_in * c_in, (rows_in, u_in, c_in)
    u_out = u * u_in
    k_post = wpost.shape[0] if post else 0
    if post:
        true_halo += (k_post - 1) // 2
    hp = -(-true_halo // u_out) + 1
    h_in = hp + max(-q0, q0 + nq - 1)

    # VMEM-fit the frame tile: live buffers scale with u_out*Wp lanes at
    # C_out rows (chain + tap stack) plus the input window and tconv tap
    # stack. The tap stack is shared by the MRF convs and the conv_post
    # epilogue, so size it for the larger of the two kernels.
    k_max = max(wm.shape[1], k_post)
    esize = jnp.dtype(x_tm.dtype).itemsize
    w_bytes = (
        int(np.prod(wt.shape)) + int(np.prod(wm.shape)) + k_post * c_out
    ) * esize
    per_frame = (
        (k_max + 14) * c_out * u_out + (u_in + nq * u_in + 2) * c_in
    ) * esize
    avail = 12 * 1024 * 1024 - w_bytes
    cap = max(128, (avail // per_frame - 2 * hp) // 128 * 128)
    t_tile = min(t_tile, cap, -(-v // 128) * 128)
    t_tile = max(t_tile, -(-2 * h_in // 128) * 128)
    # The 128-frame floor above can exceed VMEM for configs the caller
    # should have routed to the XLA path (fused_stage_vmem_ok with the
    # right esize); fail loudly at trace time instead of in Mosaic.
    est = w_bytes + (t_tile + 2 * hp) * per_frame
    if est > 14 * 1024 * 1024:
        raise ValueError(
            f"fused_upsample_mrf does not fit VMEM (~{est >> 20} MiB for "
            f"t_tile={t_tile}, dtype={x_tm.dtype}); gate the caller with "
            "fused_stage_vmem_ok(..., esize=dtype.itemsize)"
        )
    n_tiles = pl.cdiv(v, t_tile)
    v_padded = n_tiles * t_tile
    if v_padded != v:
        x_tm = jnp.pad(x_tm, ((0, 0), (0, 0), (0, v_padded - v)))

    wi = t_tile + 2 * h_in
    wp_lanes = t_tile + 2 * hp
    assert 2 * h_in <= t_tile, "input halo larger than half a tile"
    x_shifted = jnp.pad(
        x_tm, ((0, 0), (0, 0), (h_in, (n_tiles + 1) * t_tile - v_padded - h_in))
    )

    wdt = x_tm.dtype
    wt_packed = wt.reshape(u, nq * c_in, c_out).astype(wdt)
    wm_packed = wm.reshape(wm.shape[0], wm.shape[1] * c_out, c_out).astype(wdt)
    if post:
        wp_packed = wpost.reshape(1, k_post * c_out).astype(wdt)
    else:
        wp_packed = jnp.zeros((1, c_out), wdt)

    kernel = functools.partial(
        _fused_stage_kernel,
        blocks=blocks, u=u, u_in=u_in, q0=q0, nq=nq, hp=hp, h_in=h_in,
        t_tile=t_tile, c_in=c_in, c_out=c_out, post=post,
        acc_dtype=jnp.float32,
    )
    if post:
        out_shape = jax.ShapeDtypeStruct((b, u_out, v_padded), x_tm.dtype)
        out_spec = pl.BlockSpec(
            (1, u_out, t_tile), lambda bi, ti, lens: (bi, 0, ti),
            memory_space=pltpu.VMEM,
        )
    else:
        out_shape = jax.ShapeDtypeStruct(
            (b, u_out * c_out, v_padded), x_tm.dtype
        )
        out_spec = pl.BlockSpec(
            (1, u_out * c_out, t_tile), lambda bi, ti, lens: (bi, 0, ti),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, rows_in, t_tile), lambda bi, ti, lens: (bi, 0, ti),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, rows_in, t_tile), lambda bi, ti, lens: (bi, 0, ti + 1),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((rows_in, wi), x_tm.dtype),
                pltpu.VMEM((nq * c_in, u_in * wi), x_tm.dtype),
                pltpu.VMEM((c_out, u_out * wp_lanes), x_tm.dtype),
                pltpu.VMEM((k_max * c_out, u_out * wp_lanes), x_tm.dtype),
                pltpu.VMEM((1, u_out * wp_lanes), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(
        lengths.astype(jnp.int32), x_shifted, x_shifted,
        wt_packed, bt.reshape(c_out, 1).astype(jnp.float32),
        wm_packed, bm.astype(jnp.float32), wp_packed,
    )


def fused_stage_vmem_ok(
    c_in: int, c_out: int, u: int, nq: int,
    kernel_sizes, dilation_sizes, resblock_type: str,
    u_in: int = 1,
    esize: int = 2,
) -> bool:
    """Whether the fused stage kernel fits VMEM with a reasonable tile
    (>=128 frames) and a sane unroll size (u_out caps the static
    tap-copy count per conv). esize: bytes per activation element
    (2 = bf16 serving; pass 4 when calling the kernel in float32)."""
    u_out = u * u_in
    # The old u_out <= 8 cap dated from per-plane tap assembly
    # (k*u_out block copies per conv). With run-batched tap copies
    # (<= 2 flat runs per tap, independent of u_out) the deep compound
    # chain WINS: medium stages 1-2 as one fused suffix (u_out 8 -> 32)
    # measured 17.6 ms vs 20.8 ms for tconv+mrf_fused+fused-last-stage
    # on the v5e. Keep a sanity cap where the per-tile plane unroll
    # (a_ref/mask assembly is still u_out block writes) and the
    # VMEM-floored 128-frame tile stop paying.
    if u_out > 32:
        return False
    n_convs = sum(
        (2 if resblock_type == "1" else 1) * len(d) for d in dilation_sizes
    )
    k_max = max(max(kernel_sizes), 7)  # tap scratch also serves conv_post
    w_bytes = (
        u * nq * c_in * c_out + n_convs * max(kernel_sizes) * c_out * c_out
    ) * esize
    per_frame = (
        (k_max + 14) * c_out * u_out + (u_in + nq * u_in + 2) * c_in
    ) * esize
    # require a 128-frame tile (plus ~32 frames of halo slack) to fit
    return w_bytes + 160 * per_frame <= 11 * 1024 * 1024
