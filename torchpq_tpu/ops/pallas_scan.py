"""Pallas TPU fused IVFPQ block-scan kernel.

Reference counterpart: the fused scan kernels torchpq/kernels/cuda/
ivfpq_topk.cu (per-query ADC LUT in shared memory + streaming top-k). Here
the block decomposition comes from ops/adc.py's cell-major design (sorted
probe pairs packed into blocks of p_tile probers of one cell); this kernel
replaces the XLA `lax.map` block loop, whose per-iteration dynamic-slice
reads measure ~26 GB/s. The kernel:

  * processes `bps` blocks per grid step (the per-step pipeline overhead was
    measured at ~4 us/step at the 1M bench shape — multi-block steps
    amortize it; the per-block compute is ~0.2 us, so step overhead IS the
    kernel's cost),
  * double-buffers the per-block candidate-window DMAs (HBM -> VMEM at full
    bandwidth, overlapped with compute); windows are contiguous because
    cells are contiguous segments, and 16-aligned by the container's pow2
    capacity invariant,
  * streams the XLA-staged [bps, s_eff] penalty rows (norm-or-BIG with all
    validity masking folded in; 4 B/slot) through the BlockSpec pipeline
    next to the query tiles (an in-kernel penalty DMA from the [cap] array
    is impossible: 1-D HBM memrefs carry 1024-element tiling and cell
    starts are only 16-aligned — Mosaic rejects the slice),
  * streams the per-block query tiles [bps, p_tile, d] through the BlockSpec
    pipeline (pre-gathered by XLA, where a small-table row gather runs at
    ~100 GB/s — measured far faster than a per-row in-kernel gather loop),
  * scores each block with one MXU matmul (bf16 x bf16 -> f32) minus its
    penalty row,
  * selects the per-prober top-k in VMEM: approx mode first reduces
    [p, s] -> [p, G] with strided group maxima (the approx_max_k recipe —
    one winner per group, groups interleaved so the reduce is G-wide
    vector max ops, never a lane-hostile reshape), then runs k unrolled
    max passes on the G-wide remainder; exact mode runs the k passes on
    the full [p, s] scores,
  * writes results in the exact wire format the XLA merge consumes:
    approx -> pack32 (order-preserving value bits | in-window slot, ONE
    int32 per candidate), exact -> (order-preserving int32 key, address)
    pairs. The caller's unsort/merge is shared with the XLA path.

The per-query -|q|^2 term (euclidean true-value correction) is rank-
invariant per query and applied by the caller after the final merge.

Numerics: the exact branch matches ops/adc.scan_cell_major's XLA exact
branch bit-for-bit (interpret-mode parity test in tests/test_pallas_scan.py);
the approx branch implements the same group-reduction semantics as
jax.lax.approx_max_k (per-pair recall ~0.95 at G=128, s=512, k<=16).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sortable_i32_const(x):
    """Host-side mirror of adc._f32_sortable_i32 for compile-time constants
    (Mosaic's tpu.bitcast only accepts vectors, not scalars)."""
    u = int(np.float32(x).view(np.uint32))
    if u >> 31:
        u = (~u ^ 0x80000000) & 0xFFFFFFFF
    return int(np.uint32(u).astype(np.int64)) - (1 << 32) \
        if u >= (1 << 31) else int(u)


# the order-preserving f32->i32 bijection must stay bit-exact with the
# XLA path's decoder (adc._sortable_i32_f32) — one definition only
from .adc import _f32_sortable_i32  # noqa: E402

# candidate double-buffer budget: 2 * bps windows of [s_eff, d] must fit
# VMEM next to the pipelined query tiles and output block
PALLAS_WINDOW_VMEM_BYTES = 10 * 1024 * 1024

# resident-qtable mode budget: the whole [nq_pad, d] query table lives in
# VMEM and each block gathers its p_tile query rows ON THE MXU (one-hot
# selection matmul) instead of streaming XLA-pregathered [B, p_tile, d]
# tiles from HBM. Kills the query-tile gather (measured 65 GB/s XLA row
# gather, ~9 ms/batch at the GIST d=960 shape — r4 VERDICT #2) at the
# price of p*nq_pad*d extra MACs per block, so it only pays while the
# scan is window-DMA-bound and the table is small:
QTABLE_VMEM_BYTES = 4 * 1024 * 1024
# one-hot MACs (p*nq_pad*d) <= ratio * score MACs (p*s_eff*d):
QTABLE_MAC_RATIO = 2.0


def _deep_select_groups():
    """Approx-select bin-count preference for deep selects (k_pair > 32).

    Every select pass reduces a [p, n_groups] row, so halving the bins
    halves the per-pass width at the cost of more birthday collisions
    among true winners (~30 winners: 512 bins lose ~0.85, 256 ~1.7).
    TORCHPQ_DEEP_GROUPS overrides the preference order for per-process
    A/B sweeps (the jit cache is per-process, so an env knob is safe
    where a runtime global would alias cached traces)."""
    import os
    env = os.environ.get("TORCHPQ_DEEP_GROUPS")
    if env:
        return (int(env),)
    return (512, 256, 128)


def _select_topk(scores, k_pair, width, big, start, slot_mask, pack32,
                 rbest=None, n_groups=None):
    """k_pair unrolled max passes over [p, width] scores.

    Returns the output row block: pack32 -> [p, k_pair] int32 packed
    (key-bits | slot); exact -> [p, 2*k_pair] int32 (keys ++ addresses).
    `rbest` ([p, width] int32) maps a winning column back to its strided
    group member: slot = rbest * n_groups + column.
    """
    p = scores.shape[0]
    iota2 = jax.lax.broadcasted_iota(jnp.int32, (p, width), 1)
    key_neg_big = jnp.int32(_sortable_i32_const(-big) & ~slot_mask)
    key_cols = []
    addr_cols = []
    pack_cols = []
    s = scores
    for _ in range(k_pair):
        mx = jnp.max(s, axis=1, keepdims=True)            # [p, 1]
        hit = s >= mx
        idx = jnp.min(jnp.where(hit, iota2, width), axis=1,
                      keepdims=True)                      # [p, 1] column
        win = iota2 == idx
        if rbest is not None:
            rwin = jnp.sum(jnp.where(win, rbest, 0), axis=1, keepdims=True)
            slot = rwin * n_groups + idx
        else:
            slot = idx
        alive = mx > -big / 2
        if pack32:
            key = _f32_sortable_i32(mx)
            packed = (key & jnp.int32(~slot_mask)) | slot
            pack_cols.append(jnp.where(alive, packed, key_neg_big))
        else:
            vals = jnp.where(alive, mx, -jnp.inf)
            key_cols.append(_f32_sortable_i32(vals))
            addr_cols.append(jnp.where(alive, start + slot, -1))
        s = jnp.where(win, -jnp.inf, s)
    if pack32:
        return jnp.concatenate(pack_cols, axis=1)
    return jnp.concatenate(key_cols + addr_cols, axis=1)


def _score_and_select(cand, pen, q, start, *, s_eff, p_tile,
                      k_pair, euclidean, big, n_groups, slot_mask, pack32,
                      scale=None, q_sc=None):
    """One block: matmul + penalty + top-k select.

    cand [s_eff, d]; pen [s_eff] f32 (norm-or-BIG, all validity masking
    pre-folded by the caller); q [p, d]; start scalar (the window's
    absolute start). int8 mode (scale/q_sc given): cand and q are int8,
    the MXU matmul runs int8 x int8 -> int32 (exact integer math, 4x less
    window DMA), and the dequant mirrors the XLA int8 branch's op order
    bit-for-bit: scores = ab * (factor * q_sc[:,None] * scale[None,:]).
    Returns the [p, out_w] int32 output rows.
    """
    if scale is not None:
        ab = jax.lax.dot_general(
            q, cand, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        factor = 2.0 if euclidean else 1.0
        scores = ab * ((factor * q_sc)[:, None] * scale[None, :]) \
            - pen[None, :]
    else:
        ab = jax.lax.dot_general(
            q.astype(cand.dtype), cand, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [p, s]
        scores = (2.0 * ab if euclidean else ab) - pen[None, :]

    if pack32:
        # pack FIRST (key-bits | in-window slot), then select on the packed
        # int32s: the slot travels inside the key, so the strided group
        # reduce is a bare max (no winner-index bookkeeping) and each
        # select pass is one lane-max + mask — no separate first-index
        # extraction pass. Slot bits also make every key in a row unique,
        # so the `== m` mask kills exactly one entry per pass.
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (p_tile, s_eff), 1)
        packed = ((_f32_sortable_i32(scores) & jnp.int32(~slot_mask))
                  | slot_iota)
        n_r = s_eff // n_groups
        best = packed[:, :n_groups]
        for r in range(1, n_r):
            # strided groups: group j holds slots {j, j+G, ...} so every
            # reduce step is a full-width vector max over a statically-
            # sliced [p, G] block (contiguous grouping would need a
            # lane-hostile [p, G, R] reshape)
            best = jnp.maximum(best,
                               packed[:, r * n_groups:(r + 1) * n_groups])
        cols = []
        neg = jnp.int32(jnp.iinfo(jnp.int32).min)
        for _ in range(k_pair):
            m = jnp.max(best, axis=1, keepdims=True)
            cols.append(m)
            best = jnp.where(best == m, neg, best)
        return jnp.concatenate(cols, axis=1)
    return _select_topk(scores, k_pair, s_eff, big, start, slot_mask,
                        pack32)


def _make_kernel(s_eff, k_pair, p_tile, d, euclidean, big, n_groups,
                 slot_mask, pack32, bps, int8=False, qtable=False):
    def kernel(start_ref, *rest):
        if qtable:
            prob_ref, rest = rest[0], rest[1:]
        else:
            qvecs_ref, rest = rest[0], rest[1:]
        pen_ref, rest = rest[0], rest[1:]
        if int8:
            scale_ref, qsc_ref, rest = rest[0], rest[1], rest[2:]
        if qtable:
            qtable_ref, rest = rest[0], rest[1:]
        decoded, out_ref, cand_buf, sems = rest
        g = pl.program_id(0)
        n_g = pl.num_programs(0)

        def window_dma(slot, step, j):
            # starts are multiples of 16 by construction (cell starts are
            # sums of pow2 capacities >= 16); Mosaic needs the hint
            start = pl.multiple_of(start_ref[step * bps + j], 16)
            return pltpu.make_async_copy(
                decoded.at[pl.ds(start, s_eff), :],
                cand_buf.at[slot, j], sems.at[slot, j])

        slot = jax.lax.rem(g, 2)
        nxt = jax.lax.rem(g + 1, 2)

        @pl.when(g == 0)
        def _():
            for j in range(bps):
                window_dma(slot, 0, j).start()

        @pl.when(g + 1 < n_g)
        def _():
            for j in range(bps):
                window_dma(nxt, g + 1, j).start()

        for j in range(bps):
            window_dma(slot, g, j).wait()
            if qtable:
                # fetch this block's query rows from the VMEM-resident
                # table with a one-hot selection matmul on the MXU (exact:
                # 0/1 weights select rows bit-for-bit in int8; bf16 rows
                # are scaled by 1.0). nq_pad columns make every compare a
                # full-lane vector op and the contraction MXU-shaped.
                nq_pad = qtable_ref.shape[0]
                prob = prob_ref[j, 0]                      # [p_tile] i32
                iota_q = jax.lax.broadcasted_iota(
                    jnp.int32, (p_tile, nq_pad), 1)
                if int8:
                    oh = (prob[:, None] == iota_q).astype(jnp.int8)
                    q_blk = jax.lax.dot_general(
                        oh, qtable_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32
                    ).astype(jnp.int8)
                else:
                    oh = (prob[:, None] == iota_q).astype(qtable_ref.dtype)
                    q_blk = jax.lax.dot_general(
                        oh, qtable_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ).astype(qtable_ref.dtype)
            else:
                q_blk = qvecs_ref[j]
            out_ref[j] = _score_and_select(
                cand_buf[slot, j], pen_ref[j, 0], q_blk,
                start_ref[g * bps + j], s_eff=s_eff, p_tile=p_tile,
                k_pair=k_pair, euclidean=euclidean, big=big,
                n_groups=n_groups, slot_mask=slot_mask, pack32=pack32,
                scale=scale_ref[j, 0] if int8 else None,
                q_sc=qsc_ref[j, 0] if int8 else None)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("s_eff", "k_pair", "p_tile", "distance", "approx",
                     "slot_mask", "bps", "interpret"))
def scan_blocks_pallas(qvecs, start_all, pen_all, decoded, *, s_eff, k_pair,
                       p_tile, distance, approx=False, slot_mask=0, bps=4,
                       interpret=False, scales_all=None, q_scales=None,
                       qtable=None, probers_all=None):
    """Run the fused block scan.

    qvecs: [B, p_tile, d] pre-gathered per-block query tiles (decoded's
    dtype, typically bf16 — the gather is an XLA small-table row gather);
    start_all: [B] i32 window starts (pre-clamped in-bounds, 16-aligned);
    pen_all: [B, s_eff] f32 per-slot penalty incl. all validity masking;
    decoded: [cap, d]. B must be a multiple of `bps` (blocks per grid step
    — the caller's block_chunk rounding guarantees it).

    int8 cache mode (decoded int8, qvecs int8): pass scales_all [B, s_eff]
    f32 per-slot dequant scales (staged like pen_all) and q_scales
    [B, p_tile] f32 per-prober query scales. The window DMA moves 1 B/dim
    (4x less HBM traffic than f32 — the lever at high d, where the scan is
    window-DMA-bound), the MXU runs int8 x int8 -> int32, and the dequant
    multiply matches the XLA int8 branch bit-for-bit.

    resident-qtable mode (qtable [nq_pad, d] + probers_all [B, p_tile] i32
    given, qvecs None): the query table lives in VMEM for the whole grid
    and each block's rows are fetched by an exact one-hot selection matmul
    — no [B, p_tile, d] HBM tile traffic at all. Gated by the caller
    (QTABLE_VMEM_BYTES / QTABLE_MAC_RATIO); results are identical to the
    streamed mode (selection is exact in both dtypes).

    Returns combo int32: approx -> [B, p_tile, k_pair] pack32 rows
    (value-bits | slot, in-window slot, slot_mask wide); exact ->
    [B, p_tile, 2*k_pair] (sortable keys ++ absolute addresses).
    """
    b = start_all.shape[0]
    assert b % bps == 0, (b, bps)
    int8 = decoded.dtype == jnp.int8
    assert (scales_all is not None) == int8 and \
        (q_scales is not None) == int8, "int8 cache needs both scale inputs"
    use_qtable = qtable is not None
    assert use_qtable == (probers_all is not None) and \
        use_qtable == (qvecs is None)
    if use_qtable:
        d = qtable.shape[1]
        assert qtable.dtype == decoded.dtype, (qtable.dtype, decoded.dtype)
    else:
        _, _, d = qvecs.shape
    big = float(jnp.finfo(jnp.float32).max / 4)
    euclidean = distance == "euclidean"
    if approx:
        # approx_max_k-style reduction: one winner per strided group. G=128
        # keeps the k select passes on one [p, 128] vreg-tile row; only
        # engage when it actually shrinks the pass width. Deep selects
        # (k_pair > 32, the k=100 path) widen the group count: with ~30
        # true winners in one hot cell, 128 bins lose ~3.3 of them to
        # collisions (birthday bound) while 512 bins lose ~0.85 — the
        # extra pass width is 4 vregs/row instead of 1, still VPU-cheap
        # next to the block matmul.
        n_groups = s_eff
        for g in (_deep_select_groups() if k_pair > 32 else (128,)):
            if s_eff % g == 0 and s_eff >= 2 * g:
                n_groups = g
                break
        assert s_eff % n_groups == 0, "approx kernel needs pow2 s_eff"
    else:
        n_groups = s_eff
    out_w = k_pair if approx else 2 * k_pair

    if use_qtable:
        # per-block prober ids stream like a 1-row int32 tile
        in_specs = [pl.BlockSpec((bps, 1, p_tile), lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM)]
        operands = [probers_all[:, None, :].astype(jnp.int32)]
    else:
        in_specs = [pl.BlockSpec((bps, p_tile, d), lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM)]
        operands = [qvecs]
    # [B, 1, s_eff] with a (bps, 1, s_eff) block: the middle
    # singleton satisfies the last-two-dims tiling rule for any bps
    in_specs.append(pl.BlockSpec((bps, 1, s_eff), lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(pen_all[:, None, :])
    if int8:
        # per-slot dequant scales stream like the penalty rows; per-prober
        # query scales stream like a 1-row query tile
        in_specs.append(pl.BlockSpec((bps, 1, s_eff), lambda g, *_: (g, 0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((bps, 1, p_tile), lambda g, *_: (g, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands += [scales_all[:, None, :], q_scales[:, None, :]]
    if use_qtable:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # resident
        operands.append(qtable)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    operands.append(decoded)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bps, p_tile, out_w),
                               lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bps, s_eff, d), decoded.dtype),
            pltpu.SemaphoreType.DMA((2, bps)),
        ],
    )

    kernel = _make_kernel(s_eff, k_pair, p_tile, d, euclidean, big,
                          n_groups, slot_mask, approx, bps, int8=int8,
                          qtable=use_qtable)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, p_tile, out_w), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100e6)),
    )(start_all.astype(jnp.int32), *operands)
