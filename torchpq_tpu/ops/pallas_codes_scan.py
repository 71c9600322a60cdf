"""Pallas TPU fused code-domain (capacity-tier) block-scan kernel.

Reference counterpart: the raw-codes hot loop of torchpq/kernels/cuda/
ivfpq_topk.cu:856-931 — the GPU scan reads m B/slot of codes and resolves
each byte through a shared-memory ADC LUT. A TPU has no fast per-lane
gather, so a literal LUT port is VPU-bound garbage; this kernel keeps the
reference's MEMORY contract (the window DMA moves exactly m B/slot of
packed uint8 codes) but reconstructs candidates on the MXU instead:

  * window DMA: [s_eff/g, 128] uint8 rows of the packed-at-ingest
    [cap/g, g*m] storage (g = 128//m; full-lane minor dim -> zero-copy
    slices at any scale, double-buffered exactly like ops/pallas_scan.py),
  * in-VMEM decode WITHOUT any shape cast (Mosaic rejects u8 vector
    reshapes like [s/g, 128] -> [s, m]): for each in-row slot offset
    q < g, subvector j's code column is the STATIC window slice
    [:, q*m+j] — compare it against a [s_rows, 256] iota for the one-hot
    and accumulate one MXU matmul per (q, j):
        dec_q += onehot_j [s_rows, 256] @ bdiag[j*256:(j+1)*256, :]
    Every matmul is a full-utilization [s_rows, 256] x [256, d_pad]
    MXU shape; the total MAC count equals the dense blockdiag decode
    (s * m * 256 * d_pad) with zero layout changes. A one-hot row selects
    each codeword EXACTLY, so dec_q == bf16 decoded-cache rows bitwise.
  * scoring: per offset q, scores_q [p, s_rows] = MXU(qtile, dec_q^T);
    columns across q are concatenated DEINTERLEAVED (column c = q*s_rows
    + r holds slot r*g + q — the caller stages the penalty rows in the
    same order), and an explicit column->slot map feeds the same
    pack-first select / (key, address) wire format as ops/pallas_scan.py,
    so the caller's unsort/merge is shared with every other scan path.

Why decode-then-score instead of the one-hot LUT matmul the XLA fallback
uses (ops/onehot_adc.py): the LUT contraction is p*s*m*256 MACs per block
AND needs a [p_tile, m*256] LUT tile (4 MB at m=64) gathered per block;
the decode is s*m*256*d MACs ONCE per block shared across all p probers,
needs only the [p, d] query tile (32 KB), and the codebook matrix (4 MB
at m=64, d=128) stays resident in VMEM across the whole grid.

Numerics: candidates equal bf16(decode(codes)) exactly, so selection
matches adc.scan_cell_major over a bf16 decoded cache (pinned by
tests/test_pallas_codes_scan.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .adc import _f32_sortable_i32

# resident decode matrix budget: [m*256, d_pad] bf16 must share VMEM with
# the pipeline buffers (m=64, d=128 -> 4 MB; GIST-class m=64, d_pad=1024
# -> 32 MB fails the gate and takes the XLA path)
PALLAS_BDIAG_VMEM_BYTES = 9 * 1024 * 1024


def codes_kernel_static_gate(m, g, d, distance, interpret=False):
    """Shape-only part of the codes-kernel dispatch gate — the SINGLE
    source of truth shared by the scan dispatch (ops/onehot_adc.py) and
    the planner's cost mirror (IVFPQIndex._codes_kernel_eligible), so the
    planner can never assume the kernel's crossover for a shape that will
    actually run the XLA one-hot fallback (ADVICE r4 #1). Runtime-only
    conditions (k_pair, s_eff/pack32) are checked at dispatch."""
    from .. import util
    d_pad = util.round_up(d, 128) if d > 128 else d
    return (distance != "manhattan"
            and g * m == 128
            # interpret mode has no Mosaic tiling (CPU parity tests run
            # d=32); compiled kernels need a lane-aligned decode width
            and (d_pad % 128 == 0 or interpret)
            and m * 256 * d_pad * 2 <= PALLAS_BDIAG_VMEM_BYTES)


def _select_cols(scores, slot_map, *, k_pair, width, big, start):
    """Exact top-k_pair select over [p, width] scores whose column c maps
    to in-window slot slot_map[p, c] (the deinterleaved packed-offset
    order). Wire format as ops/pallas_scan.py exact mode: [p, 2*k_pair]
    int32 (sortable keys ++ absolute addresses). The pack32 (approx) select
    is inlined in the kernel — pack-first makes it three vector ops."""
    p = scores.shape[0]
    iota2 = jax.lax.broadcasted_iota(jnp.int32, (p, width), 1)
    key_cols, addr_cols = [], []
    s = scores
    for _ in range(k_pair):
        mx = jnp.max(s, axis=1, keepdims=True)
        hit = s >= mx
        idx = jnp.min(jnp.where(hit, iota2, width), axis=1, keepdims=True)
        win = iota2 == idx
        slot = jnp.sum(jnp.where(win, slot_map, 0), axis=1, keepdims=True)
        alive = mx > -big / 2
        vals = jnp.where(alive, mx, -jnp.inf)
        key_cols.append(_f32_sortable_i32(vals))
        addr_cols.append(jnp.where(alive, start + slot, -1))
        s = jnp.where(win, -jnp.inf, s)
    return jnp.concatenate(key_cols + addr_cols, axis=1)


def _pack32_group_reduce(packed, n_groups):
    """[p, width] packed int32 -> [p, n_groups] strided group maxima
    (ops/pallas_scan.py's approx recipe; any column permutation is a valid
    grouping since the slot travels inside the key)."""
    width = packed.shape[1]
    n_r = width // n_groups
    best = packed[:, :n_groups]
    for r in range(1, n_r):
        best = jnp.maximum(best, packed[:, r * n_groups:(r + 1) * n_groups])
    return best


def _make_kernel(s_eff, k_pair, p_tile, d_pad, m, g, euclidean, big,
                 n_groups, slot_mask, pack32, bps):
    s_rows = s_eff // g

    def kernel(start_ref, qvecs_ref, pen_ref, codes, bdiag_ref, out_ref,
               cand_buf, sems):
        gi = pl.program_id(0)
        n_g = pl.num_programs(0)

        def window_dma(slot, step, j):
            # packed-row start: cell starts are multiples of 16 slots, so
            # start//g is a multiple of 16//g (>= 1) packed rows
            start = start_ref[step * bps + j] // g
            if 16 // g > 1:
                start = pl.multiple_of(start, 16 // g)
            return pltpu.make_async_copy(
                codes.at[pl.ds(start, s_rows), :],
                cand_buf.at[slot, j], sems.at[slot, j])

        slot = jax.lax.rem(gi, 2)
        nxt = jax.lax.rem(gi + 1, 2)

        @pl.when(gi == 0)
        def _():
            for j in range(bps):
                window_dma(slot, 0, j).start()

        @pl.when(gi + 1 < n_g)
        def _():
            for j in range(bps):
                window_dma(nxt, gi + 1, j).start()

        iota256 = jax.lax.broadcasted_iota(jnp.int32, (s_rows, 256), 1)

        for j in range(bps):
            window_dma(slot, gi, j).wait()
            win = cand_buf[slot, j]                     # [s_rows, 128] u8
            q_tile = qvecs_ref[j]                       # [p, d_pad] bf16
            per_q = []
            for q in range(g):
                dec = jnp.zeros((s_rows, d_pad), jnp.float32)
                for sj in range(m):
                    col = win[:, q * m + sj:q * m + sj + 1] \
                        .astype(jnp.int32)              # [s_rows, 1]
                    oh = (col == iota256).astype(jnp.bfloat16)
                    dec = dec + jax.lax.dot_general(
                        oh, bdiag_ref[sj * 256:(sj + 1) * 256, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                ab = jax.lax.dot_general(
                    q_tile, dec.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [p, s_rows]
                per_q.append(ab)
            ab_all = (per_q[0] if g == 1
                      else jnp.concatenate(per_q, axis=1))  # [p, g*s_rows]
            # column c = q*s_rows + r <-> slot r*g + q; pen rows arrive
            # pre-deinterleaved in the same order
            pen = pen_ref[j, 0]                          # [s_eff]
            scores = (2.0 * ab_all if euclidean else ab_all) - pen[None, :]
            c_iota = jax.lax.broadcasted_iota(
                jnp.int32, (p_tile, s_eff), 1)
            slot_map = (jax.lax.rem(c_iota, s_rows) * g
                        + c_iota // s_rows)
            if pack32:
                packed = ((_f32_sortable_i32(scores) & jnp.int32(~slot_mask))
                          | slot_map)
                best = _pack32_group_reduce(packed, n_groups) \
                    if n_groups < s_eff else packed
                cols = []
                neg = jnp.int32(jnp.iinfo(jnp.int32).min)
                for _ in range(k_pair):
                    mx = jnp.max(best, axis=1, keepdims=True)
                    cols.append(mx)
                    best = jnp.where(best == mx, neg, best)
                out_ref[j] = jnp.concatenate(cols, axis=1)
            else:
                out_ref[j] = _select_cols(
                    scores, slot_map, k_pair=k_pair, width=s_eff, big=big,
                    start=start_ref[gi * bps + j])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("s_eff", "k_pair", "p_tile", "m", "distance", "approx",
                     "slot_mask", "bps", "interpret"))
def scan_blocks_pallas_codes(qvecs, start_all, pen_all, codes, bdiag, *,
                             s_eff, k_pair, p_tile, m, distance,
                             approx=False, slot_mask=0, bps=4,
                             interpret=False):
    """Run the fused code-domain block scan.

    qvecs: [B, p_tile, d_pad] bf16 pre-gathered query tiles (d_pad =
    columns of bdiag — the lane-padded decode width);
    start_all: [B] i32 SLOT starts (16-aligned, pre-clamped);
    pen_all: [B, s_eff] f32 penalty rows incl. all validity masking, in
    DEINTERLEAVED column order (column c = q*(s_eff//g) + r holds slot
    r*g + q — see the caller's staging in ops/onehot_adc.py);
    codes: [cap/g, 128] uint8 packed rows (g = 128//m);
    bdiag: [m*256, d_pad] bf16 block-diagonal decode matrix
    (ops/onehot_adc.blockdiag_codebook, lane-padded) — resident in VMEM.

    Returns combo int32 in ops/pallas_scan.py's exact wire format (the
    pack32 slot bits / exact addresses are true in-window slots).
    """
    b = start_all.shape[0]
    assert b % bps == 0, (b, bps)
    g = 128 // m
    assert codes.shape[1] == g * m == 128, codes.shape
    assert s_eff % g == 0
    _, _, d_pad = qvecs.shape
    assert bdiag.shape == (m * 256, d_pad), (bdiag.shape, m, d_pad)
    big = float(jnp.finfo(jnp.float32).max / 4)
    euclidean = distance == "euclidean"
    if approx:
        n_groups = s_eff
        for grp in ((512, 256, 128) if k_pair > 32 else (128,)):
            if s_eff % grp == 0 and s_eff >= 2 * grp:
                n_groups = grp
                break
        assert s_eff % n_groups == 0, "approx kernel needs pow2 s_eff"
    else:
        n_groups = s_eff
    out_w = k_pair if approx else 2 * k_pair

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bps,),
        in_specs=[
            pl.BlockSpec((bps, p_tile, d_pad), lambda gi, *_: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bps, 1, s_eff), lambda gi, *_: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),    # codes (HBM, DMA'd)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bdiag (resident)
        ],
        out_specs=pl.BlockSpec((bps, p_tile, out_w),
                               lambda gi, *_: (gi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bps, s_eff // g, 128), jnp.uint8),
            pltpu.SemaphoreType.DMA((2, bps)),
        ],
    )
    kernel = _make_kernel(s_eff, k_pair, p_tile, d_pad, m, g, euclidean,
                          big, n_groups, slot_mask, approx, bps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, p_tile, out_w), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100e6)),
    )(start_all.astype(jnp.int32), qvecs, pen_all[:, None, :], codes, bdiag)
