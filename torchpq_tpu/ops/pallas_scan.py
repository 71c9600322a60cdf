"""Pallas TPU fused IVFPQ block-scan kernel.

Reference counterpart: the fused scan kernels torchpq/kernels/cuda/
ivfpq_topk.cu (per-query ADC LUT in shared memory + streaming top-k). Here
the block decomposition comes from ops/adc.py's cell-major design (sorted
probe pairs packed into blocks of p_tile probers of one cell); this kernel
replaces the XLA `lax.map` block loop, whose per-iteration dynamic-slice
reads measure ~26 GB/s. The kernel:

  * double-buffers the per-block candidate-window DMA (HBM -> VMEM at full
    bandwidth, overlapped with compute); windows are contiguous because
    cells are contiguous segments, and 16-aligned by the container's pow2
    capacity invariant,
  * scores the block with one MXU matmul (bf16 x bf16 -> f32) minus a
    per-slot penalty row (norms + all validity masking, precomputed by the
    caller — 4 B/slot, cheap to stage in XLA),
  * selects the per-prober top-k in VMEM with k unrolled max passes
    (k is small; a sort would be the TPU anti-pattern),
  * writes (order-preserving int32 key, address) pairs, packed exactly like
    the XLA path so the caller's unsort/merge is shared.

The per-query -|q|^2 term (euclidean true-value correction) is rank-
invariant per query and applied by the caller after the final merge.

Numerics match ops/adc.scan_cell_major's exact branch (interpret-mode
parity test in tests/test_pallas_scan.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# the order-preserving f32->i32 bijection must stay bit-exact with the
# XLA path's decoder (adc._sortable_i32_f32) — one definition only
from .adc import _f32_sortable_i32  # noqa: E402


def _make_kernel(s_eff, k_pair, p_tile, d, n_rows, euclidean, big):
    def kernel(start_ref, probers_ref, pen_ref, queries_ref, decoded,
               out_ref, cand_buf, q_buf, sems):
        g = pl.program_id(0)
        n_g = pl.num_programs(0)

        def window_dma(slot, block):
            # starts are multiples of 16 by construction (cell starts are
            # sums of pow2 capacities >= 16); Mosaic needs the hint
            start = pl.multiple_of(start_ref[block], 16)
            return pltpu.make_async_copy(
                decoded.at[pl.ds(start, s_eff), :],
                cand_buf.at[slot], sems.at[slot])

        slot = jax.lax.rem(g, 2)
        nxt = jax.lax.rem(g + 1, 2)

        @pl.when(g == 0)
        def _():
            window_dma(slot, 0).start()

        @pl.when(g + 1 < n_g)
        def _():
            window_dma(nxt, g + 1).start()

        # gather this block's query rows from the VMEM-resident table while
        # the candidate-window DMA is in flight
        def gather_row(i, _):
            row = jnp.clip(probers_ref[0, 0, i], 0, n_rows - 1)
            q_buf[i, :] = queries_ref[row, :]
            return 0

        jax.lax.fori_loop(0, p_tile, gather_row, 0)

        window_dma(slot, g).wait()

        cand = cand_buf[slot]            # [s_eff, d]
        # query table stays f32 in VMEM (bf16 single-row dynamic reads hit
        # Mosaic's 16-sublane alignment); cast the gathered tile for the MXU
        q = q_buf[...].astype(cand.dtype)  # [p_tile, d]
        ab = jax.lax.dot_general(
            q, cand, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [p, s]
        scores = (2.0 * ab if euclidean else ab) - pen_ref[0]  # [1, s] bcast

        start = start_ref[g]
        iota2 = jax.lax.broadcasted_iota(jnp.int32, (p_tile, s_eff), 1)
        key_cols = []
        addr_cols = []
        s = scores
        for _ in range(k_pair):
            mx = jnp.max(s, axis=1, keepdims=True)            # [p, 1]
            hit = s >= mx
            idx = jnp.min(jnp.where(hit, iota2, s_eff), axis=1,
                          keepdims=True)                      # [p, 1]
            alive = mx > -big / 2
            vals = jnp.where(alive, mx, -jnp.inf)
            key_cols.append(_f32_sortable_i32(vals))
            addr_cols.append(jnp.where(alive, start + idx, -1))
            s = jnp.where(iota2 == idx, -jnp.inf, s)
        out_ref[0] = jnp.concatenate(key_cols + addr_cols, axis=1)

    return kernel


# queries table must fit in VMEM next to the window buffers
PALLAS_QUERY_VMEM_BYTES = 6 * 1024 * 1024


@functools.partial(
    jax.jit,
    static_argnames=("s_eff", "k_pair", "p_tile", "distance", "interpret"))
def scan_blocks_pallas(queries, probers, start_all, pen_all, decoded, *,
                       s_eff, k_pair, p_tile, distance, interpret=False):
    """Run the fused block scan. queries: [nq, d] (bf16 preferred; must fit
    VMEM); probers: [B, p_tile] i32 query indices per block (-1 pads are
    clipped — their outputs are dropped by the caller's unsort);
    start_all: [B] i32 (pre-clamped in-bounds, 16-aligned);
    pen_all: [B, s_eff] f32 (per-slot penalty incl. all validity masking);
    decoded: [cap, d].
    Returns combo [B, p_tile, 2*k_pair] int32 (sortable keys | addresses)."""
    b = start_all.shape[0]
    nq, d = queries.shape
    big = float(jnp.finfo(jnp.float32).max / 4)
    euclidean = distance == "euclidean"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, p_tile), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, s_eff), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, p_tile, 2 * k_pair),
                               lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, s_eff, d), decoded.dtype),
            pltpu.VMEM((p_tile, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = _make_kernel(s_eff, k_pair, p_tile, d, nq, euclidean, big)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, p_tile, 2 * k_pair), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100e6)),
    )(start_all.astype(jnp.int32), probers.astype(jnp.int32)[:, None, :],
      pen_all[:, None, :], queries.astype(jnp.float32), decoded)
