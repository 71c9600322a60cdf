"""Pallas TPU fused flat ADC scan: matmul + in-VMEM tournament top-k.

STATUS: numerically correct (1.0000 top-10 agreement vs the exact XLA sweep
at 1M scale) but measured ~100x SLOWER than ops/flat_adc.py on v5e — the
running-merge extraction compiles to width-1 lane operations (each [Tq, 1]
max-extract uses 1 of 128 lanes), and it runs per window. XLA's own
PartialReduce epilogue fuses well enough that the plain sweep sits near the
matmul roofline (81 ms for 10k x 4.2M x 128d), leaving nothing for a custom
kernel to win. Kept as an opt-in experiment (flat_adc_auto impl=
"pallas_flat") and as the record of why this shape of kernel loses on TPU.

Reference counterpart: exhaustive ADC (torchpq's high-recall operating
points; kernels/cuda/compute_product.cu + topk_select.cu do it in two
passes on GPU). The design:

  grid = query tiles; per tile a fori_loop walks the cache in windows of W
  slots with double-buffered HBM->VMEM DMA, and per window:
    * one MXU matmul [Tq, d] x [d, W] (bf16, f32 accumulation),
    * minus the per-slot penalty row (norms + empty masking, like all scans),
    * bucket tournament: the window splits into NB contiguous buckets; each
      contributes its max (one VPU pass) — the same approximation
      approx_max_k makes, with bucket collisions the only recall loss,
    * the NB bucket winners merge into a running top-R via R max-extract
      passes over [Tq, R + NB].

  The kernel emits (values [nq, R], addresses [nq, R]); the caller takes the
  exact top-k of R. Recall: P(two of the true top-k collide in one bucket)
  ~ k^2 * bucket / cap — negligible at 1M scale (bucket=64: ~0.3% for k=10).

Alignment: the caller pads the cache to a multiple of W (penalty BIG on the
pad, so padded slots never win), making every window start a multiple of W —
Mosaic requires lane-dimension DMA offsets provably divisible by 128.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(n_windows, w, nb, bucket, r_keep, tq, d, cap, factor, big):
    def kernel(q_ref, pen_hbm, decoded, val_ref, addr_ref,
               cand_buf, pen_buf, sems, pen_sems):
        def win_start(widx):
            # cap is padded to a multiple of w by the caller — no clamping
            return widx * w

        def start_dma(slot, widx):
            s = pl.multiple_of(win_start(widx), 128)
            cand = pltpu.make_async_copy(
                decoded.at[pl.ds(s, w), :], cand_buf.at[slot], sems.at[slot])
            pen = pltpu.make_async_copy(
                pen_hbm.at[:, pl.ds(s, w)], pen_buf.at[slot],
                pen_sems.at[slot])
            cand.start()
            pen.start()

        def wait_dma(slot):
            pltpu.make_async_copy(decoded.at[pl.ds(0, w), :],
                                  cand_buf.at[slot], sems.at[slot]).wait()
            pltpu.make_async_copy(pen_hbm.at[:, pl.ds(0, w)],
                                  pen_buf.at[slot], pen_sems.at[slot]).wait()

        start_dma(0, 0)
        q = q_ref[...].astype(jnp.bfloat16)  # [tq, d]
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (tq, bucket), 1)
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (tq, r_keep + 2 * nb), 1)

        def body(widx, carry):
            rv, ra = carry  # [tq, r_keep] f32, int32
            slot = jax.lax.rem(widx, 2)

            @pl.when(widx + 1 < n_windows)
            def _():
                start_dma(jax.lax.rem(widx + 1, 2), widx + 1)

            wait_dma(slot)
            cand = cand_buf[slot]  # [w, d] bf16
            pen = pen_buf[slot]    # [1, w]
            ab = jax.lax.dot_general(
                q, cand, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [tq, w]
            w0 = win_start(widx)
            scores = factor * ab - pen

            # bucket tournament: top-2 per bucket (static unroll). Keeping
            # two makes the global top-2 exact and, with ANN data where a
            # query's neighbors cluster inside one cell's contiguous slots,
            # drops the shadowing loss from pair-collisions to the rare
            # triple-in-one-bucket event.
            bvals = []
            baddr = []
            for b in range(nb):
                sub = scores[:, b * bucket:(b + 1) * bucket]  # [tq, bucket]
                mx = jnp.max(sub, axis=1, keepdims=True)
                loc = jnp.min(jnp.where(sub >= mx, iota_b, bucket),
                              axis=1, keepdims=True)
                bvals.append(mx)
                baddr.append(w0 + b * bucket + loc)
                sub2 = jnp.where(iota_b == loc, -jnp.inf, sub)
                mx2 = jnp.max(sub2, axis=1, keepdims=True)
                loc2 = jnp.min(jnp.where(sub2 >= mx2, iota_b, bucket),
                               axis=1, keepdims=True)
                bvals.append(mx2)
                baddr.append(w0 + b * bucket + loc2)
            allv = jnp.concatenate([rv] + bvals, axis=1)  # [tq, r+2nb]
            alla = jnp.concatenate([ra] + baddr, axis=1)

            # R max-extract passes (sum-select: exactly one column matches
            # loc per row — avoids a per-row gather, which Mosaic lacks)
            nrv = []
            nra = []
            for _ in range(r_keep):
                mx = jnp.max(allv, axis=1, keepdims=True)
                loc = jnp.min(jnp.where(allv >= mx, iota_m, r_keep + 2 * nb),
                              axis=1, keepdims=True)
                nrv.append(mx)
                nra.append(jnp.sum(
                    jnp.where(iota_m == loc, alla, 0), axis=1,
                    keepdims=True))
                allv = jnp.where(iota_m == loc, -jnp.inf, allv)
            return (jnp.concatenate(nrv, axis=1),
                    jnp.concatenate(nra, axis=1))

        rv0 = jnp.full((tq, r_keep), -jnp.inf, jnp.float32)
        ra0 = jnp.full((tq, r_keep), -1, jnp.int32)
        rv, ra = jax.lax.fori_loop(0, n_windows, body, (rv0, ra0))
        val_ref[...] = rv
        addr_ref[...] = ra

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("r_keep", "w", "q_tile", "distance", "interpret"))
def flat_scan_pallas(query, decoded, penalty, *, r_keep=16, w=2048,
                     q_tile=512, distance="euclidean", interpret=False):
    """query: [nq, d] f32 (nq a multiple of q_tile — caller pads);
    decoded: [cap, d] bf16/f32; penalty: [cap] f32 (norms/0 + BIG at empty).
    Returns (values [nq, r_keep] f32 DESC, addresses [nq, r_keep] i32);
    dead entries have value <= -BIG/2 (caller masks, then top-k's to k).
    Euclidean values still need the caller's -|q|^2 correction."""
    nq, d = query.shape
    cap = decoded.shape[0]
    assert nq % q_tile == 0 and cap >= w and cap % w == 0
    assert w % 32 == 0, "the bucket tournament covers exactly 32*(w//32) " \
        "slots per window — a non-multiple w would silently drop the tail"
    nb, bucket = 32, w // 32
    n_windows = -(-cap // w)
    big = float(jnp.finfo(jnp.float32).max / 4)
    factor = 2.0 if distance == "euclidean" else 1.0

    kernel = _make_kernel(n_windows, w, nb, bucket, r_keep, q_tile, d, cap,
                          factor, big)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nq // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, d), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, r_keep), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, r_keep), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, w, d), decoded.dtype),
            pltpu.VMEM((2, 1, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vals, addrs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((nq, r_keep), jnp.float32),
                   jax.ShapeDtypeStruct((nq, r_keep), jnp.int32)],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100e6)),
    )(query, penalty[None, :], decoded)
    return vals, addrs
