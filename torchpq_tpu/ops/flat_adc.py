"""Flat (exhaustive) ADC scan over the decoded cache.

Reference counterpart: torchpq's high-n_probe operating points (the published
n_probe=128 row of benchmark/turing/sift1m) and the legacy full-list ADC
scorer (kernels/cuda/compute_product.cu). On a GPU, exhaustive ADC needs the
LUT-gather kernel; on TPU the decoded-cache identity (ops/adc.py) turns it
into one dense [nq, d] x [d, cap] matmul sweep — pure MXU, zero gathers, no
probe bookkeeping at all.

Why this exists next to the IVF scans: at high n_probe the IVF scan's cost is
dominated by per-pair bookkeeping (query-tile gathers, partial-top-k unsort,
final merge), while the MXU can brute-force the *entire* cache in comparable
time — recall then equals the full ADC ceiling (the best any probing setting
can reach), i.e. strictly better than any n_probe at similar cost. IVF
pruning (scan_cell_major) remains the win for low/mid n_probe; the index
dispatches on the requested operating point.

The sweep is chunked along the slot axis; each chunk takes a per-query
approximate top-k fused into the matmul epilogue, and chunk winners merge
with one exact top-k at the end (the same two-stage merge as the IVF scans).
"""

import functools

import jax
import jax.numpy as jnp

from .. import config
from .. import util
from ..metric import canonical_distance


@functools.partial(
    jax.jit,
    static_argnames=("k", "distance", "chunk", "approx", "precision"))
def flat_adc_scan(query, decoded, penalty, *, k, distance, chunk=1048576,
                  approx=True, scales=None, precision=None):
    """query: [nq, d] f32 (preprocessed); decoded: [cap, d] bf16/f32/int8
    row-major cache; penalty: [cap] f32 = norms (euclidean) or 0, with BIG at
    empty slots; scales: [cap] f32 per-slot dequant scales (int8 cache only).

    Returns (values [nq, k] f32, addresses [nq, k] i32, -1 padding). Values
    are true similarities (the rank-invariant -|q|^2 euclidean term is added
    after the merge, like the IVF scans).
    """
    distance = canonical_distance(distance)
    nq, d = query.shape
    cap = decoded.shape[0]
    if not approx:
        # the exact path's lax.top_k materializes the [nq, chunk] scores
        # (a full sort, CLAUDE.md) — bound the tile to ~2 GB
        chunk = min(chunk, max(65536, (1 << 29) // max(nq, 1)))
    chunk = min(chunk, cap)
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)

    int8_cache = decoded.dtype == jnp.int8
    if int8_cache:
        assert scales is not None, "int8 cache needs per-slot scales"
        assert distance != "manhattan"
        q_absmax = jnp.maximum(jnp.max(jnp.abs(query), axis=-1), 1e-12)
        q_scale = q_absmax / 127.0  # [nq]
        q_mm = jnp.round(query / q_scale[:, None]).astype(jnp.int8)
    elif decoded.dtype == jnp.bfloat16 and distance != "manhattan":
        q_mm = query.astype(jnp.bfloat16)
    else:
        q_mm = query

    n_chunks = util.cdiv(cap, chunk)
    k_c = min(k, chunk)

    def one(c0):
        # the last chunk is clamped in-bounds; slots it shares with the
        # previous chunk are masked so every slot is scored exactly once
        c0c = jnp.minimum(c0, cap - chunk)
        shift = c0 - c0c
        block = jax.lax.dynamic_slice(decoded, (c0c, 0), (chunk, d))
        pen = jax.lax.dynamic_slice(penalty, (c0c,), (chunk,))
        pen = pen + jnp.where(jnp.arange(chunk) < shift, big, 0.0)
        c0 = c0c
        if distance == "manhattan":
            s = -jnp.sum(
                jnp.abs(query[:, None, :] - block[None, :, :]
                        .astype(query.dtype)), axis=-1)
            s = s - pen[None, :]
        elif int8_cache:
            sc = jax.lax.dynamic_slice(scales, (c0,), (chunk,))
            ab = jax.lax.dot_general(
                q_mm, block, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            factor = 2.0 if distance == "euclidean" else 1.0
            s = ab * (factor * q_scale[:, None] * sc[None, :]) - pen[None, :]
        else:
            ab = jax.lax.dot_general(
                q_mm, block.astype(q_mm.dtype), (((1,), (1,)), ((), ())),
                precision=precision or config.SEARCH_PRECISION,
                preferred_element_type=jnp.float32)
            s = (2.0 * ab if distance == "euclidean" else ab) - pen[None, :]
        if approx and k_c < chunk:
            # NOTE: the default recall_target (0.95) costs ~3% recall@100
            # at 1M scale; raising it to 0.99 was measured 1.7x slower at
            # k=10 and 7x at k=100 — not worth it. Large-k callers are
            # better served by the IVF scan (see the planner note in
            # index/ivfpq.py); flat is the small-k max-recall point.
            v, i = jax.lax.approx_max_k(s, k_c)
        else:
            v, i = jax.lax.top_k(s, k_c)
        return v, (i + c0).astype(jnp.int32)

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    vals, idx = jax.lax.map(one, starts)  # [nch, nq, k_c]
    vals = jnp.moveaxis(vals, 0, 1)  # [nq, nch, k_c]
    idx = jnp.moveaxis(idx, 0, 1)
    kk = min(k, n_chunks * k_c)
    if kk > 32 and n_chunks > 1:
        # per-chunk winners are descending runs (top_k / aggregated
        # approx_max_k emit best-first): merge them with the truncated
        # bitonic tree instead of a full sort over the concatenation
        # (ops/bitonic.py — the deep-k final-merge economy)
        from .adc import _f32_sortable_i32, _sortable_i32_f32
        from . import bitonic
        fk, fa = bitonic.merge_runs_topk(_f32_sortable_i32(vals), idx, kk)
        fv = _sortable_i32_f32(fk)
    else:
        vals = vals.reshape(nq, n_chunks * k_c)
        idx = idx.reshape(nq, n_chunks * k_c)
        fv, fi = jax.lax.top_k(vals, kk)
        fa = jnp.take_along_axis(idx, fi, axis=1)
    alive = fv > -big / 2
    fv = jnp.where(alive, fv, -jnp.inf)
    fa = jnp.where(alive, fa, -1)
    if distance == "euclidean":
        fv = jnp.where(alive,
                       fv - jnp.sum(jnp.square(query), axis=-1)[:, None],
                       -jnp.inf)
    if kk < k:
        fv = jnp.pad(fv, ((0, 0), (0, k - kk)), constant_values=-jnp.inf)
        fa = jnp.pad(fa, ((0, 0), (0, k - kk)), constant_values=-1)
    return fv, fa


@functools.partial(
    jax.jit, static_argnames=("k", "distance", "interpret"))
def _flat_pallas_glue(query, decoded, penalty, *, k, distance,
                      interpret=False):
    """Pad queries to the kernel's tile, run the fused Pallas sweep, and
    finish: the kernel's running top-R is already sorted descending, so the
    head is the answer; apply the deferred -|q|^2 term and dead masking."""
    from .. import util
    from .pallas_flat import flat_scan_pallas
    nq = query.shape[0]
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    q_tile = 512 if nq >= 512 else max(8, 1 << (nq - 1).bit_length())
    q_pad, _ = util.pad_rows(query, q_tile)
    r_keep = min(32, max(8, -(-k // 8) * 8))
    # the kernel requires cap to be a multiple of its window (all DMA
    # offsets then provably 128-aligned); pad dead slots if needed — a
    # no-op for the usual pow2-cell layouts
    w = 2048
    cap = decoded.shape[0]
    pad = (-cap) % w
    if pad:
        decoded = jnp.pad(decoded, ((0, pad), (0, 0)))
        penalty = jnp.pad(penalty, (0, pad), constant_values=big)
    vals, addrs = flat_scan_pallas(
        q_pad.reshape(-1, query.shape[1]), decoded, penalty,
        r_keep=r_keep, distance=distance, q_tile=q_tile, w=w,
        interpret=interpret)
    vals = vals[:nq, :k]
    addrs = addrs[:nq, :k]
    alive = vals > -big / 2
    if distance == "euclidean":
        vals = vals - jnp.sum(jnp.square(query), axis=-1)[:, None]
    vals = jnp.where(alive, vals, -jnp.inf)
    addrs = jnp.where(alive, addrs, -1)
    if k > vals.shape[-1]:
        pad = k - vals.shape[-1]
        vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        addrs = jnp.pad(addrs, ((0, 0), (0, pad)), constant_values=-1)
    return vals, addrs


def flat_adc_auto(query, decoded, penalty, *, k, distance, approx=True,
                  impl="xla", scales=None, interpret=False, precision=None):
    """Dispatch between the two flat sweeps.

    Measured (v5e, 10k queries x 4.2M slots x 128d, k=10): the XLA sweep
    runs 81 ms (~123k q/s) — XLA fuses the PartialReduce epilogue well
    enough that it sits near the matmul roofline. The Pallas kernel
    (ops/pallas_flat.py) is numerically right (1.0000 top-10 agreement)
    but its in-kernel merge degrades into width-1 lane ops and measures
    ~100x slower; it stays as an opt-in experiment (impl="pallas_flat"),
    not a default.
    """
    query = util.pad_cols(query, decoded.shape[-1])  # lane-padded cache
    use_pallas = (
        impl == "pallas_flat" and distance != "manhattan"
        and decoded.dtype != jnp.int8 and k <= 32
        and decoded.shape[0] >= 2048 and approx)
    if use_pallas:
        return _flat_pallas_glue(query, decoded, penalty, k=k,
                                 distance=distance, interpret=interpret)
    return flat_adc_scan(query, decoded, penalty, k=k, distance=distance,
                         approx=approx, scales=scales, precision=precision)
