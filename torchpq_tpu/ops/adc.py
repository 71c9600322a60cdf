"""ADC (asymmetric distance computation) scoring and IVF scan strategies.

Reference counterpart: the fused CUDA scan kernels
(torchpq/kernels/cuda/ivfpq_topk.cu — one thread-block per query, per-query
[m, 256] LUT in shared memory, uchar4 code loads, register-stack streaming
top-k) and their wrappers (torchpq/fn/IVFPQTopk.py).

TPU-first redesign
------------------
The key identity: with LUT[q, i, c] = sim(q_i, B[i, c]) per subvector, the ADC
score of code j is

    score[q, j] = sum_i LUT[q, i, code[j, i]]
                = sim(q, decode(code_j))          (exactly, for inner/cosine,
                                                   and for euclidean via
                                                   2<q,y> - |y|^2 - |q|^2)

i.e. LUT-gather ADC *is* an inner product against the PQ-reconstructed vector.
Gathers are the weakest operation on a TPU while matmuls are its whole reason
to exist, so the flagship scan keeps a bf16 `decoded` cache (+ f32 norms) of
every stored code and scores candidates with MXU matmuls. Recall is bit-for-bit
the PQ recall of the reference (scores agree to fp tolerance; tests verify
against `adc_lookup_scores`, the gather oracle below).

Two scan strategies over the IVF cells (cells live contiguously in one flat
buffer, `cell_start`/`cell_capacity` per cell, like the reference's
CellContainer storage, torchpq/container/CellContainer.py:46-80):

* `scan_query_major` — gathers each query's probed candidates and scores them.
  Gather-bandwidth bound (~candidate bytes per query); best for small batches.
* `scan_cell_major` — inverts the probe lists: probed (query, cell) pairs are
  sorted by cell and packed into fixed-size blocks of up to P_TILE probers of
  one cell; each block is one [P_TILE, d] x [d, S_max] MXU matmul against the
  cell's candidate window. Every cell's candidates are fetched once per query
  batch instead of once per prober, so HBM traffic amortizes over the batch.
  This is the same "group the ragged work by expert" trick as MoE dispatch.

Both return (values [nq, k] f32, addresses [nq, k] int32, address -1 on
padding), and both handle empty slots by masking to -inf exactly like the
reference kernel's is_empty check (ivfpq_topk.cu:874-884).
"""

import functools

import jax
import jax.numpy as jnp

from .. import config
from .. import util
from ..metric import canonical_distance
from . import bitonic

# resolved-impl record of the most recent scan_cell_major TRACE (static
# config -> one trace): {"impl", "k_pair", "s_eff", "d", "bps", "pack32"}.
# Diagnostics only — cached executions don't update it.
LAST_GATE = {}


# ---------------------------------------------------------------------------
# LUT construction + gather oracle (the reference's precompute_adc + scan)
# ---------------------------------------------------------------------------

def build_adc_table(query, codebook, distance, precision=None):
    """Per-subvector query<->centroid similarity table.

    query: [nq, d] (already preprocessed: normalized if cosine)
    codebook: [m, 256, dsub]
    returns LUT [nq, m, 256] float32.

    Reference counterpart: PQCodec.precompute_adc (codec/PQCodec.py:62-75),
    which emits [m, nq, 256]; we keep queries leading internally.
    """
    distance = canonical_distance(distance)
    m, n_clusters, dsub = codebook.shape
    nq = query.shape[0]
    q = query.reshape(nq, m, dsub)
    if distance in ("inner", "cosine"):
        # [nq, m, dsub] x [m, 256, dsub] -> [nq, m, 256]
        return jnp.einsum(
            "qmd,mcd->qmc", q, codebook,
            precision=precision or config.SEARCH_PRECISION,
            preferred_element_type=jnp.float32)
    if distance == "euclidean":
        ab = jnp.einsum(
            "qmd,mcd->qmc", q, codebook,
            precision=precision or config.SEARCH_PRECISION,
            preferred_element_type=jnp.float32)
        q_sq = jnp.sum(jnp.square(q), axis=-1)[:, :, None]
        c_sq = jnp.sum(jnp.square(codebook), axis=-1)[None, :, :]
        return 2.0 * ab - q_sq - c_sq
    if distance == "manhattan":
        # no matmul form; broadcast per subvector (small: nq x m x 256 x dsub)
        return -jnp.sum(
            jnp.abs(q[:, :, None, :] - codebook[None, :, :, :]), axis=-1)
    raise AssertionError(distance)


def adc_lookup_scores(lut, codes, chunk=4096):
    """Gather-oracle ADC: score[q, j] = sum_i lut[q, i, codes[j, i]].

    lut: [nq, m, 256] f32; codes: [n, m] uint8 -> [nq, n] f32.
    This is the literal translation of the reference scan's inner loop
    (ivfpq_topk.cu:650-679) and serves as the correctness oracle for the
    matmul-based paths. Chunked over n to bound the [nq, chunk, m] gather.
    """
    nq, m, k256 = lut.shape
    n = codes.shape[0]
    lut_flat = lut.reshape(nq, m * k256)
    offsets = (jnp.arange(m, dtype=jnp.int32) * k256)[None, :]

    def one_chunk(codes_chunk):
        idx = codes_chunk.astype(jnp.int32) + offsets  # [c, m]
        gathered = jnp.take(lut_flat, idx.reshape(-1), axis=1)
        return jnp.sum(gathered.reshape(nq, -1, m), axis=-1)  # [nq, c]

    if n <= chunk:
        return one_chunk(codes)
    codes_pad, _ = util.pad_rows(codes, chunk)
    blocks = codes_pad.reshape(-1, chunk, m)
    out = jax.lax.map(one_chunk, blocks)  # [nb, nq, chunk]
    return jnp.moveaxis(out, 0, 1).reshape(nq, -1)[:, :n]


# ---------------------------------------------------------------------------
# Decoded-cache scoring primitives
# ---------------------------------------------------------------------------

def _block_scores(qvecs, cand, cand_norms, distance, q_sq=None,
                  precision=None):
    """Score a batch of query tiles against candidate tiles.

    qvecs: [B, P, d] f32, cand: [B, S, d] (bf16 ok), cand_norms: [B, S] f32.
    Returns [B, P, S] f32 similarity.
    """
    precision = precision or config.SEARCH_PRECISION
    # bf16 cache: cast the query down (MXU-native, f32 accumulation) instead
    # of materializing an f32 copy of the much larger candidate block.
    if cand.dtype == jnp.bfloat16 and distance != "manhattan":
        qvecs_mm = qvecs.astype(jnp.bfloat16)
        cand_mm = cand
    else:
        qvecs_mm = qvecs
        cand_mm = cand.astype(qvecs.dtype)
    if distance in ("inner", "cosine"):
        return jnp.einsum("bpd,bsd->bps", qvecs_mm, cand_mm,
                          precision=precision,
                          preferred_element_type=jnp.float32)
    if distance == "euclidean":
        ab = jnp.einsum("bpd,bsd->bps", qvecs_mm, cand_mm,
                        precision=precision,
                        preferred_element_type=jnp.float32)
        if q_sq is None:
            q_sq = jnp.sum(jnp.square(qvecs), axis=-1)
        return 2.0 * ab - cand_norms[:, None, :] - q_sq[:, :, None]
    if distance == "manhattan":
        # VPU path; [B, P, S, d] broadcast — callers keep tiles small.
        return -jnp.sum(
            jnp.abs(qvecs[:, :, None, :] - cand[:, None, :, :].astype(qvecs.dtype)),
            axis=-1)
    raise AssertionError(distance)


# ---------------------------------------------------------------------------
# Query-major scan (latency path)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("k", "distance", "s_max", "q_chunk", "approx",
                     "precision"))
def scan_query_major(query, cells, probe_mask, decoded, norms, is_empty,
                     cell_start, cell_capacity, *, k, distance, s_max,
                     q_chunk=16, approx=False, precision=None):
    """Gather-and-score each query's probed candidate window.

    query: [nq, d] f32 (preprocessed); cells: [nq, n_probe] i32 (distinct per
    row — top_k output); probe_mask: [nq, n_probe] bool (smart-probing mask,
    reference IVFPQIndex.py:499-512); decoded: [cap, d]; norms: [cap];
    is_empty: [cap] bool; s_max: static upper bound on per-cell capacity.
    """
    distance = canonical_distance(distance)
    assert decoded.dtype != jnp.int8, \
        "int8 caches need per-slot scales — use scan_cell_major or the flat sweep"
    query = util.pad_cols(query, decoded.shape[-1])  # lane-padded cache
    nq = cells.shape[0]
    slot_iota = jnp.arange(s_max, dtype=jnp.int32)

    def one_chunk(args):
        q, q_cells, q_mask = args  # [qc, d], [qc, np], [qc, np]
        start = cell_start[q_cells]  # [qc, np]
        capc = cell_capacity[q_cells]
        addr = start[:, :, None] + slot_iota[None, None, :]  # [qc, np, s]
        valid = (slot_iota[None, None, :] < capc[:, :, None]) & q_mask[:, :, None]
        addr = jnp.where(valid, addr, 0)
        flat_addr = addr.reshape(q.shape[0], -1)  # [qc, np*s]
        valid = valid.reshape(q.shape[0], -1) & ~is_empty[flat_addr]
        cand = decoded[flat_addr]  # [qc, np*s, d]
        cand_norms = norms[flat_addr]
        # _block_scores wants [B, P, d]: use B=qc, P=1
        scores = _block_scores(q[:, None, :], cand, cand_norms, distance,
                               precision=precision)
        scores = scores[:, 0, :]  # [qc, np*s]
        scores = jnp.where(valid, scores, -jnp.inf)
        if approx:
            vals, idx = jax.lax.approx_max_k(scores, min(k, scores.shape[-1]))
        else:
            vals, idx = jax.lax.top_k(scores, min(k, scores.shape[-1]))
        addrs = jnp.take_along_axis(flat_addr, idx, axis=1)
        addrs = jnp.where(jnp.isfinite(vals), addrs, -1)
        return vals, addrs

    q_pad, _ = util.pad_rows(query, q_chunk)
    c_pad, _ = util.pad_rows(cells, q_chunk)
    m_pad, _ = util.pad_rows(probe_mask, q_chunk, value=0)
    nb = q_pad.shape[0] // q_chunk
    vals, addrs = jax.lax.map(
        one_chunk,
        (q_pad.reshape(nb, q_chunk, -1),
         c_pad.reshape(nb, q_chunk, -1),
         m_pad.reshape(nb, q_chunk, -1)))
    vals = vals.reshape(-1, vals.shape[-1])[:nq]
    addrs = addrs.reshape(-1, addrs.shape[-1])[:nq]
    if vals.shape[-1] < k:
        pad = k - vals.shape[-1]
        vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        addrs = jnp.pad(addrs, ((0, 0), (0, pad)), constant_values=-1)
    return vals, addrs


# ---------------------------------------------------------------------------
# Cell-major scan (throughput path)
# ---------------------------------------------------------------------------

def _f32_sortable_i32(x):
    """Bijective f32 -> int32 map that preserves ordering (< on floats ==
    < on int32 keys). Standard sign-flip trick; -inf maps near INT32_MIN."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    sign = (u >> 31) == 1
    key = jnp.where(sign, (~u) ^ jnp.uint32(0x80000000), u)
    return jax.lax.bitcast_convert_type(key, jnp.int32)


def _sortable_i32_f32(key):
    """Inverse of _f32_sortable_i32."""
    k = jax.lax.bitcast_convert_type(key, jnp.uint32)
    sign = (key < 0)
    u = jnp.where(sign, (~k) ^ jnp.uint32(0x80000000), k)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


# [nq, n_cells] histogram budget for the counting-rank pack; beyond this
# the argsort fallback wins on memory (e.g. 10k queries x 256k cells)
_COUNTING_PACK_BYTES = 256 * 1024 * 1024

# 16-aligned-row penalty staging budget: the [cap/16, 16] gather operand is
# lane-padded 16 -> 128 by XLA layout assignment (an 8x transient copy of
# the f32 source array — the r4 100M serving failure: 4.61 GB of the
# 5.18 GB AOT temp was exactly this copy). Above the budget the rows are
# staged by per-block 1-D dynamic slices instead (1-D operands never
# re-lay; temp stays at b_max * s_eff). The budget bounds the PADDED copy
# (8x the source): 128 MB of norms -> a 1 GB transient; the 1M bench
# shape (17 MB) keeps the measured-fastest gather staging.
_PEN_GATHER_BYTES = 1 << 27


def _stage_rows16(arr, rows16, b_max, s_eff):
    """[b_max, s_eff] rows of a [cap] f32 array via the 16-aligned row
    gather (fastest staging at bench scale: 16-element rows ride the
    16-slot cell-start alignment, cutting gather descriptors 16x)."""
    a16 = arr.reshape(-1, 16)
    return a16[rows16].reshape(b_max, s_eff)


def _stage_penalty(norms, is_empty, start_c_all, *, s_eff, b_max,
                   block_chunk, distance, big):
    """Per-block penalty rows [b_max, s_eff]: norm-or-BIG with the empty
    mask folded in (the is_empty check of ivfpq_topk.cu:874-884 as one
    additive term). Caller adds the out-of-cell window masking.

    Two stagings, gated by source size (see _PEN_GATHER_BYTES):
    small -> one 16-aligned row gather over the fused [cap] penalty array;
    huge  -> block_chunk-stacked 1-D dynamic slices of norms/is_empty
    (never materializes a [cap] f32 temp either)."""
    euclidean = distance == "euclidean"
    if norms.size * 4 <= _PEN_GATHER_BYTES:
        if euclidean:
            penalty_arr = jnp.where(is_empty, big, norms)
        else:
            penalty_arr = jnp.where(is_empty, big, 0.0)
        rows16 = (start_c_all[:, None] // 16
                  + jnp.arange(s_eff // 16, dtype=jnp.int32)[None, :])
        return _stage_rows16(penalty_arr, rows16, b_max, s_eff)

    def stage_chunk(sc):
        ew = jnp.stack([
            jax.lax.dynamic_slice(is_empty, (sc[i],), (s_eff,))
            for i in range(block_chunk)])
        if euclidean:
            nw = jnp.stack([
                jax.lax.dynamic_slice(norms, (sc[i],), (s_eff,))
                for i in range(block_chunk)])
            return jnp.where(ew, big, nw)
        return jnp.where(ew, big, 0.0)

    nbc = b_max // block_chunk
    pen = jax.lax.map(stage_chunk, start_c_all.reshape(nbc, block_chunk))
    return pen.reshape(b_max, s_eff)


def _stage_block_rows(arr, start_c_all, *, s_eff, b_max, block_chunk):
    """Per-block [b_max, s_eff] windows of a [cap] array, with the same
    size gate as _stage_penalty (16-row gather vs 1-D dynamic slices)."""
    if arr.size * arr.dtype.itemsize <= _PEN_GATHER_BYTES:
        rows16 = (start_c_all[:, None] // 16
                  + jnp.arange(s_eff // 16, dtype=jnp.int32)[None, :])
        return _stage_rows16(arr, rows16, b_max, s_eff)

    def stage_chunk(sc):
        return jnp.stack([
            jax.lax.dynamic_slice(arr, (sc[i],), (s_eff,))
            for i in range(block_chunk)])

    nbc = b_max // block_chunk
    out = jax.lax.map(stage_chunk, start_c_all.reshape(nbc, block_chunk))
    return out.reshape(b_max, s_eff)


def _pack_pairs(cells, probe_mask, *, n_cells, p_tile, b_max):
    """Group probed (query, cell) pairs by cell and pack them into blocks of
    up to p_tile probers of one cell (static shapes throughout; masked
    probes land in the dropped pseudo-block b_max).

    Returns (pair_block, pair_slot, block_cell, probers), all in ORIGINAL
    pair order: pair_block/pair_slot [n_pairs] place each pair in the
    [b_max, p_tile] grid; block_cell [b_max] is each block's cell (-1 pad);
    probers [b_max, p_tile] its query rows.

    Fast path (counting rank): each query's probe list holds DISTINCT
    cells (it's a top-k over cells), so a pair (q, c)'s rank within cell
    c's prober list is exactly the number of queries q' < q that probe c —
    one scatter-add histogram + a cumsum over the query axis, no sort.
    Measured vs the n_pairs argsort at the 1M bench shape: 18 ms -> ~3 ms
    at 320k pairs, 67 ms -> ~4 ms at 1.28M pairs. The argsort remains as
    the fallback when the [nq, n_cells] histogram would be too large.
    """
    nq, n_probe = cells.shape
    n_pairs = nq * n_probe
    # the counting pack's fixed cost is the [nq, n_cells] histogram cumsum;
    # the argsort's grows with n_pairs. Measured crossover at the 1M bench
    # shape (nq=10k, 4096 cells): argsort wins at n_probe=8 (8.6 vs 12.8 ms),
    # counting wins at n_probe=32 (18 -> ~13 ms) and 128 (67 -> ~13 ms).
    if (nq * n_cells * 4 <= _COUNTING_PACK_BYTES
            and n_cells <= 256 * n_probe):
        live = probe_mask
        safe_cells = jnp.where(live, cells, 0)
        q_rows = jnp.broadcast_to(
            jnp.arange(nq, dtype=jnp.int32)[:, None], cells.shape)
        # compare-reduce histogram: the scatter-add formulation costs
        # ~45 ns/pair on TPU (scatters don't vectorize); the [nq, n_probe,
        # n_cells] compare fuses into its sum and runs on the VPU. Counts
        # <= n_probe are exact in bf16 up to 256 (halves matmul bytes).
        cell_ids = jnp.arange(n_cells, dtype=jnp.int32)
        hdtype = jnp.bfloat16 if n_probe <= 256 else jnp.float32
        hist = jnp.sum(
            (cells[:, :, None] == cell_ids[None, None, :])
            & live[:, :, None], axis=1, dtype=hdtype)
        # exclusive cumsum over the query axis as a strict-lower-triangular
        # MXU matmul per 128-query block + tiny block-offset cumsum: the
        # direct jnp.cumsum over [nq, n_cells] i32 measured ~10 ms at the
        # 1M bench shape, the matmul form is traffic-bound (~1 ms). Exact:
        # inputs are small integers (bf16-exact <= 256), accumulation f32
        # (exact <= 2^24 = 16M queries).
        blk = 128
        nq_pad = util.round_up(nq, blk)
        hist_p = (jnp.pad(hist, ((0, nq_pad - nq), (0, 0)))
                  if nq_pad != nq else hist)
        hb = hist_p.reshape(nq_pad // blk, blk, n_cells)
        tril_strict = jnp.tril(
            jnp.ones((blk, blk), hdtype), k=-1)
        excl_b = jnp.einsum("rs,bsc->brc", tril_strict, hb,
                            preferred_element_type=jnp.float32)
        tots = jnp.sum(hb, axis=1, dtype=jnp.float32)  # [nb, n_cells]
        offs = jnp.cumsum(tots, axis=0) - tots  # exclusive block offsets
        excl = (excl_b + offs[:, None, :]).reshape(
            nq_pad, n_cells)[:nq].astype(jnp.int32)
        cell_count = (offs[-1] + tots[-1]).astype(jnp.int32)
        # exclusive cumsum at (q, c) = rank of q among c's probers
        rank = jnp.take_along_axis(excl, safe_cells, axis=1)
        blocks_per_cell = util.cdiv(cell_count, p_tile)
        block_offset = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(blocks_per_cell)[:-1]])
        pair_block = jnp.where(
            live, block_offset[safe_cells] + rank // p_tile,
            jnp.int32(b_max)).reshape(-1)
        pair_slot = (rank % p_tile).reshape(-1)
        flat_cells = cells.reshape(-1)
        flat_q = q_rows.reshape(-1)
    else:
        flat_cells = jnp.where(probe_mask.reshape(-1), cells.reshape(-1),
                               jnp.int32(n_cells))  # masked probes sort last
        flat_q = jnp.repeat(jnp.arange(nq, dtype=jnp.int32), n_probe)
        order = jnp.argsort(flat_cells)
        sorted_cells = flat_cells[order]
        # rank of each pair within its cell's prober list
        cell_first = jnp.searchsorted(sorted_cells, jnp.arange(n_cells),
                                      side="left").astype(jnp.int32)
        cell_count = (jnp.searchsorted(sorted_cells, jnp.arange(n_cells),
                                       side="right").astype(jnp.int32)
                      - cell_first)
        pair_idx = jnp.arange(n_pairs, dtype=jnp.int32)
        safe_cell = jnp.minimum(sorted_cells, n_cells - 1)
        rank = pair_idx - cell_first[safe_cell]
        blocks_per_cell = util.cdiv(cell_count, p_tile)
        block_offset = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(blocks_per_cell)[:-1]])
        pb_sorted = jnp.where(sorted_cells < n_cells,
                              block_offset[safe_cell] + rank // p_tile,
                              jnp.int32(b_max))  # invalid pairs -> dropped
        ps_sorted = rank % p_tile
        # back to original pair order (the merge consumes original order)
        inv = jnp.zeros((n_pairs,), jnp.int32).at[order].set(
            jnp.arange(n_pairs, dtype=jnp.int32))
        pair_block = pb_sorted[inv]
        pair_slot = ps_sorted[inv]

    block_cell = jnp.full((b_max,), -1, jnp.int32).at[pair_block].set(
        flat_cells, mode="drop")
    probers = jnp.full((b_max, p_tile), -1, jnp.int32).at[
        pair_block, pair_slot].set(flat_q, mode="drop")
    return pair_block, pair_slot, block_cell, probers


def _block_select(scores, start_c, *, k_pair, s_eff, approx, pack32,
                  slot_mask, key_neg_big, big):
    """Per-block top-k_pair select + wire-format pack. scores: [bc, p, s];
    start_c: [bc] window starts. pack32 emits one int32 per candidate (top
    (32 - slot_bits) bits of the order-preserving key | in-window slot —
    the value loses slot_bits mantissa bits, ~2^-11 relative, far below
    bf16 scoring noise; the address is rebuilt as start[pair] + slot after
    the final merge). Exact emits (key, address) int32 pairs so the unsort
    permutation still moves ONE array."""
    if approx and k_pair < s_eff:
        vals, idx = jax.lax.approx_max_k(scores, k_pair)
    else:
        vals, idx = jax.lax.top_k(scores, k_pair)
    alive = vals > -big / 2
    if pack32:
        key = _f32_sortable_i32(vals)
        packed = (key & jnp.int32(~slot_mask)) | idx
        return jnp.where(alive, packed, key_neg_big)
    vals = jnp.where(alive, vals, -jnp.inf)
    baddr = start_c[:, None, None] + idx  # address is arithmetic
    baddr = jnp.where(alive, baddr, -1)
    return jnp.concatenate([_f32_sortable_i32(vals), baddr], axis=-1)


def _merge_pairs(combo, query, pair_block, pair_slot, start_c_all, *,
                 b_max, p_tile, k, k_pair, nq, n_probe, pack32, slot_mask,
                 key_neg_big, distance, big, merge_taper=None):
    """Unsort per-pair partial top-ks back to original pair order (one
    row-gather — pair_block/pair_slot are already in original pair order)
    and run the final per-query merge. combo: [b_max, p_tile, k_pair]
    pack32 int32 or [b_max, p_tile, 2*k_pair] (keys ++ addresses).
    Returns (vals, addrs)."""
    bo = pair_block
    so = pair_slot
    live = bo < b_max
    bo_safe = jnp.minimum(bo, b_max - 1)
    kk = min(k, n_probe * k_pair)

    if pack32:
        pair_start = jnp.where(live, start_c_all[bo_safe], 0)  # [n_pairs]
        starts_q = pair_start.reshape(nq, n_probe)
        # selection on the decoded (noisy-low-bits) values — monotone in the
        # packed keys, so ranking matches an int32 sort of the keys.
        # approx_max_k's recall model assumes winners spread uniformly, but
        # these keys are descending runs of k_pair with the best pairs first
        # (cells arrive coarse-ranked) — heavily clustered, so its binning
        # loses true neighbors and recall@100 DROPPED as n_probe grew
        # (measured 0.822/0.807/0.790 at n_probe 32/64/128 on the 1M class
        # sweep). Exact top_k for k > 32 restores monotone deep-k recall;
        # k <= 32 keeps approx (k_pair == k runs are short, loss unmeasurable
        # — cell-major n_probe=128 @k=10 beats even the flat sweep's recall).
        taper = None
        if (merge_taper is not None and kk > 32
                and n_probe > merge_taper[0]
                and merge_taper[1] < k_pair):
            # rank-tapered merge input (deep-k throughput knob): pairs
            # arrive coarse-rank-ordered, so tail pairs rarely hold deep
            # winners — keep all k_pair columns for the first p0 pairs and
            # kp_tail for the rest. ANN-semantics knob like probe_cap
            # (sweeps record recall per row); the reference's streaming
            # merge pays ~nothing per candidate (ivfpq_topk.cu:763-819),
            # this is the TPU-shaped economy of the same idea.
            p0, kp_tail = merge_taper
            kp_tail = max(kp_tail, util.cdiv(
                max(kk - p0 * k_pair, 0), max(n_probe - p0, 1)))
            taper = (p0, kp_tail)
        # flattened row index: XLA lowers the 1-D row gather measurably
        # faster than the equivalent 2-D [bo, so] gather
        tbl = combo.reshape(b_max * p_tile, k_pair)
        rows = (bo_safe * p_tile + so).reshape(nq, n_probe)
        live2 = live.reshape(nq, n_probe)
        if taper is not None:
            p0, kp_tail = taper
            # taper-aware SPLIT unsort: tail pairs only ever contribute
            # their first kp_tail columns to the merge, so gather them at
            # kp_tail width from a pre-sliced table instead of unsorting
            # every pair at full k_pair width and slicing afterwards.
            # Cuts the unsort-gather payload (the dominant XLA glue cost
            # at deep k) by ~k_pair/kp_tail on (n_probe-p0)/n_probe of
            # the rows; results are bit-identical to the full gather.
            head = jnp.where(live2[:, :p0, None], tbl[rows[:, :p0]],
                             key_neg_big)
            tail = jnp.where(live2[:, p0:, None],
                             tbl[:, :kp_tail][rows[:, p0:]], key_neg_big)
            keys_t = jnp.concatenate(
                [head.reshape(nq, p0 * k_pair),
                 tail.reshape(nq, (n_probe - p0) * kp_tail)], axis=1)
            col2probe = jnp.concatenate([
                jnp.arange(p0 * k_pair, dtype=jnp.int32) // k_pair,
                p0 + jnp.arange((n_probe - p0) * kp_tail,
                                dtype=jnp.int32) // kp_tail])
            sel = _sortable_i32_f32(keys_t)
            fvs, fi = jax.lax.top_k(sel, min(kk, keys_t.shape[-1]))
            packed_w = jnp.take_along_axis(keys_t, fi, axis=1)
            start_w = jnp.take_along_axis(starts_q, col2probe[fi], axis=1)
            alive = fvs > -big / 2
            kk = min(kk, keys_t.shape[-1])
        else:
            keys = jnp.where(live2[:, :, None], tbl[rows],
                             key_neg_big).reshape(nq, n_probe * k_pair)
            if kk < keys.shape[-1] and kk <= 32:
                sel = _sortable_i32_f32(keys)
                fvs, fi = jax.lax.approx_max_k(sel, kk)
                packed_w = jnp.take_along_axis(keys, fi, axis=1)
                start_w = jnp.take_along_axis(starts_q, fi // k_pair, axis=1)
                alive = fvs > -big / 2
            elif n_probe * k_pair < 2048:
                # deep k, narrow merges: the per-pair lists are descending
                # runs (top_k / aggregated approx_max_k emit winners
                # best-first), so merge them with a truncated bitonic tree —
                # the TPU counterpart of the reference's in-register
                # streaming merge (ivfpq_topk.cu:763-931). Packed keys can
                # hold local inversions where masked values tie (order falls
                # to the slot bits), but an int32 comparator refines the
                # masked-key order, so the merged top-kk is exact in
                # masked-key space — the same space lax.top_k over the
                # decoded keys ranked in.
                packed_w, pidx = bitonic.merge_runs_topk(
                    keys.reshape(nq, n_probe, k_pair),
                    jnp.broadcast_to(
                        jnp.arange(n_probe, dtype=jnp.int32)[None, :, None],
                        (nq, n_probe, k_pair)), kk)
                start_w = jnp.take_along_axis(starts_q, pidx, axis=1)
                alive = _sortable_i32_f32(packed_w) > -big / 2
            else:
                # deep k, wide merges: past ~2k columns lax.top_k's single
                # fused sort beats the bitonic tree's log2(runs) full-width
                # rounds (measured [10k, 4096]: 39.9 ms vs 62.4 ms; [10k,
                # 2048]: 24.4 vs 27.5 — r4 profile_deepk). Same exactness
                # argument: top_k ranks the masked-key space.
                sel = _sortable_i32_f32(keys)
                fvs, fi = jax.lax.top_k(sel, kk)
                packed_w = jnp.take_along_axis(keys, fi, axis=1)
                start_w = jnp.take_along_axis(starts_q, fi // k_pair, axis=1)
                alive = fvs > -big / 2
        slot = packed_w & jnp.int32(slot_mask)
        fv = _sortable_i32_f32(packed_w & jnp.int32(~slot_mask))
        fa = jnp.where(alive, start_w + slot, -1)
        fv = jnp.where(alive, fv, -jnp.inf)
    else:
        pc = combo.reshape(b_max * p_tile, 2 * k_pair)[
            bo_safe * p_tile + so]  # [n_pairs, 2k], orig order
        neg = jnp.int32(jnp.iinfo(jnp.int32).min)
        fill = jnp.concatenate([jnp.full(k_pair, neg, jnp.int32),
                                jnp.full(k_pair, -1, jnp.int32)])
        out = jnp.where(live[:, None], pc, fill[None, :])

        # ---- final exact merge per query ----
        out = out.reshape(nq, n_probe, 2 * k_pair)
        if kk > 32 and n_probe * k_pair < 2048:
            # bitonic run-merge (see pack32 branch): here the keys are
            # bit-exact sortable values and the runs truly descending,
            # so the merge is exact. Wide merges (>= 2048 cols) fall to
            # the top_k branch below — the single fused sort is faster
            # there (r4 profile_deepk).
            fk, fa = bitonic.merge_runs_topk(
                out[:, :, :k_pair], out[:, :, k_pair:], kk)
        else:
            keys = out[:, :, :k_pair].reshape(nq, n_probe * k_pair)
            addrs = out[:, :, k_pair:].reshape(nq, n_probe * k_pair)
            fk, fi = jax.lax.top_k(keys, kk)
            fa = jnp.take_along_axis(addrs, fi, axis=1)
        fv = _sortable_i32_f32(fk)
        fa = jnp.where(jnp.isfinite(fv), fa, -1)
        fv = jnp.where(jnp.isfinite(fv), fv, -jnp.inf)

    if distance == "euclidean":
        # rank-invariant per-query correction deferred from the hot loop
        fv = jnp.where(jnp.isfinite(fv),
                       fv - jnp.sum(jnp.square(query), axis=-1)[:, None],
                       fv)
    if kk < k:
        fv = jnp.pad(fv, ((0, 0), (0, k - kk)), constant_values=-jnp.inf)
        fa = jnp.pad(fa, ((0, 0), (0, k - kk)), constant_values=-1)
    return fv, fa

@functools.partial(
    jax.jit,
    static_argnames=("k", "distance", "s_max", "n_cells", "p_tile",
                     "block_chunk", "approx", "impl", "interpret", "group",
                     "precision", "k_pair", "probe_cap", "merge_taper",
                     "pre_grouped"))
def scan_cell_major(query, cells, probe_mask, decoded, norms, is_empty,
                    cell_start, cell_capacity, *, k, distance, s_max, n_cells,
                    p_tile=128, block_chunk=8, approx=False, impl="xla",
                    interpret=False, group=1, scales=None, precision=None,
                    k_pair=None, probe_cap=None, merge_taper=None,
                    pre_grouped=False):
    """Inverted-probe-list grouped-matmul scan.

    Probed (query, cell) pairs are sorted by cell and packed into blocks of up
    to `p_tile` probers of a single cell. Each block runs one
    [p_tile, d] @ [d, s_max] matmul on the MXU against the cell's candidate
    window, takes a per-prober top-k, and the per-pair partial top-ks are
    unsorted back to [nq, n_probe, k] for a final exact merge — the same
    two-stage structure as the reference kernel's per-thread stacks + final
    bitonic merge (ivfpq_topk.cu:763-931), with the raggedness handled by
    sort/pack instead of thread divergence.

    Performance notes (measured on v5e):
    * every mask folds into ONE [bc, s] per-slot penalty added in the same
      pass as the -|y|^2 norms term; no [bc, p, s] elementwise mask passes
      (they cost ~3x the matmul itself);
    * candidate addresses are arithmetic (cell_start + slot), never gathered;
    * the per-row -|q|^2 constant doesn't affect ranking, so it's applied to
      the k winners after top-k (reference keeps true similarity values);
    * exact jax.lax.top_k over the s-dim is a full sort on TPU (~13x the
      matmul cost at s=2048); approx=True uses the TPU-native approx_max_k.
    """
    distance = canonical_distance(distance)
    # lane-padded decoded cache (d rounded up to 128 at d > 128): zero
    # columns are score-invisible; pad the queries to match
    query = util.pad_cols(query, decoded.shape[-1])
    nq, n_probe = cells.shape
    d = query.shape[-1]
    n_pairs = nq * n_probe

    # ---- supercell grouping ----
    # Adjacent cells are contiguous in storage, so a group of `group` cells
    # is one contiguous window: grouping cuts the block count (and the number
    # of window DMAs, which are latency-bound) by ~`group` at the cost of
    # scoring `group`x more candidates per probe — all of them *valid*
    # neighbors with correct scores and addresses, so recall only improves.
    if group > 1:
        n_super = util.cdiv(n_cells, group)
        super_start = cell_start[::group]  # [n_super]
        cap_total_ = decoded.shape[0]
        super_cap = jnp.diff(jnp.concatenate(
            [super_start, jnp.array([cap_total_], super_start.dtype)]))
        if pre_grouped:
            # `cells` already holds DISTINCT supercell ids per query (the
            # caller probed supercells directly: group-max coarse scores +
            # one top-cap select — index._coarse_probe_super). The whole
            # cell-level dedup + probe-cap preprocessing (two [nq, np]
            # argsorts / a quadratic compare) vanishes.
            cells = jnp.where(probe_mask, cells, n_super).astype(jnp.int32)
            probe_mask = cells < n_super
            sup = None
        else:
            sup = jnp.where(probe_mask, cells // group, n_super)
        # rank-preserving first-occurrence dedup (two probed cells may
        # share a supercell), so surviving entries keep their coarse rank
        if pre_grouped:
            pass
        elif n_probe <= 128:
            # [np, np] strict-lower compare per row — VPU-trivial at this
            # width, no sort. (r5 tried dropping the threshold to 64 —
            # the stable-sort path at n_probe=128 measured SLOWER on the
            # bench: np=128 k=10 85.4k -> 72.1k q/s; reverted.)
            prior = jnp.tril(jnp.ones((n_probe, n_probe), bool), k=-1)
            dup = jnp.any((sup[:, :, None] == sup[:, None, :]) & prior[None],
                          axis=-1)
        else:
            # large n_probe: the quadratic intermediate ([nq, np, np])
            # would dominate — stable value-sort instead. Stable argsort
            # keeps equal values in original (rank) order, so the first
            # element of each equal run IS the first occurrence by rank;
            # unsort the run-start mask back to probe positions.
            order = jnp.argsort(sup, axis=1, stable=True)
            s_sorted = jnp.take_along_axis(sup, order, axis=1)
            dup_sorted = jnp.concatenate(
                [jnp.zeros((sup.shape[0], 1), bool),
                 s_sorted[:, 1:] == s_sorted[:, :-1]], axis=1)
            inv = jnp.argsort(order, axis=1)
            dup = jnp.take_along_axis(dup_sorted, inv, axis=1)
        if not pre_grouped:
            cells = jnp.where(dup, n_super, sup).astype(jnp.int32)
            probe_mask = cells < n_super
        if not pre_grouped and probe_cap is not None and probe_cap < n_probe:
            # static probe-axis truncation: keep each query's best-ranked
            # `probe_cap` DISTINCT supercells. With locality-ordered cell
            # ids (util.locality_order) a query's n_probe cells collapse
            # into ~n_probe/group supercells, so a 2x-slack cap drops
            # nothing for most queries while shrinking every static
            # downstream cost (block grid, unsort gather, merge width)
            # by n_probe/probe_cap. ANN-semantics knob: the scanned set
            # is the top probe_cap windows of `group` cells each.
            key = jnp.where(probe_mask,
                            jnp.arange(n_probe, dtype=jnp.int32)[None, :],
                            jnp.int32(n_probe))
            order = jnp.argsort(key, axis=1)[:, :probe_cap]
            cells = jnp.take_along_axis(cells, order, axis=1)
            probe_mask = jnp.take_along_axis(probe_mask, order, axis=1)
            n_probe = probe_cap
            n_pairs = nq * n_probe
        cell_start = super_start
        cell_capacity = super_cap
        n_cells = n_super
        s_max = min(s_max * group, cap_total_)

    # Per-pair candidate count. Exact mode needs k_pair = k (one cell may
    # hold every winner). Approx mode caps it: the expected winners per
    # probed cell is k / n_probe, so carrying a 4x oversample through the
    # unsort/merge keeps recall while shrinking the merge payload — this is
    # what makes large-k probed searches viable (the reference's streaming
    # in-kernel merge never materializes per-pair lists at all,
    # ivfpq_topk.cu:763-931; this is the TPU-shaped equivalent economy).
    # Floor 64 measured on 1M manifold data at k=100/np=32: recall@100
    # 0.794/0.814/0.826/0.826 at k_pair 16/32/64/100 — small floors are
    # too greedy (the best probed cell often holds tens of winners); 64 is
    # the knee and costs nothing vs 100 (99 vs 110 ms). Callers chasing
    # speed at large k can pass k_pair explicitly.
    # Ceiling 64 (not just floor): k_pair > 64 fails the Pallas kernel gate,
    # silently flipping the scan to XLA mid-curve — the r3 class sweep's
    # np=4/k=100 69.4k q/s anomaly (np in {1,2,4} ran XLA at 2.4x the
    # latency because 4*ceil(k/np) crossed 64, np >= 8 ran the kernel).
    # Free by the measurement above: recall@100 is flat 64 -> 100.
    if k_pair is None:
        k_pair = 64 if (approx and k > 64) else k
        # completeness floor (ADVICE r4 #2): kk = min(k, n_probe * k_pair)
        # must reach k whenever enough candidates exist — n_probe=1, k=100
        # under a flat 64 ceiling would return 64 results + 36 pad rows.
        # Only n_probe < ceil(k/64) lifts the ceiling (and may flip the
        # Pallas gate off — correctness beats the kernel there).
        k_pair = max(k_pair, min(k, util.cdiv(k, n_probe)))
    k_pair = min(k_pair, k, s_max, decoded.shape[0])
    # static block budget: sum_c ceil(P_c / p_tile) <= distinct_cells + P/p_tile
    b_max = min(n_cells, n_pairs) + util.cdiv(n_pairs, p_tile)
    b_max = util.round_up(b_max, block_chunk)

    # ---- pack pairs into blocks (all static-shape) ----
    pair_block, pair_slot, block_cell, probers = _pack_pairs(
        cells, probe_mask, n_cells=n_cells, p_tile=p_tile, b_max=b_max)

    # ---- score blocks ----
    # TPU gathers run at ~1 GB/s while contiguous dynamic-slices run at HBM
    # speed. Cells are contiguous segments, so every candidate-side load is a
    # dynamic_slice at cell_start; the only true gather left is the per-block
    # query tile (rows from a small VMEM-resident table). All validity folds
    # into ONE [s] penalty term read from a precomputed [cap] array
    # (norm-or-BIG), applied in the same pass as the matmul epilogue.
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    cell_all = jnp.maximum(block_cell, 0)
    qidx_all = jnp.maximum(probers, 0)
    int8_cache = decoded.dtype == jnp.int8
    assert not (int8_cache and distance == "manhattan"), \
        "int8 caches cannot score manhattan (no dequant in the L1 path)"
    if int8_cache:
        # symmetric per-query / per-slot int8 quantization: the candidate
        # dequant scale rides the same per-slot stream as the penalty; the
        # per-query scale multiplies whole rows (applied in the epilogue)
        assert scales is not None, "int8 cache needs per-slot scales"
        mm_dtype = jnp.int8
        q_absmax = jnp.maximum(jnp.max(jnp.abs(query), axis=-1), 1e-12)
        q_scale_all = (q_absmax / 127.0)  # [nq]
        query_q = jnp.round(query / q_scale_all[:, None]).astype(jnp.int8)
    else:
        mm_dtype = (decoded.dtype if decoded.dtype == jnp.bfloat16
                    else query.dtype)
        query_q = query
        q_scale_all = None
    start_all = cell_start[cell_all]  # [B]
    cap_all = cell_capacity[cell_all]  # [B]
    if distance == "euclidean":
        penalty_arr = jnp.where(is_empty, big, norms)  # [cap], one pass
    else:
        penalty_arr = jnp.where(is_empty, big, 0.0)
    slot_iota = jnp.arange(s_max, dtype=jnp.int32)

    cap_total = decoded.shape[0]
    s_eff = min(s_max, cap_total)
    d_dec = decoded.shape[1]
    start_c_all = jnp.clip(start_all, 0, cap_total - s_eff)
    off_all = start_all - start_c_all

    # NOTE: the per-query -|q|^2 euclidean correction is rank-invariant per
    # query; both impls skip it in the hot loop and the final merge applies
    # it to the k winners.

    # pack32: one int32 per candidate (truncated sortable value | slot)
    # instead of (key, addr) pairs — halves the unsort-gather payload. The
    # value loses log2(s_pow2) mantissa bits, well below bf16 scoring noise;
    # only engaged in approx mode (exact mode keeps bit-exact values).
    s_pow2 = util.next_pow2(s_eff)
    pack32 = approx and s_pow2 <= 4096
    slot_mask = s_pow2 - 1
    key_neg_big = _f32_sortable_i32(-big) & jnp.int32(~slot_mask)

    from .pallas_scan import PALLAS_WINDOW_VMEM_BYTES
    # blocks per grid step amortize the ~4 us/step pipeline overhead; the
    # kernel's double-buffered candidate scratch is 2 * bps windows of
    # [s_eff, d_dec], so shrink bps (pow2 — any bps | block_chunk is safe)
    # until the scratch fits the VMEM budget (wide windows / d=960 caches
    # run at bps=1 instead of falling back to XLA).
    bps = 4
    while bps > 1 and (2 * bps * s_eff * d_dec * decoded.dtype.itemsize
                       > PALLAS_WINDOW_VMEM_BYTES):
        bps //= 2
    # b_max is only rounded to block_chunk; the kernel needs bps | b_max
    import math
    bps = math.gcd(bps, block_chunk)
    interpret = interpret or config.PALLAS_INTERPRET
    use_pallas = (
        impl in ("pallas", "auto") and distance != "manhattan"
        and k_pair <= 64
        # the in-kernel scratch slice cand_buf[slot, j] needs a lane-
        # aligned trailing dim (Mosaic: "Slice shape along dimension 1
        # must be aligned to tiling (128)") — d=64/960 caches take XLA;
        # interpret mode has no tiling (parity tests run d=32)
        and (d_dec % 128 == 0 or interpret)
        # the double-buffered candidate windows must fit VMEM
        and 2 * bps * s_eff * d_dec * decoded.dtype.itemsize
        <= PALLAS_WINDOW_VMEM_BYTES
        # the approx kernel's strided group reduce needs a window the
        # G=128 groups divide (compacted layouts use multiples of 128;
        # tiny pow2 windows skip the reduce), and pack32 as wire format
        and (not approx or (pack32 and (s_eff % 128 == 0
                                        or (s_pow2 == s_eff
                                            and s_eff < 128)))))
    # trace-time gate record (one trace per static config): lets benchmarks
    # and sweeps RECORD which impl actually served a shape instead of
    # trusting impl="auto" — VERDICT r2 found the best kernel silently
    # unused because nothing surfaced the resolved choice
    LAST_GATE.clear()
    LAST_GATE.update(impl="pallas" if use_pallas else "xla",
                     k_pair=k_pair, s_eff=s_eff, d=d_dec, bps=bps,
                     pack32=pack32, cache=str(decoded.dtype))
    if impl == "pallas" and not use_pallas:
        import warnings
        warnings.warn(
            "scan_cell_major: impl='pallas' requested but the kernel gate "
            f"fails (k_pair={k_pair}<=64? dist={distance}!=manhattan? "
            f"d={d_dec}%128==0? window 2*{bps}*{s_eff}*{d_dec}*"
            f"{decoded.dtype.itemsize} <= {PALLAS_WINDOW_VMEM_BYTES}B? "
            f"approx needs pow2 s_eff<=4096, got {s_eff}) — falling back "
            "to XLA", stacklevel=2)

    if use_pallas:
        from .pallas_scan import (scan_blocks_pallas, QTABLE_VMEM_BYTES,
                                  QTABLE_MAC_RATIO)

        # stage the per-block penalty rows in XLA (4 B/slot; an in-kernel
        # penalty DMA is impossible — 1-D HBM memrefs carry 1024-element
        # tiling, cell starts are only 16-aligned). A row gather over the
        # 16-aligned reshape measured fastest (5.6 ms vs 10.3 map-slice vs
        # 22.3 flat elementwise gather at b_max=4728); huge caches flip to
        # 1-D dynamic slices inside _stage_penalty (layout-wall guard).
        pen_all = _stage_penalty(
            norms, is_empty, start_c_all, s_eff=s_eff, b_max=b_max,
            block_chunk=block_chunk, distance=distance, big=big)
        in_cell = ((slot_iota[None, :s_eff] >= off_all[:, None])
                   & (slot_iota[None, :s_eff] < (off_all + cap_all)[:, None]))
        pen_all = pen_all + jnp.where(in_cell, 0.0, big)
        if int8_cache:
            # per-slot dequant scales ride the same staging as the
            # penalty; per-prober query scales ride a tiny row gather
            mm_cast = jnp.int8
            q_src = query_q
            scales_all = _stage_block_rows(
                scales, start_c_all, s_eff=s_eff, b_max=b_max,
                block_chunk=block_chunk)
            q_scales = q_scale_all[qidx_all]  # [B, p_tile]
        else:
            mm_cast = (decoded.dtype if decoded.dtype == jnp.bfloat16
                       else query.dtype)
            q_src = query_q.astype(mm_cast)
            scales_all = q_scales = None
        # resident-qtable mode: when the whole query table fits the VMEM
        # budget and the one-hot fetch MACs stay within QTABLE_MAC_RATIO
        # of the score matmul, skip the [B, p_tile, d] XLA query-tile
        # gather entirely and let the kernel fetch rows on the MXU (the
        # d=960 glue fix — r4 VERDICT #2). Otherwise pre-gather tiles in
        # XLA (small-table row gather) in the matmul dtype — casting the
        # query table BEFORE the gather halves the gather's read traffic.
        nq_pad = util.round_up(nq, 128)
        use_qtable = (
            nq_pad * d_dec * jnp.dtype(mm_cast).itemsize <= QTABLE_VMEM_BYTES
            and nq_pad <= QTABLE_MAC_RATIO * s_eff)
        LAST_GATE["qtable"] = use_qtable
        if use_qtable:
            qtab, _ = util.pad_rows(q_src, 128)
            combo = scan_blocks_pallas(
                None, start_c_all, pen_all, decoded,
                s_eff=s_eff, k_pair=k_pair, p_tile=p_tile, distance=distance,
                approx=pack32, slot_mask=slot_mask, bps=bps,
                interpret=interpret, scales_all=scales_all,
                q_scales=q_scales, qtable=qtab, probers_all=qidx_all)
        else:
            qvecs_p = q_src[qidx_all]
            combo = scan_blocks_pallas(
                qvecs_p, start_c_all, pen_all, decoded,
                s_eff=s_eff, k_pair=k_pair, p_tile=p_tile, distance=distance,
                approx=pack32, slot_mask=slot_mask, bps=bps,
                interpret=interpret, scales_all=scales_all,
                q_scales=q_scales)
    else:
        qvecs_all = query_q.astype(
            mm_dtype if distance != "manhattan" else query.dtype
        )[qidx_all]  # [B,p,d] — cast before the gather (halves read bytes)

        def one_chunk(args):
            # block_chunk blocks per scan iteration: the scan loop's
            # per-step operand DMAs don't pipeline (measured ~26 GB/s
            # effective), so bigger steps amortize the stall
            if int8_cache:
                qvecs, start_c, off, capc, q_sc = args
            else:
                qvecs, start_c, off, capc = args
            cand = jnp.stack([
                jax.lax.dynamic_slice(decoded, (start_c[i], 0),
                                      (s_eff, d_dec))
                for i in range(block_chunk)])  # [bc, s, d]
            pen = jnp.stack([
                jax.lax.dynamic_slice(penalty_arr, (start_c[i],), (s_eff,))
                for i in range(block_chunk)])  # [bc, s]
            # slots outside [off, off + capc) hold *other* cells' live
            # items: correct scores but duplicated -> mask by capacity
            in_cell = ((slot_iota[None, :s_eff] >= off[:, None])
                       & (slot_iota[None, :s_eff] < (off + capc)[:, None]))
            pen = pen + jnp.where(in_cell, 0.0, big)
            if distance == "manhattan":
                scores = -jnp.sum(
                    jnp.abs(qvecs[:, :, None, :]
                            - cand[:, None, :, :].astype(qvecs.dtype)),
                    axis=-1)
                scores = scores - pen[:, None, :]
            elif int8_cache:
                cand_sc = jnp.stack([
                    jax.lax.dynamic_slice(scales, (start_c[i],), (s_eff,))
                    for i in range(block_chunk)])  # [bc, s]
                ab = jnp.einsum("bpd,bsd->bps", qvecs, cand,
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32)
                factor = 2.0 if distance == "euclidean" else 1.0
                ab = ab * (factor * q_sc[:, :, None] * cand_sc[:, None, :])
                scores = ab - pen[:, None, :]
            else:
                ab = jnp.einsum("bpd,bsd->bps", qvecs,
                                cand.astype(qvecs.dtype),
                                precision=precision or config.SEARCH_PRECISION,
                                preferred_element_type=jnp.float32)
                scores = (2.0 * ab if distance == "euclidean" else ab)
                scores = scores - pen[:, None, :]
            return _block_select(scores, start_c, k_pair=k_pair, s_eff=s_eff,
                                 approx=approx, pack32=pack32,
                                 slot_mask=slot_mask,
                                 key_neg_big=key_neg_big, big=big)

        nbc = b_max // block_chunk
        xs = [qvecs_all.reshape(nbc, block_chunk, p_tile, d),
              start_c_all.reshape(nbc, block_chunk),
              off_all.reshape(nbc, block_chunk),
              cap_all.reshape(nbc, block_chunk)]
        if int8_cache:
            xs.append(q_scale_all[qidx_all].reshape(
                nbc, block_chunk, p_tile))
        combo = jax.lax.map(one_chunk, tuple(xs))
        combo = combo.reshape(b_max, p_tile,
                              k_pair if pack32 else 2 * k_pair)

    # ---- unsort per-pair partials + final per-query merge ----
    # one row-gather via the inverse permutation (a gather+scatter pair
    # would double the payload traffic, which dominates at high n_probe)
    return _merge_pairs(
        combo, query, pair_block, pair_slot, start_c_all,
        b_max=b_max, p_tile=p_tile, k=k, k_pair=k_pair, nq=nq,
        n_probe=n_probe, pack32=pack32, slot_mask=slot_mask,
        key_neg_big=key_neg_big, distance=distance, big=big,
        merge_taper=merge_taper if pack32 else None)
