"""Code-domain (codes-only) IVFPQ scan — the memory-minimal path.

Reference counterpart: the LUT-gather inner loop of the fused scan
(torchpq/kernels/cuda/ivfpq_topk.cu:650-679), which reads m bytes per
candidate and looks each byte up in a shared-memory [m, 256] table. SURVEY.md
§7 ordered both TPU translations measured: a gather-based scan and the
one-hot-matmul trick. The gather loses outright — a per-(query, slot,
subvector) table lookup is ~1 GB/s XLA gather territory and the VPU-add
accumulation alone is ~50x slower than the MXU sweep. This module is the
one-hot translation:

    score[q, j] = sum_i LUT[q, i, code[j, i]]
                = LUT_flat[q, :] . onehot(code_j)          (width m * 256)

i.e. ADC over raw codes is a matmul against one-hot code rows. The catch is
fundamental: the contraction width is m*256 (16384 for PQ64) vs d (128) for
the decoded-cache scan, so the MXU does ~128x the FLOPs per candidate — the
price of scanning m-byte codes with zero decode gathers and zero cache
bytes. Measured numbers live in ARCHITECTURE.md ("code-domain scan"); the
decoded/int8 caches remain the fast paths, and this one is the capacity
path: HBM holds ONLY the canonical uint8 codes (m B/slot — the reference's
exact memory contract) plus 4 B/slot of norms.

Both scans here reuse the cell-major machinery from ops/adc.py (pair
packing, per-block select, pack32 unsort/merge); only block scoring differs.

The FLOP tax has one big exception: the EXHAUSTIVE sweep. There every
chunk of codes is scored against every query, so the chunk can instead be
decoded ONCE (one-hot @ block-diagonal codebook, m*nc*d MACs/slot) and
scored with the ordinary d-wide matmul (nq*d MACs/slot) — at nq >= ~1000
the decode amortizes to noise and the sweep runs within ~2-3x of the
decoded-cache sweep while HBM still holds only the m B/slot codes.
`flat_decode_scan` is that path; the cell-major scan cannot use it because
a probed window is shared by only ~p_tile queries, which makes decode cost
~= one-hot scoring cost (both m*nc-wide contractions).
"""

import functools

import jax
import jax.numpy as jnp

from .. import config
from .. import util
from ..metric import canonical_distance
from .adc import (_pack_pairs, _merge_pairs, _block_select,
                  _f32_sortable_i32)


def build_scan_lut(query, codebook, distance, precision=None):
    """Per-subvector partial-similarity table with SUM semantics: summing
    lut[q, i, code_i] over i gives <q, y> (inner/cosine/euclidean — the
    euclidean caller applies the 2<q,y> - |y|^2 - |q|^2 identity with |y|^2
    riding the penalty stream) or -|q - y|_1 exactly (manhattan — the L1
    metric decomposes per subvector, so code-domain manhattan is exact,
    which the bf16 decoded cache can't claim).

    query: [nq, d]; codebook: [m, n_clusters, dsub] -> [nq, m, n_clusters].
    """
    distance = canonical_distance(distance)
    m, nc, dsub = codebook.shape
    nq = query.shape[0]
    q = query.reshape(nq, m, dsub)
    if distance == "manhattan":
        return -jnp.sum(
            jnp.abs(q[:, :, None, :] - codebook[None, :, :, :]), axis=-1)
    return jnp.einsum("qmd,mcd->qmc", q, codebook,
                      precision=precision or config.SEARCH_PRECISION,
                      preferred_element_type=jnp.float32)


def _packing(codes, m):
    """Resolve the (g, m, cap_total) of a possibly lane-packed codes array.

    At 100M-slot scale the u8 [cap, m] codes CANNOT be touched as-is: XLA
    re-lays any gather/slice operand whose minor dim is under one 128-lane
    tile into a padded copy (2x a 9.2 GB array -> compile-time OOM on a
    16 GB chip; measured, see ARCHITECTURE.md). The serving fix is to hand
    the scan codes already reshaped to [cap/g, g*m] with g = 128//m — a
    full-tile minor dim that XLA fetches with ZERO copy (dynamic_slice temp
    = one window). `m` is passed statically by the caller when packed;
    rows stay fetchable because cell starts are 16-aligned (g | 16)."""
    if m is None or m == codes.shape[1]:
        return 1, codes.shape[1], codes.shape[0]
    g = codes.shape[1] // m
    assert codes.shape[1] == g * m and 16 % g == 0, (codes.shape, m)
    return g, m, codes.shape[0] * g


@functools.partial(
    jax.jit,
    static_argnames=("k", "distance", "s_max", "n_cells", "p_tile",
                     "block_chunk", "approx", "precision", "k_pair", "m",
                     "impl", "interpret"))
def scan_cell_major_codes(query, cells, probe_mask, codes, norms, is_empty,
                          cell_start, cell_capacity, codebook, *, k, distance,
                          s_max, n_cells, p_tile=128, block_chunk=8,
                          approx=False, precision=None, k_pair=None, m=None,
                          impl="auto", interpret=False):
    """Cell-major scan over raw uint8 codes (no decoded cache).

    Identical contract to adc.scan_cell_major, but the candidate side reads
    codes at m B/slot of HBM traffic — the window fetch is 2d/m x smaller
    than the decoded scan's. Two implementations (impl gate, recorded in
    adc.LAST_GATE like the decoded scan's):

      * Pallas (ops/pallas_codes_scan.py — packed storage only): DMA the
        packed [s/g, 128] u8 window, decode it in VMEM against a resident
        block-diagonal codebook (s*m*nc*d MACs shared by the whole block),
        and score + select exactly like the decoded-cache kernel
        (s*d*p MACs). For d == p_tile this does ~half the one-hot path's
        MXU work and none of its per-block LUT-tile traffic.

      * XLA fallback: score each block as
        LUT_tile [p, m*nc] @ onehot(codes window) [s, m*nc]^T on the MXU
        (s*m*nc*p MACs). LUT rows are gathered per block from the
        [nq, m*nc] bf16 table — 2*p*m*nc B/block of gather traffic, the
        measured bottleneck of this path.
    """
    distance = canonical_distance(distance)
    nq, n_probe = cells.shape
    n_pairs = nq * n_probe
    g, m, cap_total = _packing(codes, m)

    if k_pair is None:
        if approx and k > 16:
            # 64-ceiling mirrors ops/adc.py: k_pair > 64 would flip the
            # Pallas codes kernel off mid-curve (gate-stability invariant,
            # pinned by tests/test_planner.py). The ceiling yields to the
            # completeness floor (ADVICE r4 #2): n_probe * k_pair must
            # reach k whenever enough candidates exist.
            k_pair = min(k, max(16, 4 * util.cdiv(k, n_probe)),
                         max(64, util.cdiv(k, n_probe)))
        else:
            k_pair = k
    k_pair = min(k_pair, k, s_max, cap_total)
    b_max = min(n_cells, n_pairs) + util.cdiv(n_pairs, p_tile)
    b_max = util.round_up(b_max, block_chunk)

    pair_block, pair_slot, block_cell, probers = _pack_pairs(
        cells, probe_mask, n_cells=n_cells, p_tile=p_tile, b_max=b_max)

    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    cell_all = jnp.maximum(block_cell, 0)
    qidx_all = jnp.maximum(probers, 0)
    start_all = cell_start[cell_all]
    cap_all = cell_capacity[cell_all]
    if distance == "euclidean":
        penalty_arr = jnp.where(is_empty, big, norms)
    else:
        penalty_arr = jnp.where(is_empty, big, 0.0)
    slot_iota = jnp.arange(s_max, dtype=jnp.int32)
    s_eff = min(s_max, cap_total)
    assert s_eff % g == 0, (s_eff, g)
    start_c_all = jnp.clip(start_all, 0, cap_total - s_eff)
    off_all = start_all - start_c_all

    s_pow2 = util.next_pow2(s_eff)
    # pack32 slot bits: the codes kernel tolerates 8192 (13 truncated value
    # bits still leave ~10 mantissa bits — above bf16 scoring noise); the
    # XLA path keeps the decoded scan's 4096 bound
    pack32 = approx and s_pow2 <= 8192
    slot_mask = s_pow2 - 1
    key_neg_big = _f32_sortable_i32(-big) & jnp.int32(~slot_mask)
    # see one_chunk: big codes flip the window fetch to row-gather
    gather_windows = codes.nbytes > config.CODES_GATHER_BYTES

    from .pallas_codes_scan import (scan_blocks_pallas_codes,
                                    PALLAS_BDIAG_VMEM_BYTES,
                                    codes_kernel_static_gate)
    interpret = interpret or config.PALLAS_INTERPRET
    dsub = codebook.shape[-1]
    d = m * dsub
    d_pad = util.round_up(d, 128) if d > 128 else d
    bps = 4
    while bps > 1 and 2 * bps * (s_eff // g) * 128 > (1 << 22):
        bps //= 2
    # the kernel asserts b % bps == 0 and b is only rounded to block_chunk:
    # a caller passing block_chunk=1/2 must shrink bps to match (ADVICE r4)
    import math
    bps = math.gcd(bps, block_chunk)
    use_pallas = (
        impl in ("pallas", "auto")
        and k_pair <= 64
        # packed full-lane storage is the kernel's DMA contract (the
        # interpreter honors it too — the kernel reads [cap/g, 128] rows)
        and codes.shape[1] == 128
        # shape gate shared with the planner's cost mirror
        and codes_kernel_static_gate(m, g, d, distance, interpret)
        and (not approx or (pack32 and (s_eff % 128 == 0
                                        or (s_pow2 == s_eff
                                            and s_eff < 128)))))
    if not use_pallas:
        pack32 = approx and s_pow2 <= 4096
    from .adc import LAST_GATE
    LAST_GATE.clear()
    LAST_GATE.update(impl="pallas_codes" if use_pallas else "xla_onehot",
                     k_pair=k_pair, s_eff=s_eff, d=d, bps=bps,
                     pack32=pack32, cache="codes", m=m, g=g)
    if impl == "pallas" and not use_pallas:
        import warnings
        warnings.warn(
            "scan_cell_major_codes: impl='pallas' requested but the gate "
            f"fails (k_pair={k_pair}<=64? dist={distance}!=manhattan? "
            f"packed g*m={g * m}==128? d_pad={d_pad}%128==0? bdiag "
            f"{m * 256 * d_pad * 2}B <= {PALLAS_BDIAG_VMEM_BYTES}B? approx "
            f"needs pow2 s_eff<=8192, got {s_eff}) — falling back to XLA",
            stacklevel=2)

    if use_pallas:
        bdiag = blockdiag_codebook(codebook).astype(jnp.bfloat16)
        if d_pad > d:
            bdiag = jnp.pad(bdiag, ((0, 0), (0, d_pad - d)))
        # penalty rows: same staging as ops/adc.py — 16-aligned row gather
        # at bench scale, per-block 1-D dynamic slices at huge caps (the
        # [cap/16, 16] gather operand lane-pads x8: the r4 100M serving
        # failure's 4.61 GB temp, _PEN_GATHER_BYTES in ops/adc.py)
        from .adc import _stage_penalty
        pen_all = _stage_penalty(
            norms, is_empty, start_c_all, s_eff=s_eff, b_max=b_max,
            block_chunk=block_chunk, distance=distance, big=big)
        in_cell = ((slot_iota[None, :s_eff] >= off_all[:, None])
                   & (slot_iota[None, :s_eff]
                      < (off_all + cap_all)[:, None]))
        pen_all = pen_all + jnp.where(in_cell, 0.0, big)
        if g > 1:
            # deinterleave to the kernel's column order: column
            # c = q*(s_eff/g) + r holds slot r*g + q (the kernel scores
            # per in-row offset q and concatenates — no u8 shape cast)
            pen_all = pen_all.reshape(b_max, s_eff // g, g) \
                .transpose(0, 2, 1).reshape(b_max, s_eff)
        qvecs_p = util.pad_cols(query, d_pad).astype(jnp.bfloat16)[qidx_all]
        combo = scan_blocks_pallas_codes(
            qvecs_p, start_c_all, pen_all, codes, bdiag,
            s_eff=s_eff, k_pair=k_pair, p_tile=p_tile, m=m,
            distance=distance, approx=pack32, slot_mask=slot_mask, bps=bps,
            interpret=interpret)
        return _merge_pairs(
            combo, query, pair_block, pair_slot, start_c_all,
            b_max=b_max, p_tile=p_tile, k=k, k_pair=k_pair, nq=nq,
            n_probe=n_probe, pack32=pack32, slot_mask=slot_mask,
            key_neg_big=key_neg_big, distance=distance, big=big)

    lut = build_scan_lut(query, codebook, distance, precision)
    nc = lut.shape[-1]
    lut_flat = lut.reshape(nq, m * nc).astype(jnp.bfloat16)
    cvals = jnp.arange(nc, dtype=jnp.int32)

    def one_chunk(args):
        qidx, start_c, off, capc = args  # [bc,p],[bc],[bc],[bc]
        # per-chunk LUT row gather (wide rows from [nq, m*nc] — gathers
        # well); materializing all B tiles up front would be B x p x m*nc
        # bf16 = tens of GB
        lut_t = lut_flat[qidx]  # [bc, p, m*nc]
        if g > 1:
            # packed codes: full-128-lane rows slice copy-free at any scale
            # (the whole reason _packing exists); cell starts are 16-aligned
            # and g | 16, so start_c // g loses nothing
            win = jnp.stack([
                jax.lax.dynamic_slice(
                    codes, (start_c[i] // g, 0), (s_eff // g, g * m))
                for i in range(block_chunk)]).reshape(block_chunk, s_eff, m)
            pen = jnp.stack([
                jax.lax.dynamic_slice(penalty_arr, (start_c[i],), (s_eff,))
                for i in range(block_chunk)])
        elif gather_windows:
            # row-gather the candidate windows instead of dynamic_slice:
            # at 100M-slot scale XLA's layout assignment re-lays the
            # dynamic_slice OPERAND into a lane-padded u8 tile — an 18.4 GB
            # copy of a 9.2 GB codes array that OOMs a 16 GB chip. Gather
            # operands keep their layout (no copy); the gather's lower
            # bandwidth only prices the windows actually touched.
            rows = start_c[:, None] + slot_iota[None, :s_eff]  # [bc, s]
            win = jnp.take(codes, rows, axis=0)  # [bc, s, m] uint8
            pen = jnp.take(penalty_arr, rows, axis=0)
        else:
            win = jnp.stack([
                jax.lax.dynamic_slice(codes, (start_c[i], 0), (s_eff, m))
                for i in range(block_chunk)])  # [bc, s, m] uint8
            pen = jnp.stack([
                jax.lax.dynamic_slice(penalty_arr, (start_c[i],), (s_eff,))
                for i in range(block_chunk)])
        in_cell = ((slot_iota[None, :s_eff] >= off[:, None])
                   & (slot_iota[None, :s_eff] < (off + capc)[:, None]))
        pen = pen + jnp.where(in_cell, 0.0, big)
        oh = (win.astype(jnp.int32)[..., None]
              == cvals[None, None, None, :]).astype(jnp.bfloat16)
        sums = jnp.einsum(
            "bpx,bsx->bps", lut_t,
            oh.reshape(block_chunk, s_eff, m * nc),
            preferred_element_type=jnp.float32)
        scores = (2.0 * sums if distance == "euclidean" else sums)
        scores = scores - pen[:, None, :]
        # keep ApproxTopK's PartialReduce out of the m*nc-wide one-hot
        # contraction: fused, the TPU compiler cannot find an iteration
        # window for it ("Wasn't able to find a valid iteration window for
        # ApproxTopK", measured on v5e at the 1M sweep shapes) and the whole
        # program fails to compile. The barrier materializes [bc, p, s]
        # scores first — noise next to the einsum's FLOPs.
        scores = jax.lax.optimization_barrier(scores)
        return _block_select(scores, start_c, k_pair=k_pair, s_eff=s_eff,
                             approx=approx, pack32=pack32,
                             slot_mask=slot_mask, key_neg_big=key_neg_big,
                             big=big)

    nbc = b_max // block_chunk
    combo = jax.lax.map(one_chunk, (
        qidx_all.reshape(nbc, block_chunk, p_tile),
        start_c_all.reshape(nbc, block_chunk),
        off_all.reshape(nbc, block_chunk),
        cap_all.reshape(nbc, block_chunk)))
    combo = combo.reshape(b_max, p_tile, k_pair if pack32 else 2 * k_pair)

    return _merge_pairs(
        combo, query, pair_block, pair_slot, start_c_all,
        b_max=b_max, p_tile=p_tile, k=k, k_pair=k_pair, nq=nq,
        n_probe=n_probe, pack32=pack32, slot_mask=slot_mask,
        key_neg_big=key_neg_big, distance=distance, big=big)


@functools.partial(
    jax.jit,
    static_argnames=("k", "distance", "chunk", "approx", "precision", "m"))
def flat_onehot_scan(query, codes, penalty, codebook, *, k, distance,
                     chunk=16384, approx=True, precision=None, m=None):
    """Exhaustive code-domain sweep: LUT [nq, m*nc] @ one-hot codes chunks.

    The code-domain analog of flat_adc_scan — same chunk + approx-top-k +
    exact-final-merge structure, m*nc-wide contraction instead of d. This is
    the honest 'measure both' loser at scale (the FLOPs are m*nc/d x the
    decoded sweep's) but it serves max-recall searches on indexes that keep
    no scan cache at all.
    """
    distance = canonical_distance(distance)
    nq = query.shape[0]
    g, m, cap = _packing(codes, m)
    chunk = min(chunk, cap)
    chunk -= chunk % g or 0
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    lut = build_scan_lut(query, codebook, distance, precision)
    nc = lut.shape[-1]
    lut_flat = lut.reshape(nq, m * nc).astype(jnp.bfloat16)
    cvals = jnp.arange(nc, dtype=jnp.int32)
    n_chunks = util.cdiv(cap, chunk)
    k_c = min(k, chunk)

    def one(c0):
        c0c = jnp.minimum(c0, cap - chunk)
        shift = c0 - c0c
        if g > 1:
            # packed codes (see _packing): copy-free slice at any scale
            win = jax.lax.dynamic_slice(
                codes, (c0c // g, 0), (chunk // g, g * m)
            ).reshape(chunk, m)
            pen = jax.lax.dynamic_slice(penalty, (c0c,), (chunk,))
        elif codes.nbytes > config.CODES_GATHER_BYTES:
            # row-gather at 100M scale: XLA re-lays the dynamic_slice
            # operand into a lane-padded u8 tile (2x copy -> OOM); gather
            # operands keep their layout (see scan_cell_major_codes)
            rows = c0c + jnp.arange(chunk, dtype=jnp.int32)
            win = jnp.take(codes, rows, axis=0)
            pen = jnp.take(penalty, rows, axis=0)
        else:
            win = jax.lax.dynamic_slice(codes, (c0c, 0), (chunk, m))
            pen = jax.lax.dynamic_slice(penalty, (c0c,), (chunk,))
        pen = pen + jnp.where(jnp.arange(chunk) < shift, big, 0.0)
        oh = (win.astype(jnp.int32)[..., None]
              == cvals[None, None, :]).astype(jnp.bfloat16)
        sums = jnp.einsum("qx,sx->qs", lut_flat,
                          oh.reshape(chunk, m * nc),
                          preferred_element_type=jnp.float32)
        s = (2.0 * sums if distance == "euclidean" else sums) - pen[None, :]
        # same iteration-window failure as scan_cell_major_codes: detach the
        # top-k from the one-hot contraction before PartialReduce fusion
        s = jax.lax.optimization_barrier(s)
        if approx and k_c < chunk:
            v, i = jax.lax.approx_max_k(s, k_c)
        else:
            v, i = jax.lax.top_k(s, k_c)
        return v, (i + c0c).astype(jnp.int32)

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    vals, idx = jax.lax.map(one, starts)  # [nch, nq, k_c]
    return _flat_final_merge(vals, idx, query, k=k, distance=distance,
                             big=big)


def _flat_final_merge(vals, idx, query, *, k, distance, big):
    """Shared exact final merge of per-chunk winners ([nch, nq, k_c])."""
    nq = query.shape[0]
    vals = jnp.moveaxis(vals, 0, 1).reshape(nq, -1)
    idx = jnp.moveaxis(idx, 0, 1).reshape(nq, -1)
    kk = min(k, vals.shape[-1])
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


def blockdiag_codebook(codebook):
    """[m, nc, dsub] -> [m*nc, m*dsub] block-diagonal decode matrix:
    onehot(codes) @ blockdiag reconstructs rows exactly (each one-hot
    selects one codeword per subvector block)."""
    m, nc, dsub = codebook.shape
    bd = jnp.zeros((m, nc, m, dsub), codebook.dtype)
    bd = bd.at[jnp.arange(m), :, jnp.arange(m), :].set(codebook)
    return bd.reshape(m * nc, m * dsub)


@functools.partial(
    jax.jit,
    static_argnames=("k", "distance", "chunk", "sub", "approx", "precision",
                     "m"))
def flat_decode_scan(query, codes, penalty, codebook, *, k, distance,
                     chunk=65536, sub=8192, approx=True, precision=None,
                     m=None):
    """Exhaustive code-domain sweep via decode-on-the-fly chunks.

    Per chunk: decode the codes ONCE on the MXU (one-hot @ block-diagonal
    codebook -> [chunk, d] bf16, m*nc*d MACs/slot, exact codeword selection
    with f32 accumulation) and score all queries with the ordinary d-wide
    matmul — the same arithmetic as the decoded-cache sweep, amortizing the
    decode over nq queries instead of paying the m*nc-wide contraction per
    query like `flat_onehot_scan` (reference LUT loop:
    torchpq/kernels/cuda/ivfpq_topk.cu:650-679). Memory stays m B/slot of
    codes + one [sub, d] decode transient. Manhattan callers must use
    `flat_onehot_scan` (L1 doesn't factor through a dot product).
    """
    distance = canonical_distance(distance)
    assert distance != "manhattan", "manhattan: use flat_onehot_scan"
    nq, d = query.shape
    g, m, cap = _packing(codes, m)
    chunk = min(chunk, cap)
    sub = min(sub, chunk)
    sub -= sub % g
    chunk = (chunk // sub) * sub
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    nc = codebook.shape[1]
    cvals = jnp.arange(nc, dtype=jnp.int32)
    bd = blockdiag_codebook(codebook).astype(jnp.bfloat16)
    q_mm = query.astype(jnp.bfloat16)
    n_chunks = util.cdiv(cap, chunk)
    k_c = min(k, chunk)

    def decode_sub(win):  # [sub, m] uint8 -> [sub, d] bf16
        oh = (win.astype(jnp.int32)[..., None]
              == cvals[None, None, :]).astype(jnp.bfloat16)
        return jnp.dot(oh.reshape(win.shape[0], m * nc), bd,
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    def one(c0):
        c0c = jnp.minimum(c0, cap - chunk)
        shift = c0 - c0c
        if g > 1:
            # packed codes (see _packing): copy-free slice at any scale
            win = jax.lax.dynamic_slice(
                codes, (c0c // g, 0), (chunk // g, g * m)
            ).reshape(chunk, m)
            pen = jax.lax.dynamic_slice(penalty, (c0c,), (chunk,))
        elif codes.nbytes > config.CODES_GATHER_BYTES:
            # row-gather at 100M scale: XLA re-lays the dynamic_slice
            # operand into a lane-padded u8 tile (2x copy -> OOM); gather
            # operands keep their layout (see scan_cell_major_codes)
            rows = c0c + jnp.arange(chunk, dtype=jnp.int32)
            win = jnp.take(codes, rows, axis=0)
            pen = jnp.take(penalty, rows, axis=0)
        else:
            win = jax.lax.dynamic_slice(codes, (c0c, 0), (chunk, m))
            pen = jax.lax.dynamic_slice(penalty, (c0c,), (chunk,))
        pen = pen + jnp.where(jnp.arange(chunk) < shift, big, 0.0)
        if chunk > sub:
            dec = jax.lax.map(
                decode_sub, win.reshape(chunk // sub, sub, m)
            ).reshape(chunk, d)
        else:
            dec = decode_sub(win)
        ab = jax.lax.dot_general(
            q_mm, dec, (((1,), (1,)), ((), ())),
            precision=precision or config.SEARCH_PRECISION,
            preferred_element_type=jnp.float32)
        s = (2.0 * ab if distance == "euclidean" else ab) - pen[None, :]
        if approx and k_c < chunk:
            v, i = jax.lax.approx_max_k(s, k_c)
        else:
            v, i = jax.lax.top_k(s, k_c)
        return v, (i + c0c).astype(jnp.int32)

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    vals, idx = jax.lax.map(one, starts)  # [nch, nq, k_c]
    return _flat_final_merge(vals, idx, query, k=k, distance=distance,
                             big=big)
