"""IVFPQ index — the main user-facing ANN index.

Reference counterpart: torchpq/index/IVFPQIndex.py (subclass of CellContainer
holding a VQ coarse codec, a PQ codec, and the fused scan; search call stack
in SURVEY.md §3.3).

TPU-first redesign of the scan: alongside the canonical uint8 codes this index
maintains a bf16 *decoded cache* (PQ reconstruction, including the cell
centroid when pq_use_residual) plus per-slot squared norms as aux row stores.
ADC scoring then IS an MXU matmul against the cache — identical scores to
LUT-based ADC (see ops/adc.py docstring) with none of the gathers. Residual
PQ needs no special kernels (the reference has three CUDA variants,
ivfpq_topk.cu:974-1104): the cache simply stores centroid + residual
reconstruction, so `search` is one code path for both modes. The reference's
`use_precomputed` part1/part2 tables (IVFPQIndex.py:160-170) are therefore
subsumed by the cache; the flag is accepted for API parity.

Reference tunables kept: n_probe, use_smart_probing + temperature (same
entropy math, IVFPQIndex.py:499-512), use_cublas / use_tensor_core /
fp16_scale_mode (precision knobs; tensor-core maps to bf16 matmul precision).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from .. import util
from ..metric import canonical_distance, negative_squared_l2_distance
from ..codec import PQCodec, VQCodec
from ..container import CellContainer
from ..fn.ivfpq_topk import IVFPQTopk


@functools.partial(
    jax.jit, static_argnames=("n_probe", "use_smart", "precision", "approx"))
def _coarse_probe(query, coarse_codebook, temperature, *, n_probe, use_smart,
                  precision, approx=False):
    """Coarse scoring + cell selection + smart-probing mask.

    Mirrors reference search (IVFPQIndex.py:483-512): coarse scores are always
    negative squared L2 against the VQ codebook; smart probing computes
    p = softmax(-sqrt|sims| / T) and keeps ceil(normalized_entropy * n_probe)
    cells per query (as a mask — max_n_probe stays static).

    approx=True uses the TPU-native approximate top-k for cell selection
    (jax.lax.top_k is a full sort on TPU and dominates coarse cost otherwise).
    """
    sims = negative_squared_l2_distance(query, coarse_codebook,
                                        precision=precision)
    if approx and n_probe < sims.shape[-1]:
        topk_sims, cells = jax.lax.approx_max_k(
            sims, n_probe, recall_target=config.COARSE_RECALL_TARGET)
    else:
        topk_sims, cells = jax.lax.top_k(sims, n_probe)
    if use_smart and n_probe > 1:
        p = jax.nn.softmax(-jnp.sqrt(jnp.abs(topk_sims)) / temperature,
                           axis=-1)
        log2p = jnp.log2(jnp.maximum(p, 1e-30))
        normalized_entropy = -jnp.sum(
            p * log2p / jnp.log2(float(n_probe)), axis=-1)
        n_probe_list = jnp.ceil(
            normalized_entropy * n_probe).astype(jnp.int32)
        n_probe_list = jnp.clip(n_probe_list, 1, n_probe)
        mask = jnp.arange(n_probe)[None, :] < n_probe_list[:, None]
    else:
        mask = jnp.ones(cells.shape, bool)
    return topk_sims, cells.astype(jnp.int32), mask


@functools.partial(
    jax.jit, static_argnames=("cap", "group", "n_cells", "use_smart",
                              "precision", "approx"))
def _coarse_probe_super(query, coarse_codebook, temperature, *, cap, group,
                        n_cells, use_smart, precision, approx=False):
    """Supercell-native coarse probing (the scan_group>1 + probe_cap path).

    The capped supercell scan wants each query's best `cap` DISTINCT
    supercells; deriving them from cell-level probes costs a top-n_probe
    select over n_cells plus a dedup and a cap argsort inside
    scan_cell_major's group>1 preprocessing. Ranking supercells directly
    by the max of their member cells' coarse scores yields the IDENTICAL
    set whenever the probed cells span >= cap distinct supercells (cell
    rank IS score rank, so first-occurrence dedup order == supercell
    max-score order) and a fuller set otherwise (the dedup path comes up
    short, this one always fills `cap`) — the scanned volume per query is
    the same `cap` windows, so recall only moves up. One group-max
    reshape + one top-cap select replaces all three sorts.

    Smart probing mirrors _coarse_probe's entropy rule (reference
    IVFPQIndex.py:483-512) on the supercell score list, normalized by
    log2(cap)."""
    sims = negative_squared_l2_distance(query, coarse_codebook,
                                        precision=precision)
    n_super = util.cdiv(n_cells, group)
    pad = n_super * group - n_cells
    if pad:
        sims = jnp.pad(sims, ((0, 0), (0, pad)),
                       constant_values=-jnp.inf)
    sup_sims = jnp.max(sims.reshape(sims.shape[0], n_super, group), axis=-1)
    if approx and cap < n_super:
        top_sims, sup = jax.lax.approx_max_k(
            sup_sims, cap, recall_target=config.COARSE_RECALL_TARGET)
    else:
        top_sims, sup = jax.lax.top_k(sup_sims, min(cap, n_super))
    if use_smart and cap > 1:
        p = jax.nn.softmax(-jnp.sqrt(jnp.abs(top_sims)) / temperature,
                           axis=-1)
        log2p = jnp.log2(jnp.maximum(p, 1e-30))
        normalized_entropy = -jnp.sum(
            p * log2p / jnp.log2(float(max(cap, 2))), axis=-1)
        n_list = jnp.clip(
            jnp.ceil(normalized_entropy * cap).astype(jnp.int32), 1, cap)
        mask = jnp.arange(sup.shape[1])[None, :] < n_list[:, None]
    else:
        mask = jnp.ones(sup.shape, bool)
    return top_sims, sup.astype(jnp.int32), mask


@functools.partial(jax.jit, static_argnames=("n_pad",))
def _compact_cells_cache(decoded, norms, scales, is_empty, cell_start,
                         new_start, *, n_pad):
    """Cell-aware live-row compaction: pack each cell's live rows into a
    contiguous 16-aligned segment of a fresh [n_pad, d] cache.

    Cells are over-allocated (pow2 capacities + spill headroom), so the
    scan's per-block window (s_max = the largest cell CAPACITY) commonly
    runs 2-4x the largest live cell — and every probed block pays for the
    whole window. This layout preserves the cells-are-contiguous-segments
    invariant (cell c occupies [new_start[c], new_start[c] + live_c)) with
    the per-cell 16-alignment the Pallas DMA needs, so the exact same scan
    code runs with s_max = the largest live cell. It also serves the flat
    sweep (the rows are exactly the live rows, ~3% padding).

    addr_map[i] = storage address of compact row i (-1 on padding)."""
    cap = decoded.shape[0]
    aidx = jnp.arange(cap, dtype=jnp.int32)
    cell_of = jnp.clip(
        jnp.searchsorted(cell_start, aidx, side="right") - 1,
        0, cell_start.shape[0] - 1)
    live = (~is_empty).astype(jnp.int32)
    prefix = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(live)])  # exclusive at [a]
    rank = prefix[aidx] - prefix[cell_start[cell_of]]
    dest = jnp.where(is_empty, n_pad, new_start[cell_of] + rank)
    addr_map = jnp.full((n_pad,), -1, jnp.int32).at[dest].set(
        aidx, mode="drop")
    valid = addr_map >= 0
    safe = jnp.maximum(addr_map, 0)
    dec = decoded[safe]
    nrm = norms[safe]
    sc = None if scales is None else scales[safe]
    return dec, nrm, ~valid, addr_map, sc


@functools.partial(jax.jit, static_argnames=("n_pad",))
def _compact_flat_cache(decoded, norms, is_empty, scales, *, n_pad):
    """Squeeze the capacity-sized decoded cache down to its live rows.

    Cells are over-allocated (pow2 capacities, spill headroom), so capacity
    commonly runs 2-4x n_items; the flat MXU sweep pays for every slot it
    scans, dead or not. One nonzero + row-gather (amortized across searches
    until the next mutation) shrinks the sweep to ~n_items. addr_map[i] is
    the storage address of compact row i (-1 on the padding tail)."""
    addr_map = jnp.nonzero(~is_empty, size=n_pad, fill_value=-1)[0] \
        .astype(jnp.int32)
    valid = addr_map >= 0
    safe = jnp.maximum(addr_map, 0)
    dec = decoded[safe]
    nrm = norms[safe]
    sc = None if scales is None else scales[safe]
    return dec, nrm, ~valid, addr_map, sc


@functools.partial(
    jax.jit, static_argnames=("chunk", "int8", "out_dtype", "residual",
                              "pack_g"))
def _cache_chunk(storage, cell_start, pq_codebook, vq_rows, c0, *, chunk,
                 int8, out_dtype, residual, rerank_storage=None,
                 rr_codebook=None, pack_g=1):
    """Recompute one [chunk, d] block of the decoded scan cache from the
    canonical uint8 codes (inner step of the relayout aux rebuilder).
    c0 is clamped by the caller; overlapping rows recompute identically.
    When rerank codes exist (IVFPQR with a decoded cache), the cache rows
    are the FULL two-stage reconstruction — see index/ivfpqr.py.
    pack_g > 1: storage is the packed-at-ingest [cap/g, g*m] layout; the
    slice stays g-aligned (c0 and chunk are multiples of 16, g | 16)."""
    from ..codec.pq import _decode_nd
    m, _, dsub = pq_codebook.shape
    codes = jax.lax.dynamic_slice(
        storage, (c0 // pack_g, 0), (chunk // pack_g, storage.shape[1])
    ).reshape(chunk, storage.shape[1] // pack_g)
    dec = _decode_nd(codes, pq_codebook, m=m, dsub=dsub)
    if residual:
        idx = c0 + jnp.arange(chunk)
        cell = jnp.clip(jnp.searchsorted(cell_start, idx, side="right") - 1,
                        0, cell_start.shape[0] - 1)
        dec = dec + vq_rows[cell]
    if rerank_storage is not None:
        mr, _, dsubr = rr_codebook.shape
        rcodes = jax.lax.dynamic_slice(
            rerank_storage, (c0, 0), (chunk, rerank_storage.shape[1]))
        dec = dec + _decode_nd(rcodes, rr_codebook, m=mr, dsub=dsubr)
    nrm = jnp.sum(jnp.square(dec), axis=-1, keepdims=True)
    if int8:
        q, scale = util.int8_quantize_rows(dec)
        return q, nrm, scale[:, None]
    return dec.astype(out_dtype), nrm, None


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_rows(out, block, c0):
    return jax.lax.dynamic_update_slice(out, block, (c0, 0))


@functools.partial(jax.jit, donate_argnums=0)
def _pack_codes(codes):
    """[cap, m] u8 -> [cap/g, g*m] (g = 128//m): a donated pure reshape XLA
    aliases in place — the ONLY way to re-view multi-GB codes, since any
    copy (padded or compact) busts a 16 GB chip at the 100M demo's 9.2 GB
    (see ops/onehot_adc._packing for the measured layout facts)."""
    cap, m = codes.shape
    g = 128 // m
    return codes.reshape(cap // g, g * m)


@functools.partial(jax.jit, static_argnames=("n_pad", "pack_g"))
def _compact_codes_cache(codes, norms, is_empty, *, n_pad, pack_g=1):
    """Code-domain flavor of _compact_flat_cache: squeeze the uint8 codes
    + norms down to live rows for the flat one-hot sweep. pack_g > 1 reads
    the packed-at-ingest layout; the compact output is UNPACKED [n_pad, m]
    (only built when small — the caller gates by storage bytes, since a
    sub-128-lane u8 gather output pays the 2x lane-padding tax)."""
    addr_map = jnp.nonzero(~is_empty, size=n_pad, fill_value=-1)[0] \
        .astype(jnp.int32)
    valid = addr_map >= 0
    safe = jnp.maximum(addr_map, 0)
    if pack_g > 1:
        m = codes.shape[1] // pack_g
        rows = codes[safe // pack_g].reshape(n_pad, pack_g, m)
        out = jnp.take_along_axis(
            rows, (safe % pack_g)[:, None, None].astype(jnp.int32),
            axis=1)[:, 0]
    else:
        out = codes[safe]
    return out, norms[safe], ~valid, addr_map


@functools.partial(
    jax.jit, static_argnames=("k", "distance", "approx", "precision", "m"))
def _search_flat_codes(q, codes, norms, is_empty, addr_map, address2id,
                       codebook, *, k, distance, approx, precision=None,
                       m=None):
    """Flat-mode query path over raw codes (scan_cache_dtype='none'):
    exhaustive decode-on-the-fly MXU sweep + address translation. Manhattan
    rides the one-hot LUT sweep instead (exact per-subvector L1 decomposes
    through the LUT but not through a dot product)."""
    from ..ops.onehot_adc import flat_decode_scan, flat_onehot_scan
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    penalty = jnp.where(is_empty, big,
                        norms if distance == "euclidean" else 0.0)
    if canonical_distance(distance) == "manhattan":
        vals, addr = flat_onehot_scan(q, codes, penalty, codebook, k=k,
                                      distance=distance, approx=approx,
                                      precision=precision, m=m)
    else:
        vals, addr = flat_decode_scan(q, codes, penalty, codebook, k=k,
                                      distance=distance, approx=approx,
                                      precision=precision, m=m)
    if addr_map is not None:
        addr = jnp.where(addr >= 0, addr_map[jnp.maximum(addr, 0)], -1)
    ids = jnp.where(addr >= 0, address2id[jnp.maximum(addr, 0)], -1)
    return vals, ids, addr


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_probe", "use_smart", "precision", "distance",
                     "s_max", "n_cells", "approx", "m", "impl", "k_pair"))
def _search_full_codes(q, coarse_codebook, codes, norms, is_empty,
                       cell_start, cell_capacity, address2id, pq_codebook,
                       temperature, *, k, n_probe, use_smart, precision,
                       distance, s_max, n_cells, approx, m=None,
                       impl="auto", k_pair=None):
    """Fused code-domain query path: coarse + probe + cell-major codes
    scan (Pallas decode-in-kernel or XLA one-hot, gated like the decoded
    scan) + id translation (scan_cache_dtype='none')."""
    from ..ops.onehot_adc import scan_cell_major_codes
    _, cells, mask = _coarse_probe(
        q, coarse_codebook, temperature, n_probe=n_probe,
        use_smart=use_smart, precision=precision, approx=approx)
    vals, addr = scan_cell_major_codes(
        q, cells, mask, codes, norms, is_empty, cell_start, cell_capacity,
        pq_codebook, k=k, distance=distance, s_max=s_max, n_cells=n_cells,
        approx=approx, precision=precision, m=m, impl=impl, k_pair=k_pair)
    ids = jnp.where(addr >= 0, address2id[jnp.maximum(addr, 0)], -1)
    return vals, ids, addr


@functools.partial(
    jax.jit, static_argnames=("k", "distance", "approx", "impl", "precision"))
def _search_flat(q, decoded, norms, is_empty, addr_map, address2id, *,
                 k, distance, approx, impl, scales=None, precision=None):
    """Flat-mode query path over a (possibly compacted) cache: exhaustive
    MXU sweep + address translation. recall = the full ADC ceiling."""
    from ..ops.flat_adc import flat_adc_auto
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    penalty = jnp.where(is_empty, big,
                        norms if distance == "euclidean" else 0.0)
    vals, addr = flat_adc_auto(q, decoded, penalty, k=k, distance=distance,
                               approx=approx, impl=impl, scales=scales,
                               precision=precision)
    if addr_map is not None:
        addr = jnp.where(addr >= 0, addr_map[jnp.maximum(addr, 0)], -1)
    ids = jnp.where(addr >= 0, address2id[jnp.maximum(addr, 0)], -1)
    return vals, ids, addr


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_probe", "use_smart", "precision", "distance",
                     "s_max", "n_cells", "mode", "approx", "impl", "group",
                     "probe_cap", "k_pair", "merge_taper", "super_probe",
                     "split_taper"))
def _search_full(q, coarse_codebook, decoded, norms, is_empty, cell_start,
                 cell_capacity, address2id, temperature, *, k, n_probe,
                 use_smart, precision, distance, s_max, n_cells, mode,
                 approx, impl="xla", group=1, scales=None, addr_map=None,
                 probe_cap=None, k_pair=None, merge_taper=None,
                 super_probe=False, split_taper=True):
    """The whole query path in one jit: coarse scoring + probing + fused
    scan + id translation. One dispatch per search call — the reference pays
    one kernel launch per stage (IVFPQIndex.py:469-524); here XLA fuses the
    glue and the host never touches intermediates.

    (mode="flat" requests go through _search_flat, which also serves the
    compacted cache — this function only runs the probing scans.)"""
    from ..ops import adc
    assert mode != "flat", "flat-mode searches go through _search_flat"
    use_super = (super_probe and mode == "cell_major" and group > 1
                 and probe_cap is not None and probe_cap < n_probe
                 and approx)
    if use_super:
        # supercell-native probing: select the top probe_cap supercells
        # directly from group-max coarse scores — same scanned volume as
        # the dedup+cap path, three sorts cheaper (see _coarse_probe_super)
        _, cells, mask = _coarse_probe_super(
            q, coarse_codebook, temperature, cap=probe_cap, group=group,
            n_cells=n_cells, use_smart=use_smart, precision=precision,
            approx=approx)
    else:
        _, cells, mask = _coarse_probe(
            q, coarse_codebook, temperature, n_probe=n_probe,
            use_smart=use_smart, precision=precision, approx=approx)
    if mode == "query_major":
        vals, addr = adc.scan_query_major(
            q, cells, mask, decoded, norms, is_empty, cell_start,
            cell_capacity, k=k, distance=distance, s_max=s_max, approx=approx,
            precision=precision)
    else:
        # split-taper: run the rank taper as TWO scans — head probes at
        # full k_pair, tail probes at kp_tail — then one [nq, 2k] top-k.
        # The kernel's select-pass count (the in-kernel deep-k cost, ~
        # k_pair unrolled VPU passes per block) then scales with each
        # side's width instead of every block paying the head's. Under
        # an EXACT per-pair select this is identical to the single-launch
        # taper merge (a side's top-kp_tail is the prefix of its top-
        # k_pair extraction; global top-k membership implies side top-k
        # membership); under the approx select the bin count tracks each
        # side's k_pair, so the two paths are interchangeable
        # approximations of the same taper (recall recorded per sweep
        # row, equality pinned at the exact setting in tests).
        # Requires per-query-DISTINCT probe
        # entries (supercell-native probing, or group == 1) so no window
        # is scanned on both sides of the split.
        np_eff = probe_cap if (probe_cap is not None
                               and probe_cap < n_probe) else n_probe
        kp_res = k_pair if k_pair is not None \
            else (64 if (approx and k > 64) else k)
        use_split = (split_taper and merge_taper is not None and approx
                     and (use_super or group == 1)
                     and min(k, np_eff * kp_res) > 32
                     and np_eff > merge_taper[0]
                     and merge_taper[1] < kp_res)
        if use_split:
            p0 = merge_taper[0]
            kp_tail = max(merge_taper[1], util.cdiv(
                max(min(k, np_eff * kp_res) - p0 * kp_res, 0),
                max(np_eff - p0, 1)))
            scan_kw = dict(
                k=k, distance=distance, s_max=s_max, n_cells=n_cells,
                approx=approx, impl=impl, group=group, scales=scales,
                precision=precision, probe_cap=None, merge_taper=None,
                pre_grouped=use_super)
            v_h, a_h = adc.scan_cell_major(
                q, cells[:, :p0], mask[:, :p0], decoded, norms, is_empty,
                cell_start, cell_capacity, k_pair=kp_res, **scan_kw)
            v_t, a_t = adc.scan_cell_major(
                q, cells[:, p0:], mask[:, p0:], decoded, norms, is_empty,
                cell_start, cell_capacity, k_pair=kp_tail, **scan_kw)
            both_v = jnp.concatenate([v_h, v_t], axis=1)
            both_a = jnp.concatenate([a_h, a_t], axis=1)
            vals, sel = jax.lax.top_k(both_v, k)
            addr = jnp.take_along_axis(both_a, sel, axis=1)
            adc.LAST_GATE["split"] = (p0, kp_tail)  # trace-time record
        else:
            vals, addr = adc.scan_cell_major(
                q, cells, mask, decoded, norms, is_empty, cell_start,
                cell_capacity, k=k, distance=distance, s_max=s_max,
                n_cells=n_cells, approx=approx, impl=impl, group=group,
                scales=scales, precision=precision,
                probe_cap=None if use_super else probe_cap,
                k_pair=k_pair, merge_taper=merge_taper,
                pre_grouped=use_super)
    if addr_map is not None:
        # scanning the compacted layout: translate back to storage addresses
        addr = jnp.where(addr >= 0, addr_map[jnp.maximum(addr, 0)], -1)
    ids = jnp.where(addr >= 0, address2id[jnp.maximum(addr, 0)], -1)
    return vals, ids, addr


class IVFPQIndex(CellContainer):
    def __init__(self, d_vector, n_subvectors=8, n_cells=128,
                 initial_size=None, expand_step_size=128,
                 expand_mode="double", distance="euclidean", device=None,
                 pq_use_residual=False, verbose=0,
                 scan_cache_dtype=None, scan_mode="auto", n_bits=8, seed=0,
                 anisotropic_eta=None, anisotropic_iters=8,
                 pack_ingest=None):
        assert d_vector % n_subvectors == 0
        assert n_bits in (4, 8), "n_bits must be 4 or 8"
        if n_bits == 4:
            # packed-nibble storage: two 16-cluster codes per byte (the
            # reference's 4-bit layout, ivfpq4_top1_v1.cu). All consumers of
            # the packed bytes go through _scan_codebook (a byte-pair view of
            # the 16-entry codebooks — see codec/pq.py:paired_codebook), so
            # nothing downstream ever unpacks.
            assert n_subvectors % 2 == 0, "4-bit PQ needs even n_subvectors"
        self.n_bits = int(n_bits)
        if initial_size is None:
            initial_size = expand_step_size
        code_bytes = n_subvectors // 2 if n_bits == 4 else n_subvectors
        # packed-at-ingest storage for the code-domain (capacity) tier:
        # codes are WRITTEN into [cap/g, g*m] rows (g = 128//m, a full
        # 128-lane minor dim), so the multi-GB u8 store is copy-free for
        # every read at any scale — no post-hoc freeze_codes() repack
        # needed (the repack transiently copies, capping it at ~half-HBM;
        # ARCHITECTURE.md "layout wall"). Eligible when m | 128 and m >= 8
        # (g must divide 16 so a packed row never spans a 16-aligned cell
        # start). pack_ingest: None = auto, False = force legacy unpacked.
        _code_domain = str(scan_cache_dtype
                           or config.SCAN_CACHE_DTYPE) == "none"
        _eligible = (code_bytes >= 8 and code_bytes < 128
                     and 128 % code_bytes == 0)
        if pack_ingest is None:
            # round 5: packed storage is the default for EVERY eligible
            # 8-bit index, not just the code-domain tier — the unpacked
            # [cap, m<128] u8 store hits the lane-padding layout wall in
            # the ADD path's scatter at multi-GB scale (donation fails on
            # the padded layout; the 50M int8-tier build OOMed on a
            # ~6.7 GB transient of its own 3.35 GB codes). Scans of cache
            # tiers never read the codes, and every codes reader
            # (relayout, cache rebuild, storage_rows, save/load) is
            # pack-aware.
            pack_ingest = _eligible and (n_bits == 8 or _code_domain)
        elif pack_ingest:
            assert _eligible, \
                "pack_ingest requires 8 <= code bytes < 128 dividing 128"
        super().__init__(
            code_size=code_bytes, n_cells=n_cells, dtype="uint8",
            device=device, initial_size=initial_size,
            expand_step_size=expand_step_size, expand_mode=expand_mode,
            use_inverse_id_mapping=True, contiguous_size=4, verbose=verbose,
            pack_group=128 // code_bytes if pack_ingest else 1)
        self.d_vector = d_vector
        self.n_subvectors = n_subvectors
        self.d_subvector = d_vector // n_subvectors
        self.distance = canonical_distance(distance)
        self.pq_use_residual = pq_use_residual
        self.n_probe = 1
        self._use_precomputed = pq_use_residual  # parity flag; cache subsumes it
        self._use_cublas = True
        self._use_smart_probing = True
        self._smart_probing_temperature = 30.0
        self._use_tensor_core = True
        self._fp16_scale_mode = "a"
        self._use_approx_topk = False
        self.scan_mode = scan_mode
        # spill assignment (off by default; see _assign_cells)
        self.spill_cells = 1
        self.spill_capacity = None
        # "device" (ops/spill.py round-based, no per-item host sync) or
        # "host" (native C++ greedy, exact arrival order)
        self.spill_impl = "device"
        # block-scan implementation: "auto" (the fused double-buffered
        # Pallas kernel whenever its gate passes — measured 1.3-1.6x the
        # XLA block loop at the 1M bench shape — else XLA), "xla"
        # (lax.map + dynamic_slice), or "pallas" (demand the kernel; warns
        # and falls back if the gate fails, e.g. k_pair > 64 / manhattan /
        # int8 cache)
        self.scan_impl = "auto"
        # supercell grouping: scan `scan_group` adjacent cells per block
        # (fewer, larger window DMAs; extra scored neighbors only help recall)
        self.scan_group = 1
        # static probe-axis cap under grouping: keep each query's best
        # `scan_probe_cap` DISTINCT supercells (None = off, "auto" =
        # 2x-slack over n_probe/group, int = explicit). Locality-ordered
        # cell ids make a 2x cap nearly lossless while shrinking the
        # scan's static costs (grid, unsort, merge) by n_probe/cap —
        # the deep-k (k=100) bookkeeping lever. Approx mode only.
        self.scan_probe_cap = None
        # per-pair partial width override (None = the scan's auto choice:
        # k for k <= 64, else 64). Deep-k tuning surface: at small n_probe
        # the per-cell winner count is high and k_pair is load-bearing for
        # recall; at large n_probe a smaller k_pair cuts the select passes,
        # unsort payload, and merge width ~linearly (ops/adc.py).
        self.scan_k_pair = None
        # rank-tapered deep-k merge (None = off, or (p0, kp_tail)): the
        # first p0 probed pairs keep all k_pair partial columns, the rest
        # are truncated to kp_tail before the final merge. Pairs arrive
        # coarse-rank-ordered, so tail pairs rarely hold deep winners —
        # an ANN-semantics throughput knob like scan_probe_cap, recorded
        # per sweep row (ops/adc.py:_merge_pairs).
        self.scan_merge_taper = None
        # supercell-native probing (on by default): when grouping + a
        # probe cap are engaged, select the top-cap supercells directly
        # from group-max coarse scores instead of deduping cell-level
        # probes — identical scanned volume, same-or-fuller probed set,
        # three sorts cheaper (_coarse_probe_super). Opt-out switch for
        # A/B against the cell-level dedup path.
        self.scan_super_probe = True
        # split-taper (on by default): run an engaged merge taper as two
        # scans (head pairs at full k_pair, tail at kp_tail) + one
        # [nq, 2k] top-k — bit-identical results, but the kernel's
        # per-block select passes shrink to each side's width
        # (_search_full). Opt-out for A/B against the single launch.
        self.scan_split_taper = True

        cache_dtype = scan_cache_dtype or config.SCAN_CACHE_DTYPE
        # scan_cache_dtype="none": keep NO decoded cache — scans read the
        # canonical uint8 codes via the one-hot matmul path
        # (ops/onehot_adc.py). m B/slot of scan memory (the reference's
        # exact contract) + 4 B/slot norms, at ~m*256/d x the scoring FLOPs.
        self._code_domain = str(cache_dtype) == "none"
        # _frozen_codes is REGISTERED state: a frozen index must round-trip
        # save/load with mutation still blocked (ADVICE r3 #2). The packed
        # layout itself self-heals on load: CellContainer._after_load
        # re-derives pack_group from the stored row width.
        self.register_state("_frozen_codes", False)  # see freeze_codes()
        assert not (self._code_domain and pq_use_residual), \
            "scan_cache_dtype='none' does not support pq_use_residual yet " \
            "(the per-cell centroid term is not in the code LUT)"
        # lane-pad the cache width to a multiple of 128 for d > 128
        # (e.g. GIST's 960 -> 1024): the Pallas scan's candidate-window DMA
        # needs the trailing dim to tile (d % 128 == 0), and zero columns
        # are invisible to every dot product. Queries are padded to match
        # at the scan entry points (util.pad_cols). +6.7% cache at d=960;
        # exact no-op when d is already a multiple of 128.
        self._d_cache = (util.round_up(d_vector, 128) if d_vector > 128
                         else d_vector)
        if not self._code_domain:
            self.add_aux_store("decoded", self._d_cache, cache_dtype)
        self.add_aux_store("norm", 1, "float32")
        self._int8_cache = (not self._code_domain
                            and str(cache_dtype) == "int8")
        assert not (self._int8_cache and self.distance == "manhattan"), \
            "int8 scan cache does not support manhattan distance"
        if self._int8_cache:
            # per-slot symmetric dequant scale for the int8 decoded cache
            self.add_aux_store("scale", 1, "float32")

        # reference codec hyperparameters (IVFPQIndex.py:63-79)
        self.register_module("vq_codec", VQCodec(
            n_clusters=n_cells, n_redo=1, max_iter=15, tol=1e-4,
            distance="euclidean", init_mode="random", verbose=verbose,
            seed=seed))
        self.register_module("pq_codec", PQCodec(
            d_vector=d_vector, n_subvectors=n_subvectors,
            n_clusters=16 if n_bits == 4 else 256,
            distance=distance, verbose=verbose, seed=seed,
            anisotropic_eta=anisotropic_eta,
            anisotropic_iters=anisotropic_iters))
        self._ivfpq_topk = IVFPQTopk(n_cells=n_cells, mode=scan_mode)
        # compacted flat-scan cache: (mutation counter it was built at,
        # (decoded, norms, is_empty, addr_map, scales))
        self._flat_cache = None
        # cell-aware compacted layout for the probed scans (see
        # _cell_compacted); "auto" enables it when windows shrink >= 1.25x
        self.scan_compact = "auto"
        self._compact_cache = None
        # the scan caches are derived from the codes: relayout drops and
        # recomputes them instead of gathering (halves its peak memory)
        if self._code_domain:
            self.set_aux_rebuilder(("norm",), self._rebuild_scan_cache)
        else:
            self.set_aux_rebuilder(
                ("decoded", "norm")
                + (("scale",) if self._int8_cache else ()),
                self._rebuild_scan_cache)

    def _rerank_cache_parts(self):
        """(rerank_codes, rerank_codebook) to fold into the decoded cache —
        (None, None) here; IVFPQRIndex overrides (its cache rows are the
        full two-stage reconstruction)."""
        return None, None

    def _rebuild_scan_cache(self):
        """Recompute decoded/norm(/scale) from the canonical codes in
        ~512 MB blocks (see CellContainer.set_aux_rebuilder). Never-written
        slots decode to garbage instead of zeros; every consumer masks by
        is_empty, so that is unobservable."""
        cap, d = self._capacity, self._d_cache
        dec_dt = (jnp.float32 if self._code_domain
                  else self._aux["decoded"][1])
        chunk = min(cap, util.next_pow2(max(16384, (1 << 27) // max(d, 1))))
        vq_rows = (self._coarse_cb()
                   if self.pq_use_residual else None)
        rr_store, rr_cb = self._rerank_cache_parts()
        dec = (None if self._code_domain else jnp.zeros((cap, d), dec_dt))
        nrm = jnp.zeros((cap, 1), jnp.float32)
        sc = jnp.zeros((cap, 1), jnp.float32) if self._int8_cache else None
        for i in range(util.cdiv(cap, chunk)):
            c0 = min(i * chunk, cap - chunk)
            db, nb, sb = _cache_chunk(
                self._storage, self._cell_start,
                self._scan_codebook, vq_rows, c0, chunk=chunk,
                int8=self._int8_cache, out_dtype=dec_dt,
                residual=self.pq_use_residual,
                rerank_storage=rr_store, rr_codebook=rr_cb,
                pack_g=self.pack_group)
            if dec is not None:
                dec = _write_rows(dec, util.pad_cols(db, d), c0)
            nrm = _write_rows(nrm, nb, c0)
            if sb is not None:
                sc = _write_rows(sc, sb, c0)
        if self._code_domain:
            return {"norm": nrm}
        out = {"decoded": dec, "norm": nrm}
        if self._int8_cache:
            out["scale"] = sc
        return out

    # ---- tunable properties (reference IVFPQIndex.py:89-232) ----
    @property
    def use_cublas(self):
        return self._use_cublas

    @use_cublas.setter
    def use_cublas(self, value):
        self._use_cublas = bool(value)

    @property
    def use_tensor_core(self):
        return self._use_tensor_core

    @use_tensor_core.setter
    def use_tensor_core(self, value):
        self._use_tensor_core = bool(value)

    @property
    def fp16_scale_mode(self):
        return self._fp16_scale_mode

    @fp16_scale_mode.setter
    def fp16_scale_mode(self, value):
        assert value in ("a", "b", "both", "none")
        self._fp16_scale_mode = value

    @property
    def use_smart_probing(self):
        return self._use_smart_probing

    @use_smart_probing.setter
    def use_smart_probing(self, value):
        self._use_smart_probing = bool(value)

    @property
    def smart_probing_temperature(self):
        return self._smart_probing_temperature

    @smart_probing_temperature.setter
    def smart_probing_temperature(self, value):
        assert value > 0
        self._smart_probing_temperature = float(value)

    @property
    def use_approx_topk(self):
        """TPU-native approximate top-k for coarse probing and in-scan
        selection (jax.lax.approx_max_k). Slight recall trade for large
        speedups; off by default for exactness parity with the reference."""
        return self._use_approx_topk

    @use_approx_topk.setter
    def use_approx_topk(self, value):
        self._use_approx_topk = bool(value)
        self._ivfpq_topk.approx = bool(value)

    @property
    def use_precomputed(self):
        return self._use_precomputed

    @use_precomputed.setter
    def use_precomputed(self, value):
        self._use_precomputed = bool(value)

    @property
    def is_trained(self):
        return self.vq_codec.is_trained and self.pq_codec.is_trained

    # ---- packed-storage view (n_bits=4) ----
    def _pack_codes(self, codes_nm):
        """Codec codes [n, m] -> canonical stored bytes [n, code_size]."""
        if self.n_bits == 8:
            return codes_nm
        return (codes_nm[:, 0::2] * 16 + codes_nm[:, 1::2]).astype(jnp.uint8)

    @property
    def _scan_codebook(self):
        """Codebook matching the STORED bytes: the PQ codebook itself at
        n_bits=8, the byte-pair view (codec/pq.py:paired_codebook) at
        n_bits=4. Every consumer of self._storage decodes/scores against
        this, so packed nibbles never need unpacking. Cached against the
        centroid array's identity (changes on train/load only)."""
        cb = self.pq_codec.codebook_internal
        if self.n_bits == 8:
            return cb
        cached = getattr(self, "_paired_cb", None)
        if cached is None or cached[0] is not cb:
            from ..codec.pq import paired_codebook
            cached = (cb, paired_codebook(cb))
            self._paired_cb = cached
        return cached[1]

    def _decode_stored(self, codes):
        """Stored bytes [n, code_size] -> [n, d] reconstruction."""
        from ..codec.pq import _decode_nd
        cb = self._scan_codebook
        m, _, dsub = cb.shape
        return _decode_nd(jnp.asarray(codes), cb, m=m, dsub=dsub)

    # codec hyperparameter pass-throughs (reference IVFPQIndex.py:172-232)
    @property
    def pq_max_iter(self):
        return self.pq_codec.kmeans.max_iter

    @pq_max_iter.setter
    def pq_max_iter(self, v):
        self.pq_codec.kmeans.max_iter = int(v)

    @property
    def vq_max_iter(self):
        return self.vq_codec.kmeans.max_iter

    @vq_max_iter.setter
    def vq_max_iter(self, v):
        self.vq_codec.kmeans.max_iter = int(v)

    # ---- training (reference IVFPQIndex.py:234-260) ----
    def train(self, x, force_retrain=False):
        if self.is_trained and not force_retrain:
            self.print_message("index is already trained", 1)
            return
        x = jnp.asarray(x).astype(jnp.float32)
        assert x.shape[0] == self.d_vector
        if self.distance == "cosine":
            x = util.normalize(x, axis=0)
        self.print_message("training VQ codec...", 1)
        self.vq_codec.train(x)
        # locality-relabel the cell ids (recursive PCA bisection of the
        # coarse centroids, util.locality_order): id-adjacent cells become
        # spatially adjacent, so supercell grouping (scan_group) collapses
        # a query's probed cells into few shared windows. Pure relabeling
        # before any add — the probed cell set, and hence recall, is
        # unchanged at group=1. No reference counterpart (GPU scans don't
        # window by id-adjacency).
        km = self.vq_codec.kmeans
        order = util.locality_order(np.asarray(km._centroids[0]))
        km._centroids = km._centroids[:, jnp.asarray(order)]
        self.print_message("training PQ codec...", 1)
        if self.pq_use_residual:
            code = self.vq_codec.encode(x)
            recon = self.vq_codec.decode(code)
            self.pq_codec.train(x - recon)
        else:
            self.pq_codec.train(x)
        self.print_message("index trained successfully", 1)

    # ---- codec exposure (reference IVFPQIndex.py:262-314) ----
    def encode(self, x):
        x = jnp.asarray(x).astype(jnp.float32)
        assert x.shape[0] == self.d_vector
        if self.distance == "cosine":
            x = util.normalize(x, axis=0)
        if self.pq_use_residual:
            vq_code = self.vq_codec.encode(x)
            recon = self.vq_codec.decode(vq_code)
            pq_code = self.pq_codec.encode(x - recon)
            return pq_code, vq_code
        return self.pq_codec.encode(x)

    def decode(self, x):
        if self.pq_use_residual:
            pq_code, vq_code = x
            return self.vq_codec.decode(vq_code) + self.pq_codec.decode(pq_code)
        return self.pq_codec.decode(x)

    # ---- ingestion (reference IVFPQIndex.py:316-364) ----
    def _assign_cells(self, x):
        """Coarse assignment, optionally with spill: when `spill_cells` > 1
        and a cell is at `spill_capacity`, overflow items go to their
        next-best cell. Bounded cells keep the scan's per-block window
        (s_max) near the mean cell size — on TPU every probed cell pays for
        s_max slots, so unbounded hot cells tax every query. Off by default
        (reference semantics: always the argmax cell)."""
        if self.spill_cells <= 1 or self.spill_capacity is None:
            return np.asarray(self.vq_codec.encode(x))
        from ..ops.max_sim import topk_sim
        l = self.spill_cells
        _, top = topk_sim(
            jnp.asarray(x).T.astype(jnp.float32),
            self._coarse_cb(), l, "euclidean",
            approx=self._use_approx_topk)
        if self.spill_impl == "device":
            # device-resident routing (ops/spill.py): keeps the [n, l]
            # candidate matrix off the host entirely, so add() never syncs
            # a per-item transfer — critical when H2D/D2H serialize and a
            # mid-add readback would stall the next chunk's upload
            from ..ops.spill import spill_assign_device
            cells, _ = spill_assign_device(
                top.astype(jnp.int32), self._cell_size,
                cap=int(self.spill_capacity), n_cells=self.n_cells)
            return cells
        from .. import native
        # host routing: D2H rides a slow link in dev environments; cell ids
        # fit int16 whenever n_cells does, halving the transfer
        if self.n_cells <= 32767:
            top_host = np.asarray(top.astype(jnp.int16)).astype(np.int32)
        else:
            top_host = np.asarray(top)
        out, _ = native.spill_assign(
            top_host, self._cell_size_np.copy(),
            int(self.spill_capacity))
        return out

    def freeze_codes(self):
        """Pack raw-codes storage to [cap/g, 128] rows for copy-free serving.

        Code-domain (scan_cache_dtype='none') only. At 100M-slot scale XLA
        re-lays any read of the u8 [cap, m<128] storage into a lane-padded
        whole-array copy — 2x 9.2 GB, an instant OOM on one 16 GB chip. The
        packed view's minor dim is a full 128-lane tile, which all three
        scan fetch paths slice with zero copy; the repack itself is a
        donated reshape (aliased, no copy). Mutations (add/remove) are
        blocked until unfreeze_codes().

        Since round 4 eligible indexes pack AT INGEST (pack_ingest auto-on:
        the container itself keeps the [cap/g, g*m] layout, so there is no
        multi-GB transient repack at all) and freeze is a pure flag flip
        that blocks mutation. On a legacy unpacked index this performs the
        donated-reshape migration to the packed layout. No-op when m >= 128,
        m does not divide 128, or m < 8 (g must divide 16 so a packed row
        never spans a 16-aligned cell start — ADVICE r3 #1). Reference
        memory contract preserved either way:
        torchpq/kernels/cuda/ivfpq_topk.cu:650-679 (m B/slot)."""
        if not self._code_domain:
            raise ValueError("freeze_codes is for scan_cache_dtype='none'")
        if self._frozen_codes:
            return
        m = self.code_size
        g = 128 // m if (8 <= m < 128 and 128 % m == 0) else 1
        if g == 1 or self._capacity % g:
            return
        if self.pack_group == 1:
            # legacy unpacked storage: [cap, m] -> [cap/g, g*m] groups g
            # consecutive slots per row — exactly the packed-at-ingest
            # layout, so every pack_group code path now applies
            self.register_state("_storage", _pack_codes(self._storage))
            self.pack_group = g
            self._mutations += 1  # invalidate layout-derived caches
        self._frozen_codes = True

    def unfreeze_codes(self):
        """Re-enable mutation. Storage STAYS packed: since round 4 the
        container mutates [cap/g, g*m] rows natively (CellContainer
        pack_group), so unfreezing is a flag flip, not an unpack copy."""
        self._frozen_codes = False

    def _assert_unfrozen(self, what):
        if self._frozen_codes:
            raise RuntimeError(
                f"{what} on a frozen code-domain index — call "
                "unfreeze_codes() first (freeze_codes packs storage rows "
                "for copy-free serving)")

    def remove(self, ids=None, address=None):
        self._assert_unfrozen("remove")
        return super().remove(ids=ids, address=address)

    def add(self, x, ids=None, return_address=False):
        self._assert_unfrozen("add")
        x = jnp.asarray(x).astype(jnp.float32)
        assert x.shape[0] == self.d_vector
        assert self.is_trained, "train the index first"
        if self.distance == "cosine":
            x = util.normalize(x, axis=0)
        x_nd = x.T
        cells = self._assign_cells(x)  # coarse assignment [n]
        if self.pq_use_residual:
            recon = self.vq_codec.decode(cells).T  # [n, d]
            codes_nm = self.pq_codec.encode_nd(x_nd - recon)
            decoded = recon + self.pq_codec.decode_nd(codes_nm)
        else:
            codes_nm = self.pq_codec.encode_nd(x_nd)
            decoded = self.pq_codec.decode_nd(codes_nm)
        norms = jnp.sum(jnp.square(decoded), axis=-1, keepdims=True)
        aux_rows = {"norm": norms}
        if self._code_domain:
            pass  # codes ARE the scan data; nothing cached beyond norms
        elif self._int8_cache:
            q, scale = util.int8_quantize_rows(decoded)
            aux_rows["decoded"] = util.pad_cols(q, self._d_cache)
            aux_rows["scale"] = scale[:, None]
        else:
            aux_rows["decoded"] = util.pad_cols(decoded, self._d_cache)
        return super().add(
            self._pack_codes(codes_nm).T, cells, ids=ids,
            return_address=return_address, aux_rows=aux_rows)

    # ---- search (reference IVFPQIndex.py:407-524) ----
    def search_cells(self, x, cells, probe_mask=None, k=1,
                     return_address=False):
        """Scan explicit cells per query. x: [d_vector, nq];
        cells: [nq, n_probe] (distinct per row). Honors the index's current
        scan_mode/scan_impl/scan_group/use_approx_topk exactly like
        search()."""
        x = jnp.asarray(x).astype(jnp.float32)
        if self.distance == "cosine":
            x = util.normalize(x, axis=0)
        q = x.T
        cells = jnp.asarray(cells).astype(jnp.int32)
        if probe_mask is None:
            probe_mask = jnp.ones(cells.shape, bool)
        precision = (config.SEARCH_PRECISION if self._use_tensor_core
                     else jax.lax.Precision.HIGHEST)
        vals, addr = self._ivfpq_topk.topk(
            q, cells, probe_mask,
            self._storage if self._code_domain else self.aux("decoded"),
            self._aux_col0("norm"), self._is_empty,
            self._cell_start, self._cell_capacity,
            k=int(k), distance=self.distance, s_max=self.max_cell_capacity,
            scales=self._aux_col0("scale") if self._int8_cache else None,
            mode=self.scan_mode, approx=self._use_approx_topk,
            impl=self.scan_impl, group=self.scan_group, precision=precision,
            pq_codebook=(self._scan_codebook
                         if self._code_domain else None),
            probe_cap=self._resolved_probe_cap(cells.shape[1]),
            m=(self.code_size if self._code_domain and self.pack_group > 1
               else None))
        ids = self.get_id_by_address(addr)
        ids = jnp.where(addr >= 0, ids, -1)
        if return_address:
            return vals, ids, addr
        return vals, ids

    def _aux_col0(self, name):
        """Memoized 1-D view of a [cap, 1] aux store (norm/scale).

        search() runs on the host's critical path: an eager `aux(x)[:, 0]`
        slice per call costs a Python dispatch each (~2 ms on this 1-core
        host x several eager ops = the measured ~18 ms per-search gap
        between index.search and its jitted parts, r5 profile). Cached per
        mutation counter like the flat/compact caches."""
        ver = self._mutations
        cache = self.__dict__.setdefault("_aux_col0_cache", {})
        hit = cache.get(name)
        if hit is not None and hit[0] == ver:
            return hit[1]
        arr = self.aux(name)[:, 0]
        cache[name] = (ver, arr)
        return arr

    def _coarse_cb(self):
        """Memoized [n_cells, d] coarse codebook view (the eager [0] slice
        of the kmeans' [1, k, d] centroids costs a dispatch per call)."""
        cents = self.vq_codec.kmeans._centroids
        hit = self.__dict__.get("_coarse_cb_cache")
        if hit is not None and hit[0] is cents:
            return hit[1]
        cb = cents[0]
        self._coarse_cb_cache = (cents, cb)
        return cb

    def _temp_dev(self):
        """Memoized device scalar of the smart-probing temperature (a
        per-call jnp.float32() is an H2D + dispatch on the hot path)."""
        t = float(self._smart_probing_temperature)
        hit = self.__dict__.get("_temp_dev_cache")
        if hit is not None and hit[0] == t:
            return hit[1]
        dev = jnp.float32(t)
        self._temp_dev_cache = (t, dev)
        return dev

    def _flat_compacted_codes(self):
        """(codes, norms, is_empty, addr_map, m_packed) with dead slots
        squeezed out — the code-domain flat sweep's input
        (scan_cache_dtype='none'). m_packed is the per-slot code width when
        `codes` is returned in the packed [cap/g, g*m] layout (compaction
        skipped), None when codes are unpacked [n_pad, m] rows.

        Compaction is skipped when the storage is packed AND large: the
        compaction gather's unpacked u8 output would itself pay the 2x
        lane-padding re-lay (at the 100M demo's 9.2 GB that IS the OOM) —
        dead slots ride the penalty stream instead."""
        ver = self._mutations
        if (self._flat_cache is not None and self._flat_cache[0] == ver):
            return self._flat_cache[1]
        g = self.pack_group
        m_packed = self.code_size if g > 1 else None
        n = max(int(self.n_items), 1)
        unit = 131072 if n > 131072 else 2048
        n_pad = util.round_up(n, unit)
        big = self._storage.nbytes > (1 << 30)
        if n_pad >= self.capacity or (g > 1 and big):
            res = (self._storage, self.aux("norm")[:, 0], self._is_empty,
                   None, m_packed)
        else:
            res = _compact_codes_cache(
                self._storage, self.aux("norm")[:, 0], self._is_empty,
                n_pad=n_pad, pack_g=g) + (None,)
        self._flat_cache = (ver, res)
        return res

    def _cell_compacted(self):
        """Unified compacted scan layout (lazily rebuilt per mutation):
        (decoded, norms, is_empty, addr_map, scales, cell_start_live,
        cell_size_live, s_live). Live rows packed per cell into 16-aligned
        contiguous segments — serves the flat sweep (live rows + ~3% pad)
        AND the probed scans with s_max = largest live cell instead of the
        largest cell *capacity* (2-4x smaller windows under pow2 + spill
        headroom). s_live is bucketed to multiples of 128 so growth causes
        bounded retraces."""
        ver = self._mutations
        if self._compact_cache is not None and self._compact_cache[0] == ver:
            return self._compact_cache[1]
        sizes = np.asarray(self._cell_size_np, dtype=np.int64)
        caps16 = ((sizes + 15) // 16) * 16
        new_start = np.zeros_like(caps16)
        np.cumsum(caps16[:-1], out=new_start[1:])
        total = int(caps16.sum())
        unit = 131072 if total > 131072 else 2048
        n_pad = util.round_up(max(total, 16), unit)
        s_live = min(util.round_up(max(int(caps16.max()), 16), 128), n_pad)
        scales = self.aux("scale")[:, 0] if self._int8_cache else None
        dec, nrm, emp, amap, sc = _compact_cells_cache(
            self.aux("decoded"), self.aux("norm")[:, 0], scales,
            self._is_empty, self._cell_start,
            jnp.asarray(new_start, jnp.int32), n_pad=n_pad)
        res = (dec, nrm, emp, amap, sc,
               jnp.asarray(new_start, jnp.int32),
               jnp.asarray(sizes, jnp.int32), s_live)
        self._compact_cache = (ver, res)
        return res

    def _use_compact_scan(self):
        """Auto policy for routing probed scans through the compacted
        layout: pay the duplicate cache only when it shrinks the scanned
        window meaningfully and the copy is affordable."""
        if self.scan_compact is True:
            return True
        if self.scan_compact is False or self._code_domain:
            return False
        sizes = self._cell_size_np
        if sizes.max() == 0:
            return False
        caps16 = ((int(sizes.max()) + 15) // 16) * 16
        s_live = min(((caps16 + 127) // 128) * 128, self.capacity)
        itemsize = 1 if self._int8_cache else (
            2 if str(self._aux["decoded"][1]) in ("bfloat16",) else 4)
        copy_bytes = int(sizes.sum()) * 1.1 * (self.d_vector * itemsize + 8)
        return s_live * 1.25 <= self.max_cell_capacity \
            and copy_bytes <= 4 * (1 << 30)

    def _flat_compacted(self):
        """(decoded, norms, is_empty, addr_map, scales) for the flat sweep,
        with dead slots squeezed out. Rebuilt lazily after any container
        mutation; a no-op passthrough when capacity is already tight."""
        ver = self._mutations
        if self._flat_cache is not None and self._flat_cache[0] == ver:
            return self._flat_cache[1]
        scales = self._aux_col0("scale") if self._int8_cache else None
        n = max(int(self.n_items), 1)
        unit = 131072 if n > 131072 else 2048
        n_pad = util.round_up(n, unit)
        # passthrough unless compaction removes a meaningful fraction:
        # under exact presize capacity is ~1.05x n_items, and the full
        # cache copy (6.7 GB at the 50M int8 demo) OOMed to save 5% of
        # sweep width
        if n_pad * 8 >= self.capacity * 7:
            res = (self.aux("decoded"), self._aux_col0("norm"),
                   self._is_empty, None, scales)
        elif self._use_compact_scan():
            # share the cell-aware layout instead of keeping two copies
            res = self._cell_compacted()[:5]
        else:
            dec, nrm, emp, amap, sc = _compact_flat_cache(
                self.aux("decoded"), self.aux("norm")[:, 0],
                self._is_empty, scales, n_pad=n_pad)
            res = (dec, nrm, emp, amap, sc)
        self._flat_cache = (ver, res)
        return res


    def _codes_kernel_eligible(self):
        """Static mirror of the Pallas codes-scan gate for the planner —
        delegates to the SAME shape predicate the dispatch uses
        (ops/pallas_codes_scan.codes_kernel_static_gate), so packed
        indexes the kernel cannot serve (e.g. d_vector=32/64/96, whose
        XLA one-hot fallback costs ~512x) are priced correctly
        (ADVICE r4 #1 — pinned by tests/test_planner.py)."""
        from ..ops.pallas_codes_scan import codes_kernel_static_gate
        if self.pack_group <= 1:
            return False
        m = self._storage.shape[1] // self.pack_group  # packed B/slot
        return codes_kernel_static_gate(
            m, self.pack_group, self.d_vector, self.distance)

    def _resolved_probe_cap(self, n_probe):
        """Static probe_cap for this search (None disables truncation)."""
        cap = self.scan_probe_cap
        if cap is None or self.scan_group <= 1 or not self._use_approx_topk:
            return None
        if cap == "auto":
            cap = max(2 * util.cdiv(n_probe, self.scan_group), 8)
        cap = int(cap)
        return cap if cap < n_probe else None

    def plan_scan_mode(self, nq, k):
        """The scan plan `search` will run for a [d, nq] batch at this k:
        'flat', 'cell_major', or 'query_major'. scan_mode != 'auto' pins it.

        Query planning: the dense MXU sweep costs ~2.5 ps per
        query-slot pair vs ~250-450 ps for the block-sparse IVF scan
        (gathers + per-pair merge bookkeeping), measured on v5e at the
        100k and 1M bench shapes. Route to the exhaustive sweep when
        its slot count is within ~128x of what probing would touch —
        it's then at least as fast AND recall rises to the ADC
        ceiling (n_probe stays an accuracy floor, as the reference
        documents it; serving the request with a better plan is fair).
        The 128x crossover is the approx-epilogue cost model; it
        applies at k <= 32 (and at high d, where the IVF scan's
        [blocks, p_tile, d] query-tile gather dominates — measured
        d=960, k=100: IVF 342 q/s vs flat 39.9k at better recall).
        k > 32 takes flat_adc_auto's EXACT multi-chunk epilogue
        (a per-chunk full sort), costlier per slot — but the probed
        scan's k>32 bookkeeping (k_pair=64 unsort payload + exact
        final merge) is costlier still: measured on the 1M class
        sweep at k=100, flat 201k q/s @ recall 0.921 beats EVERY
        probed point (np=1: 83k @ 0.145, np=8: 103k @ 0.507) — so
        the k>32 crossover multiplier is 512, covering np=1 at 1M
        with margin while still letting genuinely huge indexes probe.

        The planner crossovers are pinned by tests/test_planner.py — every
        headline benchmark number depends on which plan actually ran."""
        mode = self.scan_mode
        if mode != "auto":
            return mode
        n_probe = min(self.n_probe, self.n_cells)
        mode = ("query_major" if nq < self._ivfpq_topk.batch_threshold
                else "cell_major")
        s_pow2 = util.next_pow2(self.max_cell_capacity)
        touched = n_probe * s_pow2
        n_live = max(int(self.n_items), 1)
        if self._code_domain:
            # the code-domain planner compares the probed codes scan
            # against the decode-on-the-fly flat sweep (not the dense
            # sweep). Two regimes, measured on the 1M class shape:
            #   * Pallas codes kernel engaged (packed storage, resident
            #     decode matrix fits VMEM): probing pays from ~12x
            #     pruning — np=32 (30x) 43.3k q/s vs flat 23.0k, np=128
            #     (7.6x) 18.8k vs 23.0k (..._sift1m_codes_r4.json, r4).
            #   * XLA one-hot fallback (m < 8, manhattan, or d too wide
            #     for the decode matrix, e.g. d=960 PQ64 -> 32 MB): the
            #     probed scan costs ~750x more per touched slot (np=32:
            #     3.6k vs flat 23k, r3), so probing needs ~512x pruning
            #     (the 100M single-chip demo regime).
            mult = 12 if self._codes_kernel_eligible() else 512
            if touched * mult >= n_live:
                mode = "flat"
        elif int(k) <= 32 or self.d_vector >= 512:
            if self._use_approx_topk and touched * 128 >= n_live:
                mode = "flat"
        elif touched * 512 >= n_live:
            mode = "flat"
        return mode

    def search(self, x, k=1, return_address=False):
        """x: [d_vector, nq] -> (values [nq, k], ids [nq, k]).

        Runs the fully-fused query path (_search_full): one device dispatch
        for coarse + probe + scan + id translation."""
        x = jnp.asarray(x).astype(jnp.float32)
        assert x.shape[0] == self.d_vector
        if self.distance == "cosine":
            x = util.normalize(x, axis=0)
        q = x.T
        nq = q.shape[0]
        n_probe = min(self.n_probe, self.n_cells)
        precision = (config.SEARCH_PRECISION if self._use_tensor_core
                     else jax.lax.Precision.HIGHEST)
        mode = self.plan_scan_mode(nq, int(k))
        if self._code_domain:
            # code domain serves two plans: the one-hot cell-major scan and
            # the one-hot decode-on-the-fly flat sweep (auto-planned above
            # with the code-domain cost model, or explicitly requested).
            m_packed = self.code_size if self.pack_group > 1 else None
            if mode == "flat":
                codes_c, nrm_c, emp_c, amap_c, m_c = \
                    self._flat_compacted_codes()
                vals, ids, addr = _search_flat_codes(
                    q, codes_c, nrm_c, emp_c, amap_c, self._address2id,
                    self._scan_codebook, k=int(k),
                    distance=self.distance,
                    approx=self._use_approx_topk, precision=precision,
                    m=m_c)
            else:
                vals, ids, addr = _search_full_codes(
                    q, self._coarse_cb(), self._storage,
                    self._aux_col0("norm"), self._is_empty,
                    self._cell_start, self._cell_capacity,
                    self._address2id, self._scan_codebook,
                    self._temp_dev(),
                    k=int(k), n_probe=n_probe,
                    use_smart=self._use_smart_probing, precision=precision,
                    distance=self.distance, s_max=self.max_cell_capacity,
                    n_cells=self.n_cells, approx=self._use_approx_topk,
                    m=m_packed, impl=self.scan_impl,
                    k_pair=self.scan_k_pair)
            if return_address:
                return vals, ids, addr
            return vals, ids
        if self._int8_cache and mode != "flat":
            mode = "cell_major"  # int8 path lives in the cell-major scan
        if mode == "flat":
            dec, nrm, emp, amap, sc = self._flat_compacted()
            vals, ids, addr = _search_flat(
                q, dec, nrm, emp, amap, self._address2id,
                k=int(k), distance=self.distance,
                approx=self._use_approx_topk, impl=self.scan_impl,
                scales=sc, precision=precision)
            if return_address:
                return vals, ids, addr
            return vals, ids
        if self._use_compact_scan():
            dec, nrm, emp, amap, sc, cs_live, sz_live, s_live = \
                self._cell_compacted()
            vals, ids, addr = _search_full(
                q, self._coarse_cb(), dec, nrm, emp,
                cs_live, sz_live, self._address2id,
                self._temp_dev(),
                k=int(k), n_probe=n_probe,
                use_smart=self._use_smart_probing, precision=precision,
                distance=self.distance, s_max=s_live,
                n_cells=self.n_cells, mode=mode,
                approx=self._use_approx_topk, impl=self.scan_impl,
                group=self.scan_group, scales=sc, addr_map=amap,
                probe_cap=self._resolved_probe_cap(n_probe),
                k_pair=self.scan_k_pair,
                merge_taper=self.scan_merge_taper,
                super_probe=self.scan_super_probe,
                split_taper=self.scan_split_taper)
            if return_address:
                return vals, ids, addr
            return vals, ids
        vals, ids, addr = _search_full(
            q, self._coarse_cb(),
            self.aux("decoded"), self._aux_col0("norm"), self._is_empty,
            self._cell_start, self._cell_capacity, self._address2id,
            self._temp_dev(),
            k=int(k), n_probe=n_probe, use_smart=self._use_smart_probing,
            precision=precision, distance=self.distance,
            s_max=self.max_cell_capacity, n_cells=self.n_cells, mode=mode,
            approx=self._use_approx_topk, impl=self.scan_impl,
            group=self.scan_group,
            scales=self._aux_col0("scale") if self._int8_cache else None,
            probe_cap=self._resolved_probe_cap(n_probe),
            k_pair=self.scan_k_pair,
            merge_taper=self.scan_merge_taper,
            super_probe=self.scan_super_probe,
            split_taper=self.scan_split_taper)
        if return_address:
            return vals, ids, addr
        return vals, ids

    # ---- rescoring extras (reference legacy/IVFPQ.py:253-311) ----
    def similarity_at_address(self, x, address):
        """Similarity of each query against the stored vector at `address`
        (v1-API capability the v2 reference dropped; kept here). Values
        match search()'s scoring exactly: cosine queries are normalized and
        int8 caches are dequantized."""
        x = jnp.asarray(x).astype(jnp.float32)
        if self.distance == "cosine":
            x = util.normalize(x, axis=0)
        q = x.T
        address = jnp.asarray(address)
        valid = (address >= 0) & (address < self._capacity)
        safe = jnp.where(valid, address, 0)
        valid = valid & ~self._is_empty[safe]
        if self._code_domain:
            # no cache: decode the few requested rows from their codes
            # (storage_rows handles the packed-at-ingest layout)
            y = self._decode_stored(self.storage_rows(safe))
        else:
            y = self.aux("decoded")[safe].astype(jnp.float32)
        if self._int8_cache:
            y = y * self.aux("scale")[safe]
        y_sq = self.aux("norm")[safe, 0]
        from ..ops.adc import _block_scores
        q = util.pad_cols(q, y.shape[-1])  # lane-padded decoded cache
        sims = _block_scores(q[None], y[None], y_sq[None], self.distance)[0]
        return jnp.where(valid[None, :], sims, -jnp.inf)

    def similarity_at_id(self, x, ids):
        return self.similarity_at_address(
            x, self.get_address_by_id(jnp.asarray(ids)))
