"""Sharded IVFPQ search over a device mesh.

The TPU-native counterpart of what the reference's unfinished "Distributed"
storage sketches (per-cell pointer tables,
torchpq/container/DistributedCellContainer.py — single-device; SURVEY.md
§2.6/§5.8). Here distribution is real multi-chip execution:

* IVF cells are assigned round-robin to shards (cell c -> shard c % D, local
  index c // D) so the coarse top-n_probe's load spreads evenly;
* coarse codebook and queries are replicated; each shard runs the local fused
  scan over the cells it owns (probes for other shards' cells are masked);
* per-shard [nq, k] candidates merge with one all-gather over ICI plus a
  local re-top-k — k <= 1024 makes the gather D*k*8 bytes per query, cheap
  relative to the scan (SURVEY.md §5.8 sizing).

State is built once from a trained+filled IVFPQIndex (host-side re-layout)
and placed as [D, ...]-stacked arrays sharded on the leading axis.

All three cache tiers shard: bf16/f32 decoded, int8 (+per-slot scales), and
code-domain (`scan_cache_dtype='none'` — shards hold the raw uint8 codes at
m B/slot and scan via ops/onehot_adc.py, composing the capacity-per-chip
story with the chips axis: D chips hold D x what one chip's HBM fits).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from .. import config
from .. import util
from ..metric import canonical_distance
from ..ops import adc
from .mesh import get_mesh


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "k", "n_probe", "use_smart", "distance",
                     "s_max", "c_loc", "mode", "p_tile", "group", "precision",
                     "approx"))
def _sharded_search(mesh, decoded, norms, is_empty, cell_start, cell_capacity,
                    ids_sh, scales_sh, codebook, pq_cb, q, temperature, *,
                    axis, k, n_probe, use_smart, distance, s_max, c_loc, mode,
                    p_tile, group=1, precision=None, approx=False):
    d_count = mesh.devices.size
    int8 = decoded.dtype == jnp.int8  # scales_sh is a [D, 1] dummy otherwise
    # code-domain shards hold uint8 codes; pq_cb is a [1,1,1] dummy otherwise
    code_domain = decoded.dtype == jnp.uint8

    def local(dec, nrm, emp, cstart, ccap, ids, sc, codebook, pq_cb, q,
              temperature):
        dec, nrm, emp = dec[0], nrm[0], emp[0]
        cstart, ccap, ids = cstart[0], ccap[0], ids[0]
        sc = sc[0] if int8 else None
        my = jax.lax.axis_index(axis)
        big = jnp.float32(jnp.finfo(jnp.float32).max / 4)

        if mode == "flat":
            # exhaustive local sweep: no probing at all; every shard
            # brute-forces its own cells and the ICI merge is unchanged —
            # the multi-chip max-recall operating point
            penalty = jnp.where(
                emp, big, nrm if distance == "euclidean" else 0.0)
            if code_domain:
                from ..ops.onehot_adc import flat_decode_scan
                vals, addr = flat_decode_scan(q, dec, penalty, pq_cb, k=k,
                                              distance=distance, approx=True,
                                              precision=precision)
            else:
                from ..ops.flat_adc import flat_adc_scan
                vals, addr = flat_adc_scan(q, dec, penalty, k=k,
                                           distance=distance, approx=True,
                                           precision=precision, scales=sc)
        else:
            from ..index.ivfpq import _coarse_probe
            # approx rides through exactly like the single-chip path:
            # lax.top_k over n_cells per shard is a full sort the planner
            # avoids (r4 VERDICT Weak #6)
            _, cells, mask = _coarse_probe(
                q, codebook, temperature, n_probe=n_probe,
                use_smart=use_smart, precision=precision, approx=approx)
            local_mask = mask & (cells % d_count == my)
            local_cells = jnp.minimum(cells // d_count, c_loc - 1)
            if code_domain:
                from ..ops.onehot_adc import scan_cell_major_codes
                vals, addr = scan_cell_major_codes(
                    q, local_cells, local_mask, dec, nrm, emp, cstart, ccap,
                    pq_cb, k=k, distance=distance, s_max=s_max,
                    n_cells=c_loc, p_tile=p_tile, precision=precision,
                    approx=approx)
            elif mode == "cell_major":
                vals, addr = adc.scan_cell_major(
                    q, local_cells, local_mask, dec, nrm, emp, cstart, ccap,
                    k=k, distance=distance, s_max=s_max, n_cells=c_loc,
                    p_tile=p_tile, group=group, precision=precision,
                    scales=sc, approx=approx)
            else:
                vals, addr = adc.scan_query_major(
                    q, local_cells, local_mask, dec, nrm, emp, cstart, ccap,
                    k=k, distance=distance, s_max=s_max,
                    precision=precision, approx=approx)
        lids = jnp.where(addr >= 0, ids[jnp.maximum(addr, 0)], -1)
        # merge across shards over ICI
        gv = jax.lax.all_gather(vals, axis)   # [D, nq, k]
        gi = jax.lax.all_gather(lids, axis)
        gv = jnp.moveaxis(gv, 0, 1).reshape(q.shape[0], -1)
        gi = jnp.moveaxis(gi, 0, 1).reshape(q.shape[0], -1)
        fv, fi = jax.lax.top_k(gv, k)
        fids = jnp.take_along_axis(gi, fi, axis=1)
        fids = jnp.where(jnp.isfinite(fv), fids, -1)
        return fv, fids

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return fn(decoded, norms, is_empty, cell_start, cell_capacity, ids_sh,
              scales_sh, codebook, pq_cb, q, temperature)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "n_pad"))
def _sharded_compact(mesh, decoded, norms, is_empty, ids_sh, scales_sh, *,
                     axis, n_pad):
    """Per-shard live-row compaction for flat mode (same trick as
    index/ivfpq.py:_compact_flat_cache): each shard squeezes its dead slots
    out so the exhaustive sweep pays only for live rows. Ids are translated
    here, so the search path needs no address map."""
    int8 = decoded.dtype == jnp.int8

    def local(dec, nrm, emp, ids, sc):
        dec, nrm, emp, ids = dec[0], nrm[0], emp[0], ids[0]
        amap = jnp.nonzero(~emp, size=n_pad, fill_value=-1)[0] \
            .astype(jnp.int32)
        valid = amap >= 0
        safe = jnp.maximum(amap, 0)
        sc_c = sc[0][safe] if int8 else sc[0]
        return (dec[safe][None], jnp.where(valid, nrm[safe], 0.0)[None],
                (~valid)[None], jnp.where(valid, ids[safe], -1)[None],
                sc_c[None])

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis),) * 5,
                   out_specs=(P(axis),) * 5,
                   check_vma=False)
    return fn(decoded, norms, is_empty, ids_sh, scales_sh)


@functools.partial(jax.jit, static_argnames=("mesh", "axis"),
                   donate_argnums=(1, 2, 3, 4, 5))
def _sharded_add(mesh, decoded, norms, is_empty, ids_sh, scales_sh, rows,
                 row_norms, row_scales, shard_of, slots, new_ids, *, axis):
    """Scatter a replicated batch into the sharded stores: each shard takes
    the items whose shard_of matches its mesh index. `rows` arrive already
    in the cache dtype (quantized by the caller for int8); scales_sh /
    row_scales are [D, 1] / [n] dummies on float caches."""
    cap_sh = decoded.shape[1]
    int8 = decoded.dtype == jnp.int8

    def local(dec, nrm, emp, ids, sc, rows, row_norms, row_scales, shard_of,
              slots, new_ids):
        my = jax.lax.axis_index(axis)
        tgt = jnp.where(shard_of == my, slots, cap_sh)  # foreign -> dropped
        dec = dec.at[0, tgt].set(rows.astype(dec.dtype), mode="drop")
        nrm = nrm.at[0, tgt].set(row_norms, mode="drop")
        emp = emp.at[0, tgt].set(False, mode="drop")
        ids = ids.at[0, tgt].set(new_ids, mode="drop")
        if int8:
            sc = sc.at[0, tgt].set(row_scales, mode="drop")
        return dec, nrm, emp, ids, sc

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(), P(),
                  P(), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_vma=False)
    return fn(decoded, norms, is_empty, ids_sh, scales_sh, rows, row_norms,
              row_scales, shard_of, slots, new_ids)


class ShardedIVFPQSearcher:
    def __init__(self, index, mesh=None, scan_mode="cell_major", p_tile=128,
                 scan_group=1):
        self._int8 = bool(getattr(index, "_int8_cache", False))
        self._codes = bool(getattr(index, "_code_domain", False))
        assert not ((self._int8 or self._codes)
                    and scan_mode == "query_major"), \
            "int8/code-domain tiers have no query_major path — use " \
            "cell_major or flat"
        self.index = index
        self.mesh = mesh if mesh is not None else get_mesh()
        self.axis = self.mesh.axis_names[0]
        self.n_shards = self.mesh.devices.size
        self.distance = index.distance
        self.scan_mode = scan_mode
        self.p_tile = p_tile
        self.scan_group = scan_group
        self._flat_sh = None  # compacted per-shard state for flat mode
        self._build_state()

    def _build_state(self):
        """Host-side re-layout: gather each shard's cells contiguously."""
        idx = self.index
        d_count = self.n_shards
        n_cells = idx.n_cells
        starts = np.asarray(idx._cell_start, np.int64)
        caps = np.asarray(idx._cell_capacity, np.int64)
        # code-domain shards scan the raw uint8 codes (the m B/slot memory
        # contract survives sharding; `decoded` names the scan payload)
        decoded = np.asarray(idx._storage if self._codes
                             else idx.aux("decoded"))
        if self._codes and getattr(idx, "pack_group", 1) > 1:
            # packed-at-ingest storage: unpack to per-slot rows on the HOST
            # (a free numpy reshape — no XLA layout re-lay fires here)
            decoded = decoded.reshape(-1, idx.code_size)
        norms = np.asarray(idx.aux("norm"))[:, 0]
        empty = np.asarray(idx._is_empty)
        a2i = np.asarray(idx._address2id)
        scale = (np.asarray(idx.aux("scale"))[:, 0] if self._int8
                 else None)

        self.cells_per_shard = util.cdiv(n_cells, d_count)
        shard_caps = np.zeros(d_count, np.int64)
        for s in range(d_count):
            own = np.arange(s, n_cells, d_count)
            shard_caps[s] = caps[own].sum()
        cap_sh = util.next_pow2(int(shard_caps.max())) if shard_caps.max() else 1

        c_loc = self.cells_per_shard
        dec_sh = np.zeros((d_count, cap_sh, decoded.shape[1]), decoded.dtype)
        nrm_sh = np.zeros((d_count, cap_sh), norms.dtype)
        emp_sh = np.ones((d_count, cap_sh), bool)
        ids_sh = np.full((d_count, cap_sh), -1, np.int64)
        sc_sh = (np.zeros((d_count, cap_sh), np.float32) if self._int8
                 else np.zeros((d_count, 1), np.float32))
        lstart = np.zeros((d_count, c_loc), np.int32)
        lcap = np.zeros((d_count, c_loc), np.int32)
        # one vectorized gather per shard (no per-cell loop — O(n_cells)
        # Python iterations took minutes at 256k cells): the shard's packed
        # region reads source rows repeat(starts - packed_prefix) + arange
        for s in range(d_count):
            own = np.arange(s, n_cells, d_count)
            reps = caps[own]
            prefix = np.concatenate([[0], np.cumsum(reps)[:-1]])
            total = int(reps.sum())
            lstart[s, :len(own)] = prefix
            lcap[s, :len(own)] = reps
            src = np.repeat(starts[own] - prefix, reps) + np.arange(total)
            dec_sh[s, :total] = decoded[src]
            nrm_sh[s, :total] = norms[src]
            emp_sh[s, :total] = empty[src]
            ids_sh[s, :total] = a2i[src]
            if self._int8:
                sc_sh[s, :total] = scale[src]
        self.s_max = int(caps.max()) if n_cells else 1

        shard = NamedSharding(self.mesh, P(self.axis))
        put = functools.partial(jax.device_put, device=shard)
        self.decoded = put(jnp.asarray(dec_sh))
        self.norms = put(jnp.asarray(nrm_sh))
        self.is_empty = put(jnp.asarray(emp_sh))
        self.ids = put(jnp.asarray(ids_sh))
        self.scales = put(jnp.asarray(sc_sh))
        self.cell_start = put(jnp.asarray(lstart))
        self.cell_capacity = put(jnp.asarray(lcap))
        repl = NamedSharding(self.mesh, P())
        self.codebook = jax.device_put(
            idx.vq_codec.kmeans._centroids[0], repl)
        # replicated PQ scan codebook for code-domain shards ([1,1,1] dummy
        # otherwise so the jitted search signature stays stable)
        self.pq_cb = jax.device_put(
            idx._scan_codebook if self._codes
            else jnp.zeros((1, 1, 1), jnp.float32), repl)
        # host shadows for sharded add routing: next free slot per local
        # cell = one past the LAST live slot (holes from prior removals are
        # not reused by the sharded path; they stay masked empty — an
        # occupancy *count* would point at a live slot and overwrite it)
        occ = ~emp_sh
        self._lstart_np = lstart
        self._lcap_np = lcap
        # per-cell "one past the last live slot", vectorized: scatter-max of
        # each live slot's in-cell position + 1 onto its cell
        self._next_free = np.zeros((d_count, c_loc), np.int64)
        for s in range(d_count):
            own = np.arange(s, n_cells, d_count)
            reps = lcap[s, :len(own)].astype(np.int64)
            prefix = lstart[s, :len(own)].astype(np.int64)
            total = int(reps.sum())
            cell_of = np.repeat(np.arange(len(own)), reps)
            pos = np.arange(total) - np.repeat(prefix, reps)
            live = occ[s, :total]
            np.maximum.at(self._next_free[s], cell_of[live], pos[live] + 1)
        self._max_id = int(a2i.max()) + 1 if (a2i >= 0).any() else 0

    def _grow_local(self, need):
        """Re-layout the sharded stores with grown capacities for the local
        cells in `need` {(shard, local_cell): required}. One functional
        host-side rebuild, pow2 growth (multi-chip analog of
        CellContainer._relayout)."""
        d_count = self.n_shards
        c_loc = self.cells_per_shard
        new_caps = self._lcap_np.copy().astype(np.int64)
        for (s, lc), req in need.items():
            new_caps[s, lc] = max(util.next_pow2(req), new_caps[s, lc])
        new_start = np.zeros_like(new_caps)
        new_start[:, 1:] = np.cumsum(new_caps[:, :-1], axis=1)
        cap_sh = util.next_pow2(int(new_caps.sum(axis=1).max()))

        names = ["decoded", "norms", "is_empty", "ids"]
        if self._int8:
            names.append("scales")
        old = {name: np.asarray(getattr(self, name)) for name in names}
        fills = {"decoded": 0, "norms": 0, "is_empty": True, "ids": -1,
                 "scales": 0}
        new = {}
        for name, arr in old.items():
            shape = (d_count, cap_sh) + arr.shape[2:]
            new[name] = np.full(shape, fills[name], arr.dtype)
        # vectorized scatter per shard: the old layout is packed (cells
        # back-to-back), so old rows [0, old_total) land at
        # repeat(new_start - old_prefix) + arange — no per-cell loop
        for s in range(d_count):
            old_caps = self._lcap_np[s].astype(np.int64)
            old_prefix = self._lstart_np[s].astype(np.int64)
            old_total = int(old_caps.sum())
            dst = (np.repeat(new_start[s] - old_prefix, old_caps)
                   + np.arange(old_total))
            for name, arr in old.items():
                new[name][s, dst] = arr[s, :old_total]
        shard = NamedSharding(self.mesh, P(self.axis))
        for name in old:
            setattr(self, name, jax.device_put(jnp.asarray(new[name]), shard))
        self.cell_start = jax.device_put(
            jnp.asarray(new_start.astype(np.int32)), shard)
        self.cell_capacity = jax.device_put(
            jnp.asarray(new_caps.astype(np.int32)), shard)
        self._lstart_np = new_start
        self._lcap_np = new_caps
        self.s_max = int(new_caps.max())
        self._flat_sh = None

    def _route_slots(self, cells):
        """(shard, slot) per item from its coarse cell — vectorized
        run-length arithmetic (the same sort + run-start trick as
        ops/spill.rank_in_group), O(arrays): never a Python iteration per
        distinct cell (at 256k cells a run-bounds loop costs minutes).
        Mutates the per-shard occupancy shadows; grows overflowing local
        cells first (one re-layout for all)."""
        n = cells.shape[0]
        shard_of = cells % self.n_shards
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        runs = np.flatnonzero(np.r_[True, sorted_cells[1:]
                                    != sorted_cells[:-1]])
        run_len = np.diff(np.r_[runs, n])
        run_cells = sorted_cells[runs]
        s_arr = run_cells % self.n_shards
        lc_arr = run_cells // self.n_shards
        req = self._next_free[s_arr, lc_arr] + run_len
        over = req > self._lcap_np[s_arr, lc_arr]
        if over.any():
            self._grow_local({(int(s), int(lc)): int(r) for s, lc, r in
                              zip(s_arr[over], lc_arr[over], req[over])})
        rank = np.arange(n) - np.repeat(runs, run_len)
        base = self._lstart_np[s_arr, lc_arr] + self._next_free[s_arr, lc_arr]
        slots = np.empty(n, np.int64)
        slots[order] = np.repeat(base, run_len) + rank
        # distinct (s, lc) per run makes the fancy-index add exact
        self._next_free[s_arr, lc_arr] += run_len
        return shard_of, slots

    def add(self, x, ids=None):
        """Route new vectors to their owning shards and append them.

        The multi-chip counterpart of IVFPQIndex.add (SURVEY.md §5.8 "adds
        route vectors to the owning shard"): coarse-assign + PQ-encode on the
        replicated codecs, compute every item's (shard, slot) on the host
        from the per-shard occupancy shadows, then one sharded scatter —
        each shard keeps only its own items (mask by cell % D).
        Cells must have room (use spill/bounded cells); overflow raises.
        """
        idx = self.index
        d_count = self.n_shards
        x = jnp.asarray(x).astype(jnp.float32)
        if self.distance == "cosine":
            x = util.normalize(x, axis=0)
        n = int(x.shape[1])
        if n == 0:
            return jnp.zeros((0,), util.id_dtype())
        cells = np.asarray(idx.vq_codec.encode(x)).astype(np.int64)
        if idx.pq_use_residual:
            recon = idx.vq_codec.decode(cells).T
            codes_nm = idx.pq_codec.encode_nd(x.T - recon)
            decoded_rows = recon + idx.pq_codec.decode_nd(codes_nm)
        else:
            codes_nm = idx.pq_codec.encode_nd(x.T)
            decoded_rows = idx.pq_codec.decode_nd(codes_nm)
        norms_rows = jnp.sum(jnp.square(decoded_rows), axis=-1)
        if self._codes:
            decoded_rows = idx._pack_codes(codes_nm)  # [n, m_st] uint8
            scale_rows = jnp.zeros((n,), jnp.float32)
        elif self._int8:
            decoded_rows, scale_rows = util.int8_quantize_rows(decoded_rows)
            decoded_rows = util.pad_cols(decoded_rows, self.decoded.shape[-1])
        else:
            scale_rows = jnp.zeros((n,), jnp.float32)
            decoded_rows = util.pad_cols(decoded_rows, self.decoded.shape[-1])
        if ids is None:
            # host _max_id shadow: the sharded id store is O(capacity) and
            # device-resident — gathering it per add() would put a full
            # D2H sync on the ingest critical path
            ids = np.arange(self._max_id, self._max_id + n, dtype=np.int64)
        else:
            ids = np.asarray(ids, dtype=np.int64)
        self._max_id = max(self._max_id, int(ids.max()) + 1)

        shard_of, slots = self._route_slots(cells)

        (self.decoded, self.norms, self.is_empty, self.ids,
         self.scales) = _sharded_add(
            self.mesh, self.decoded, self.norms, self.is_empty, self.ids,
            self.scales, decoded_rows, norms_rows, scale_rows,
            jnp.asarray(shard_of.astype(np.int32)),
            jnp.asarray(slots.astype(np.int32)),
            jnp.asarray(ids), axis=self.axis)
        self._flat_sh = None
        return jnp.asarray(ids)

    def remove(self, ids):
        """Mask the given ids out of every shard (holes stay empty — the
        sharded path appends past them, like CellContainer's masked
        removes). Returns the count actually removed."""
        rm = np.asarray(ids).reshape(-1)
        if rm.size == 0:
            return 0
        self.is_empty, self.ids, n = _sharded_remove(
            self.mesh, self.is_empty, self.ids, jnp.asarray(rm),
            axis=self.axis)
        self._flat_sh = None
        return int(np.asarray(n).reshape(-1)[0])

    def _flat_compacted(self):
        """Compacted per-shard (decoded, norms, is_empty, ids) for flat
        mode; rebuilt lazily after adds/grows. `_next_free` sums bound the
        per-shard live counts from above (equality when the source index
        had no removal holes)."""
        if self._flat_sh is not None:
            return self._flat_sh
        n_live = int(self._next_free.sum(axis=1).max())
        unit = 131072 if n_live > 131072 else 2048
        n_pad = min(util.round_up(max(n_live, 1), unit),
                    int(self.decoded.shape[1]))
        self._flat_sh = _sharded_compact(
            self.mesh, self.decoded, self.norms, self.is_empty, self.ids,
            self.scales,
            axis=self.axis, n_pad=n_pad)
        return self._flat_sh

    def search(self, x, k=1):
        """x: [d_vector, nq] -> (values [nq, k], ids [nq, k]); executes the
        scan on every chip of the mesh and merges over ICI."""
        idx = self.index
        x = jnp.asarray(x).astype(jnp.float32)
        if self.distance == "cosine":
            x = util.normalize(x, axis=0)
        q = x.T
        n_probe = min(idx.n_probe, idx.n_cells)
        if self.scan_mode == "flat":
            # flat ignores cell tables; sweep the compacted local caches
            dec, nrm, emp, ids_sh, sc = self._flat_compacted()
        else:
            dec, nrm, emp, ids_sh, sc = (self.decoded, self.norms,
                                         self.is_empty, self.ids,
                                         self.scales)
        return _sharded_search(
            self.mesh, dec, nrm, emp,
            self.cell_start, self.cell_capacity, ids_sh, sc, self.codebook,
            self.pq_cb, q, jnp.float32(idx.smart_probing_temperature),
            axis=self.axis, k=int(k), n_probe=n_probe,
            use_smart=idx.use_smart_probing, distance=self.distance,
            s_max=util.next_pow2(self.s_max), c_loc=self.cells_per_shard,
            mode=self.scan_mode, p_tile=self.p_tile, group=self.scan_group,
            approx=bool(idx._use_approx_topk),
            precision=(config.SEARCH_PRECISION if idx.use_tensor_core
                       else jax.lax.Precision.HIGHEST))


def data_parallel_lloyd_step(mesh, data_sharded, centroids, distance,
                             axis_name=None):
    """One data-parallel k-means iteration over the mesh: local fused
    assignment + local partial sums, then a psum over ICI.

    data_sharded: [D, n_local, d] sharded on axis 0; centroids [k, d]
    replicated. Returns new replicated centroids. This is the multi-chip
    counterpart of KMeans.fit's inner iteration (SURVEY.md §3.5).
    """
    axis = axis_name or mesh.axis_names[0]
    distance = canonical_distance(distance)
    n_clusters = centroids.shape[0]

    def step(data, cents):
        data = data[0]  # local [n_local, d]
        from ..ops.max_sim import max_sim
        from ..ops.segment_ops import compute_centroids
        _, labels = max_sim(data, cents, distance)
        sums, counts = compute_centroids(data, labels, n_clusters)
        sums = jax.lax.psum(sums, axis)
        counts = jax.lax.psum(counts, axis)
        new_c = jnp.where((counts > 0)[:, None],
                          sums / jnp.maximum(counts, 1.0)[:, None], cents)
        return new_c

    fn = shard_map(step, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(),
                   check_vma=False)
    return fn(data_sharded, centroids)


@functools.partial(jax.jit, static_argnames=("mesh", "axis"),
                   donate_argnums=(1, 2))
def _sharded_remove(mesh, is_empty, ids_sh, rm_ids, *, axis):
    """Mask out the slots holding any of rm_ids on every shard. O(cap * r)
    compares per shard — removal is an occasional maintenance op, not the
    ingest path. Returns the total removed across shards."""
    def local(emp, ids, rm):
        emp, ids = emp[0], ids[0]
        hit = ~emp & jnp.isin(ids, rm)
        emp = emp | hit
        ids = jnp.where(hit, -1, ids)
        n = jax.lax.psum(jnp.sum(hit.astype(jnp.int32)), axis)
        return emp[None], ids[None], n

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis), P(axis), P()),
                   out_specs=(P(axis), P(axis), P()),
                   check_vma=False)
    return fn(is_empty, ids_sh, rm_ids)


def data_parallel_kmeans_fit(data, n_clusters, *, mesh=None, max_iter=15,
                             tol=1e-4, distance="euclidean", seed=0,
                             axis_name=None, verbose=0):
    """Full data-parallel Lloyd over the mesh: rows shard across devices,
    centroid updates merge with one psum per iteration over ICI.

    data: [n, d] (host or replicated). Returns (centroids [k, d],
    n_iters). The multi-chip counterpart of KMeans.fit — the reference is
    single-GPU (SURVEY.md §2 parallelism inventory); n that doesn't divide
    the mesh is padded with rows whose labels are dropped from the sums.
    """
    mesh = mesh if mesh is not None else get_mesh()
    axis = axis_name or mesh.axis_names[0]
    d_count = mesh.devices.size
    distance = canonical_distance(distance)
    data = np.asarray(data, np.float32)
    n, d = data.shape
    n_loc = util.cdiv(n, d_count)
    pad = n_loc * d_count - n
    valid = np.ones((d_count, n_loc), bool)
    if pad:
        valid.reshape(-1)[n:] = False
        data = np.concatenate([data, np.zeros((pad, d), np.float32)])
    data_sh = jax.device_put(
        jnp.asarray(data.reshape(d_count, n_loc, d)),
        NamedSharding(mesh, P(axis)))
    valid_sh = jax.device_put(jnp.asarray(valid), NamedSharding(mesh, P(axis)))
    rng = np.random.default_rng(seed)
    cents = jnp.asarray(data[rng.choice(n, n_clusters, replace=False)])
    cents = jax.device_put(cents, NamedSharding(mesh, P()))
    it = 0
    for it in range(1, max_iter + 1):
        cents, err = _dp_kmeans_step(mesh, data_sh, valid_sh, cents,
                                     axis=axis, distance=distance,
                                     n_clusters=n_clusters)
        if float(err) <= tol:
            break
    return cents, it


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "distance", "n_clusters"))
def _dp_kmeans_step(mesh, data_sh, valid_sh, cents, *, axis, distance,
                    n_clusters):
    """One masked, psum-merged Lloyd iteration (module-level jit: a fresh
    closure per fit call would retrace every iteration — CLAUDE.md)."""
    def step(data, vmask, cents):
        data, vmask = data[0], vmask[0]
        from ..ops.max_sim import max_sim
        from ..ops.segment_ops import compute_centroids
        _, labels = max_sim(data, cents, distance)
        # padding rows get label n_clusters -> dropped by segment_sum
        labels = jnp.where(vmask, labels, n_clusters)
        sums, counts = compute_centroids(data, labels, n_clusters)
        sums = jax.lax.psum(sums, axis)
        counts = jax.lax.psum(counts, axis)
        new_c = jnp.where((counts > 0)[:, None],
                          sums / jnp.maximum(counts, 1.0)[:, None], cents)
        if distance == "cosine":
            new_c = util.normalize(new_c)
        err = jnp.sum(jnp.square(new_c - cents))
        return new_c, err

    fn = shard_map(step, mesh=mesh, in_specs=(P(axis), P(axis), P()),
                   out_specs=(P(), P()), check_vma=False)
    return fn(data_sh, valid_sh, cents)


def data_parallel_search(index, x, k=1, mesh=None):
    """Query-data-parallel search: the OTHER scaling axis.

    ShardedIVFPQSearcher shards *cells* (capacity scaling: each chip holds
    1/D of the index, every chip sees every query). This helper shards
    *queries* (throughput scaling: the whole index is replicated on every
    chip, each chip serves its own query slice with zero cross-chip
    communication). Right when the index fits one chip's HBM and query
    volume is the bottleneck — D chips give ~D x QPS.

    x: [d_vector, nq]; returns (values [nq, k], ids [nq, k]). Queries pad
    to a multiple of the mesh size; jit + shardings make XLA place the
    per-chip slices (no shard_map needed — the computation is pointwise
    over queries).
    """
    mesh = mesh if mesh is not None else get_mesh()
    axis = mesh.axis_names[0]
    d_count = mesh.devices.size
    x = jnp.asarray(x).astype(jnp.float32)
    nq = int(x.shape[1])
    pad = (-nq) % d_count
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    qshard = NamedSharding(mesh, P(None, axis))
    x = jax.device_put(x, qshard)
    # run the index's own search under the sharding constraint: state is
    # replicated, queries split on the batch axis, and the outputs inherit
    # the query sharding. The replicated placement is TEMPORARY — the
    # caller's index must come back exactly as it went in (placement and
    # derived caches included), so snapshot + restore around the search.
    repl = NamedSharding(mesh, P())
    state_names = ("_storage", "_address2id", "_is_empty", "_cell_start",
                   "_cell_capacity")
    saved = {name: getattr(index, name) for name in state_names}
    saved_aux = {name: index.aux(name) for name in index._aux}
    saved_caches = (index._flat_cache, index._compact_cache)
    try:
        for name in state_names:
            setattr(index, name, jax.device_put(saved[name], repl))
        for name in saved_aux:
            setattr(index, "_aux_" + name,
                    jax.device_put(saved_aux[name], repl))
        index._flat_cache = None  # rebuilt under the replicated placement
        index._compact_cache = None
        vals, ids = index.search(x, k=k)
        jax.block_until_ready((vals, ids))
    finally:
        for name in state_names:
            setattr(index, name, saved[name])
        for name in saved_aux:
            setattr(index, "_aux_" + name, saved_aux[name])
        index._flat_cache, index._compact_cache = saved_caches
    if pad:
        vals, ids = vals[:nq], ids[:nq]
    return vals, ids
