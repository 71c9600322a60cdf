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
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from .. import util
from ..metric import canonical_distance
from ..ops import adc
from .mesh import get_mesh


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "k", "n_probe", "use_smart", "distance",
                     "s_max", "c_loc", "mode", "p_tile"))
def _sharded_search(mesh, decoded, norms, is_empty, cell_start, cell_capacity,
                    ids_sh, codebook, q, temperature, *, axis, k, n_probe,
                    use_smart, distance, s_max, c_loc, mode, p_tile):
    d_count = mesh.devices.size

    def local(dec, nrm, emp, cstart, ccap, ids, codebook, q, temperature):
        dec, nrm, emp = dec[0], nrm[0], emp[0]
        cstart, ccap, ids = cstart[0], ccap[0], ids[0]
        my = jax.lax.axis_index(axis)

        from ..index.ivfpq import _coarse_probe
        _, cells, mask = _coarse_probe(
            q, codebook, temperature, n_probe=n_probe,
            use_smart=use_smart, precision=None)
        local_mask = mask & (cells % d_count == my)
        local_cells = jnp.minimum(cells // d_count, c_loc - 1)
        if mode == "cell_major":
            vals, addr = adc.scan_cell_major(
                q, local_cells, local_mask, dec, nrm, emp, cstart, ccap,
                k=k, distance=distance, s_max=s_max, n_cells=c_loc,
                p_tile=p_tile)
        else:
            vals, addr = adc.scan_query_major(
                q, local_cells, local_mask, dec, nrm, emp, cstart, ccap,
                k=k, distance=distance, s_max=s_max)
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
                  P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return fn(decoded, norms, is_empty, cell_start, cell_capacity, ids_sh,
              codebook, q, temperature)


class ShardedIVFPQSearcher:
    def __init__(self, index, mesh=None, scan_mode="cell_major", p_tile=128):
        self.index = index
        self.mesh = mesh if mesh is not None else get_mesh()
        self.axis = self.mesh.axis_names[0]
        self.n_shards = self.mesh.devices.size
        self.distance = index.distance
        self.scan_mode = scan_mode
        self.p_tile = p_tile
        self._build_state()

    def _build_state(self):
        """Host-side re-layout: gather each shard's cells contiguously."""
        idx = self.index
        d_count = self.n_shards
        n_cells = idx.n_cells
        starts = np.asarray(idx._cell_start, np.int64)
        caps = np.asarray(idx._cell_capacity, np.int64)
        decoded = np.asarray(idx.aux("decoded"))
        norms = np.asarray(idx.aux("norm"))[:, 0]
        empty = np.asarray(idx._is_empty)
        a2i = np.asarray(idx._address2id)

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
        lstart = np.zeros((d_count, c_loc), np.int32)
        lcap = np.zeros((d_count, c_loc), np.int32)
        self.s_max = 1
        for s in range(d_count):
            off = 0
            own = np.arange(s, n_cells, d_count)
            for j, c in enumerate(own):
                a, w = int(starts[c]), int(caps[c])
                lstart[s, j] = off
                lcap[s, j] = w
                dec_sh[s, off:off + w] = decoded[a:a + w]
                nrm_sh[s, off:off + w] = norms[a:a + w]
                emp_sh[s, off:off + w] = empty[a:a + w]
                ids_sh[s, off:off + w] = a2i[a:a + w]
                off += w
                self.s_max = max(self.s_max, w)

        shard = NamedSharding(self.mesh, P(self.axis))
        put = functools.partial(jax.device_put, device=shard)
        self.decoded = put(jnp.asarray(dec_sh))
        self.norms = put(jnp.asarray(nrm_sh))
        self.is_empty = put(jnp.asarray(emp_sh))
        self.ids = put(jnp.asarray(ids_sh))
        self.cell_start = put(jnp.asarray(lstart))
        self.cell_capacity = put(jnp.asarray(lcap))
        repl = NamedSharding(self.mesh, P())
        self.codebook = jax.device_put(
            idx.vq_codec.kmeans._centroids[0], repl)

    def search(self, x, k=1):
        """x: [d_vector, nq] -> (values [nq, k], ids [nq, k]); executes the
        scan on every chip of the mesh and merges over ICI."""
        idx = self.index
        x = jnp.asarray(x).astype(jnp.float32)
        if self.distance == "cosine":
            x = util.normalize(x, axis=0)
        q = x.T
        n_probe = min(idx.n_probe, idx.n_cells)
        return _sharded_search(
            self.mesh, self.decoded, self.norms, self.is_empty,
            self.cell_start, self.cell_capacity, self.ids, self.codebook,
            q, jnp.float32(idx.smart_probing_temperature),
            axis=self.axis, k=int(k), n_probe=n_probe,
            use_smart=idx.use_smart_probing, distance=self.distance,
            s_max=util.next_pow2(self.s_max), c_loc=self.cells_per_shard,
            mode=self.scan_mode, p_tile=self.p_tile)


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
