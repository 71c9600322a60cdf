"""Stage-accounting of scan_cell_major at the 1M bench shape.

Separately times every stage of the probed scan (coarse probe, pair pack,
query-tile gather, the fused Pallas kernel, unsort gather, final merge)
plus the composed op and index.search, so optimization effort lands on the
measured bottleneck instead of the assumed one.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

_cache_dir = os.path.expanduser("~/.cache/torchpq_tpu_jax")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_data
from torchpq_tpu.index import IVFPQIndex
from torchpq_tpu.index.ivfpq import _coarse_probe
from torchpq_tpu.ops import adc
from torchpq_tpu.ops.pallas_scan import scan_blocks_pallas
from torchpq_tpu import util


def timeit(f, *a, reps=5):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps * 1e3
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.ravel()[0])  # poison check
    return dt


@functools.partial(jax.jit, static_argnames=("n_cells", "p_tile", "b_max"))
def _pack(cells, mask, *, n_cells, p_tile, b_max):
    return adc._pack_pairs(cells, mask, n_cells=n_cells, p_tile=p_tile,
                           b_max=b_max)


@jax.jit
def _qgather(query_bf16, qidx_all):
    return query_bf16[qidx_all]


@functools.partial(jax.jit, static_argnames=("s_eff", "block_chunk"))
def _pen_map(penalty_arr, start_c_all, off_all, cap_all, *, s_eff,
             block_chunk):
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    slot_iota = jnp.arange(s_eff, dtype=jnp.int32)

    def pen_chunk(args):
        start_c, off, capc = args
        pen = jnp.stack([
            jax.lax.dynamic_slice(penalty_arr, (start_c[i],), (s_eff,))
            for i in range(block_chunk)])
        in_cell = ((slot_iota[None, :] >= off[:, None])
                   & (slot_iota[None, :] < (off + capc)[:, None]))
        return pen + jnp.where(in_cell, 0.0, big)

    b_max = start_c_all.shape[0]
    nbc = b_max // block_chunk
    return jax.lax.map(
        pen_chunk,
        (start_c_all.reshape(nbc, block_chunk),
         off_all.reshape(nbc, block_chunk),
         cap_all.reshape(nbc, block_chunk))).reshape(b_max, s_eff)


@functools.partial(jax.jit, static_argnames=("s_eff",))
def _pen_flat_gather(penalty_arr, start_c_all, off_all, cap_all, *, s_eff):
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    slot_iota = jnp.arange(s_eff, dtype=jnp.int32)
    pen = penalty_arr[start_c_all[:, None] + slot_iota[None, :]]
    in_cell = ((slot_iota[None, :] >= off_all[:, None])
               & (slot_iota[None, :] < (off_all + cap_all)[:, None]))
    return pen + jnp.where(in_cell, 0.0, big)


@functools.partial(jax.jit, static_argnames=("s_eff",))
def _pen_row16_gather(pen16, start_c_all, off_all, cap_all, *, s_eff):
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    b_max = start_c_all.shape[0]
    rows = (start_c_all[:, None] // 16
            + jnp.arange(s_eff // 16, dtype=jnp.int32)[None, :])
    pen = pen16[rows].reshape(b_max, s_eff)
    slot_iota = jnp.arange(s_eff, dtype=jnp.int32)
    in_cell = ((slot_iota[None, :] >= off_all[:, None])
               & (slot_iota[None, :] < (off_all + cap_all)[:, None]))
    return pen + jnp.where(in_cell, 0.0, big)


@functools.partial(jax.jit, static_argnames=("p_tile", "k_pair", "b_max"))
def _unsort(combo, pair_block, pair_slot, *, p_tile, k_pair, b_max):
    bo_safe = jnp.minimum(pair_block, b_max - 1)
    pc = combo.reshape(b_max * p_tile, k_pair)[bo_safe * p_tile + pair_slot]
    return jnp.where((pair_block < b_max)[:, None], pc, jnp.int32(-2 ** 31))


@functools.partial(jax.jit, static_argnames=("k", "slot_mask"))
def _final_merge(pc, *, k, slot_mask):
    sel = adc._sortable_i32_f32(pc)
    fvs, fi = jax.lax.approx_max_k(sel, k)
    packed_w = jnp.take_along_axis(pc, fi, axis=1)
    slot = packed_w & jnp.int32(slot_mask)
    return fvs, slot


def main():
    n_base, d, n_cells, m, nq = 1_000_000, 128, 4096, 64, 10_000
    base, query = make_data(n_base, nq, d, spectrum="manifold-12")
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       initial_size=(n_base // n_cells) * 2)
    index.use_approx_topk = True
    index.spill_cells = 8
    index.spill_capacity = index.max_cell_capacity
    t0 = time.perf_counter()
    state = "/tmp/profile_1m_state.npz"
    if os.path.exists(state):
        index.load(state)
        print(f"loaded {state} in {time.perf_counter() - t0:.0f}s",
              flush=True)
    else:
        index.train(jnp.asarray(base[:100_000]).T)
        for i in range(0, n_base, 250_000):
            index.add(jnp.asarray(base[i:i + 250_000]).T)
        index.save(state)
        print(f"build {time.perf_counter() - t0:.0f}s  "
              f"s_max={index.max_cell_capacity}", flush=True)

    q = jnp.asarray(query)
    q_bf16 = q.astype(jnp.bfloat16)
    cb = index.vq_codec.kmeans._centroids[0]
    decoded = index.aux("decoded")
    norms = index.aux("norm")[:, 0]
    is_empty = index._is_empty
    cstart = index._cell_start
    ccap = index._cell_capacity
    s_max = int(index.max_cell_capacity)
    cap_total = decoded.shape[0]
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    penalty_arr = jnp.where(is_empty, big, norms)
    jax.block_until_ready(penalty_arr)

    for n_probe in (8, 32, 128):
        k = 10
        p_tile, block_chunk = 128, 8
        n_pairs = nq * n_probe
        dt = timeit(lambda: _coarse_probe(
            q, cb, jnp.float32(30.0), n_probe=n_probe, use_smart=True,
            precision=None, approx=True))
        print(f"np={n_probe} coarse: {dt:.1f} ms", flush=True)
        _, cells, mask = _coarse_probe(q, cb, jnp.float32(30.0),
                                       n_probe=n_probe, use_smart=True,
                                       precision=None, approx=True)
        b_max = util.round_up(
            min(n_cells, n_pairs) + util.cdiv(n_pairs, p_tile), block_chunk)
        dt = timeit(lambda: _pack(cells, mask, n_cells=n_cells,
                                  p_tile=p_tile, b_max=b_max))
        print(f"  pack (b_max={b_max}): {dt:.1f} ms", flush=True)
        pair_block, pair_slot, block_cell, probers = _pack(
            cells, mask, n_cells=n_cells, p_tile=p_tile, b_max=b_max)
        qidx_all = jnp.maximum(probers, 0)
        cell_all = jnp.maximum(block_cell, 0)
        start_all = cstart[cell_all]
        cap_all = ccap[cell_all]
        s_eff = min(s_max, cap_total)
        start_c_all = jnp.clip(start_all, 0, cap_total - s_eff)
        off_all = start_all - start_c_all
        jax.block_until_ready((qidx_all, start_c_all))

        dt = timeit(_qgather, q_bf16, qidx_all)
        print(f"  qvecs gather [{b_max}x{p_tile}x{d}]: {dt:.1f} ms",
              flush=True)
        qvecs = _qgather(q_bf16, qidx_all)

        pen16 = penalty_arr.reshape(-1, 16)
        dt = timeit(lambda: _pen_map(penalty_arr, start_c_all, off_all,
                                     cap_all, s_eff=s_eff,
                                     block_chunk=block_chunk))
        print(f"  pen staging (map-slice): {dt:.1f} ms", flush=True)
        dt = timeit(lambda: _pen_flat_gather(penalty_arr, start_c_all,
                                             off_all, cap_all, s_eff=s_eff))
        print(f"  pen staging (flat gather): {dt:.1f} ms", flush=True)
        dt = timeit(lambda: _pen_row16_gather(pen16, start_c_all, off_all,
                                              cap_all, s_eff=s_eff))
        print(f"  pen staging (row16 gather): {dt:.1f} ms", flush=True)
        pen_all = _pen_flat_gather(penalty_arr, start_c_all, off_all,
                                   cap_all, s_eff=s_eff)

        k_pair = k
        s_pow2 = util.next_pow2(s_eff)
        slot_mask = s_pow2 - 1
        for bps in (2, 4, 8):
            dt = timeit(lambda bps=bps: scan_blocks_pallas(
                qvecs, start_c_all, pen_all, decoded,
                s_eff=s_eff, k_pair=k_pair, p_tile=p_tile,
                distance="euclidean", approx=True, slot_mask=slot_mask,
                bps=bps))
            print(f"  pallas kernel bps={bps} [{b_max} blocks x {s_eff}w]: "
                  f"{dt:.1f} ms", flush=True)
        combo = scan_blocks_pallas(
            qvecs, start_c_all, pen_all, decoded,
            s_eff=s_eff, k_pair=k_pair, p_tile=p_tile, distance="euclidean",
            approx=True, slot_mask=slot_mask)

        dt = timeit(lambda: _unsort(combo, pair_block, pair_slot,
                                    p_tile=p_tile, k_pair=k_pair,
                                    b_max=b_max))
        print(f"  unsort gather [{n_pairs}x{k_pair}]: {dt:.1f} ms",
              flush=True)
        pc = _unsort(combo, pair_block, pair_slot, p_tile=p_tile,
                     k_pair=k_pair, b_max=b_max)
        pcq = pc.reshape(nq, n_probe * k_pair)
        dt = timeit(lambda: _final_merge(pcq, k=k, slot_mask=slot_mask))
        print(f"  final merge [{nq}x{n_probe * k_pair}]: {dt:.1f} ms",
              flush=True)

        for impl in ("pallas", "xla"):
            dt = timeit(lambda impl=impl: adc.scan_cell_major(
                q, cells, mask, decoded, norms, is_empty, cstart, ccap,
                k=k, distance="euclidean", s_max=s_max, n_cells=n_cells,
                approx=True, impl=impl))
            print(f"  scan_cell_major[{impl}]: {dt:.1f} ms -> "
                  f"{nq / dt * 1e3:,.0f} q/s", flush=True)
        index.n_probe = n_probe
        index.scan_impl = "pallas"
        index.scan_mode = "cell_major"
        dt = timeit(lambda: index.search(q.T, k=k))
        print(f"  index.search[cell_major]: {dt:.1f} ms -> "
              f"{nq / dt * 1e3:,.0f} q/s", flush=True)
        index.scan_mode = "auto"


if __name__ == "__main__":
    main()
