"""np=128 k=100 stage accounting (VERDICT r4 #4: 41.0k q/s at parity recall
vs the T4's 52.9k — one point left on the reference curve).

The r4 sweep's np=128 kp32 cap64 row ran 165 ms/10k-batch while a
component-sum budget predicts ~50 ms — this times every stage of that
EXACT config in isolation (coarse, supercell+cap, pack, staging, kernel,
unsort, merge) to find the 3x, then A/Bs merge variants:
  - full-width lax.top_k at 2048 (the width-gated default)
  - rank-tapered merge input (head pairs keep k_pair, tail pairs
    truncated): width 1408/1024/704
  - composed scans at k_pair 32/48/64, cap 32/64, group 4/8.
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
    np.asarray(leaf.ravel()[0])
    return dt


@functools.partial(jax.jit,
                   static_argnames=("group", "probe_cap", "n_cells"))
def _group_cap(cells, probe_mask, cell_start, cap_total, *, group,
               probe_cap, n_cells):
    """Replica of scan_cell_major's supercell + probe-cap preprocessing
    (kept in sync by the printed pair counts)."""
    n_probe = cells.shape[1]
    n_super = util.cdiv(n_cells, group)
    super_start = cell_start[::group]
    sup = jnp.where(probe_mask, cells // group, n_super)
    order = jnp.argsort(sup, axis=1, stable=True)
    s_sorted = jnp.take_along_axis(sup, order, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((sup.shape[0], 1), bool),
         s_sorted[:, 1:] == s_sorted[:, :-1]], axis=1)
    inv = jnp.argsort(order, axis=1)
    dup = jnp.take_along_axis(dup_sorted, inv, axis=1)
    cells2 = jnp.where(dup, n_super, sup).astype(jnp.int32)
    mask2 = cells2 < n_super
    key = jnp.where(mask2, jnp.arange(n_probe, dtype=jnp.int32)[None, :],
                    jnp.int32(n_probe))
    order2 = jnp.argsort(key, axis=1)[:, :probe_cap]
    cells2 = jnp.take_along_axis(cells2, order2, axis=1)
    mask2 = jnp.take_along_axis(mask2, order2, axis=1)
    return cells2, mask2, super_start


@functools.partial(jax.jit, static_argnames=("n_cells", "p_tile", "b_max"))
def _pack(cells, mask, *, n_cells, p_tile, b_max):
    return adc._pack_pairs(cells, mask, n_cells=n_cells, p_tile=p_tile,
                           b_max=b_max)


@functools.partial(jax.jit, static_argnames=("k",))
def _merge_topk(pcq, *, k):
    sel = adc._sortable_i32_f32(pcq)
    fvs, fi = jax.lax.top_k(sel, k)
    return fvs, jnp.take_along_axis(pcq, fi, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "k_pair", "p0", "kp_tail"))
def _merge_taper(keys3, *, k, k_pair, p0, kp_tail):
    """Rank-tapered merge input: probes < p0 keep k_pair columns, the rest
    keep kp_tail (pairs arrive coarse-rank-ordered, so tail pairs rarely
    hold deep winners)."""
    nq, n_probe, _ = keys3.shape
    head = keys3[:, :p0, :].reshape(nq, p0 * k_pair)
    tail = keys3[:, p0:, :kp_tail].reshape(nq, (n_probe - p0) * kp_tail)
    pcq = jnp.concatenate([head, tail], axis=1)
    sel = adc._sortable_i32_f32(pcq)
    fvs, fi = jax.lax.top_k(sel, k)
    return fvs, jnp.take_along_axis(pcq, fi, axis=1)


def main():
    n_base, d, n_cells, m, nq = 1_000_000, 128, 4096, 64, 10_000
    k, n_probe = 100, 128
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
        print(f"build {time.perf_counter() - t0:.0f}s", flush=True)

    q = jnp.asarray(query)
    cb = index.vq_codec.kmeans._centroids[0]
    s_max = int(index.max_cell_capacity)
    decoded = index.aux("decoded")
    norms = index.aux("norm")[:, 0]
    cap_total = decoded.shape[0]

    # ---- composed scans across the knob grid ----
    _, cells, mask = _coarse_probe(q, cb, jnp.float32(30.0),
                                   n_probe=n_probe, use_smart=True,
                                   precision=None, approx=True)
    for grp, cap, kp in ((4, 64, 32), (4, 64, 48), (4, 64, 64),
                         (8, 32, 32), (8, 32, 64), (4, 32, 32)):
        dt = timeit(lambda grp=grp, cap=cap, kp=kp: adc.scan_cell_major(
            q, cells, mask, decoded, norms, index._is_empty,
            index._cell_start, index._cell_capacity, k=k,
            distance="euclidean", s_max=s_max, n_cells=n_cells,
            approx=True, impl="pallas", group=grp, probe_cap=cap,
            k_pair=kp))
        print(f"scan g{grp} cap{cap} kp{kp}: {dt:.1f} ms "
              f"({nq / dt * 1e3:,.0f} q/s) gate={dict(adc.LAST_GATE)}",
              flush=True)

    # ---- stage budget at g4 cap64 kp32 (the r4 sweep config) ----
    grp, cap, kp = 4, 64, 32
    dt = timeit(lambda: _coarse_probe(q, cb, jnp.float32(30.0),
                                      n_probe=n_probe, use_smart=True,
                                      precision=None, approx=True))
    print(f"stage coarse(np128): {dt:.1f} ms", flush=True)
    dt = timeit(lambda: _group_cap(cells, mask, index._cell_start,
                                   cap_total, group=grp, probe_cap=cap,
                                   n_cells=n_cells))
    print(f"stage group+dedup+cap: {dt:.1f} ms", flush=True)
    cells2, mask2, super_start = _group_cap(
        cells, mask, index._cell_start, cap_total, group=grp,
        probe_cap=cap, n_cells=n_cells)
    n_super = util.cdiv(n_cells, grp)
    n_pairs = nq * cap
    p_tile = 128
    b_max = util.round_up(min(n_super, n_pairs)
                          + util.cdiv(n_pairs, p_tile), 8)
    dt = timeit(lambda: _pack(cells2, mask2, n_cells=n_super,
                              p_tile=p_tile, b_max=b_max))
    print(f"stage pack (b_max={b_max}): {dt:.1f} ms", flush=True)
    pair_block, pair_slot, block_cell, probers = _pack(
        cells2, mask2, n_cells=n_super, p_tile=p_tile, b_max=b_max)

    s_eff = min(s_max * grp, cap_total)
    qidx_all = jnp.maximum(probers, 0)
    jg = jax.jit(lambda t, i: t[i])
    q_bf = q.astype(jnp.bfloat16)
    dt = timeit(jg, q_bf, qidx_all)
    print(f"stage qvecs gather [{b_max}x{p_tile}x{d}]: {dt:.1f} ms",
          flush=True)

    # kernel at kp32 on real staged inputs
    cell_all = jnp.maximum(block_cell, 0)
    super_cap = jnp.diff(jnp.concatenate(
        [super_start, jnp.array([cap_total], super_start.dtype)]))
    start_all = super_start[cell_all]
    start_c_all = jnp.clip(start_all, 0, cap_total - s_eff)
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    penalty_arr = jnp.where(index._is_empty, big, norms)
    pen16 = penalty_arr.reshape(-1, 16)
    rows16 = (start_c_all[:, None] // 16
              + jnp.arange(s_eff // 16, dtype=jnp.int32)[None, :])
    pen_all = pen16[rows16].reshape(b_max, s_eff)
    qvecs_p = q_bf[qidx_all]
    s_pow2 = util.next_pow2(s_eff)
    slot_mask = s_pow2 - 1
    for kp_k in (32, 64):
        dt = timeit(lambda kp_k=kp_k: scan_blocks_pallas(
            qvecs_p, start_c_all, pen_all, decoded, s_eff=s_eff,
            k_pair=kp_k, p_tile=p_tile, distance="euclidean", approx=True,
            slot_mask=slot_mask, bps=4))
        print(f"stage kernel kp{kp_k} [{b_max} x {s_eff}]: {dt:.1f} ms",
              flush=True)

    combo = scan_blocks_pallas(
        qvecs_p, start_c_all, pen_all, decoded, s_eff=s_eff, k_pair=kp,
        p_tile=p_tile, distance="euclidean", approx=True,
        slot_mask=slot_mask, bps=4)
    ridx = pair_block * p_tile + pair_slot
    ju = jax.jit(lambda c, r: c.reshape(-1, kp)[r])
    dt = timeit(ju, combo, ridx)
    print(f"stage unsort gather [{n_pairs}x{kp}]: {dt:.1f} ms", flush=True)
    pc = ju(combo, ridx)
    keys3 = pc.reshape(nq, cap, kp)
    pcq = keys3.reshape(nq, cap * kp)
    dt = timeit(lambda: _merge_topk(pcq, k=k))
    print(f"stage merge top_k [{nq}x{cap * kp}]: {dt:.1f} ms", flush=True)
    for p0, kpt in ((16, 16), (8, 16), (16, 8)):
        dt = timeit(lambda p0=p0, kpt=kpt: _merge_taper(
            keys3, k=k, k_pair=kp, p0=p0, kp_tail=kpt))
        w = p0 * kp + (cap - p0) * kpt
        print(f"stage merge taper p0={p0} tail={kpt} (w={w}): {dt:.1f} ms",
              flush=True)

    # composed search at the sweep config for reference
    index.scan_mode = "cell_major"
    index.n_probe = n_probe
    index.scan_group = grp
    index.scan_probe_cap = cap
    index.scan_k_pair = kp
    dt = timeit(lambda: index.search(q.T, k=k))
    print(f"index.search g4 cap64 kp32: {dt:.1f} ms "
          f"({nq / dt * 1e3:,.0f} q/s)", flush=True)


if __name__ == "__main__":
    main()
