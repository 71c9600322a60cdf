"""Microbench the components of adc._pack_pairs at the 1M bench shape.

The pack is the #1 stage of the probed scan at n_probe>=32; this times each
candidate formulation of every sub-step (histogram, rank cumsum, the final
grid scatters, the argsort) so the production path is chosen by measurement.
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

from torchpq_tpu import util
from torchpq_tpu.ops import adc


def timeit(f, *a, reps=10, **kw):
    r = f(*a, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a, **kw)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps * 1e3
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.ravel()[0])  # poison check
    return dt


NQ, N_CELLS, P_TILE = 10_000, 4096, 128


@functools.partial(jax.jit, static_argnames=())
def hist_compare_bf16(cells, live):
    cell_ids = jnp.arange(N_CELLS, dtype=jnp.int32)
    return jnp.sum((cells[:, :, None] == cell_ids[None, None, :])
                   & live[:, :, None], axis=1, dtype=jnp.bfloat16)


@jax.jit
def hist_compare_i16(cells, live):
    cell_ids = jnp.arange(N_CELLS, dtype=jnp.int16)
    c16 = cells.astype(jnp.int16)
    return jnp.sum((c16[:, :, None] == cell_ids[None, None, :])
                   & live[:, :, None], axis=1, dtype=jnp.bfloat16)


@jax.jit
def hist_scatter(cells, live):
    nq, n_probe = cells.shape
    q_rows = jnp.broadcast_to(jnp.arange(nq, dtype=jnp.int32)[:, None],
                              cells.shape)
    return jnp.zeros((nq, N_CELLS), jnp.int32).at[
        q_rows.reshape(-1),
        jnp.where(live, cells, 0).reshape(-1)].add(
        live.reshape(-1).astype(jnp.int32))


@jax.jit
def cumsum_direct(hist):
    return jnp.cumsum(hist.astype(jnp.int32), axis=0)


@jax.jit
def cumsum_matmul(hist):
    blk = 128
    nq = hist.shape[0]
    nq_pad = util.round_up(nq, blk)
    hp = jnp.pad(hist, ((0, nq_pad - nq), (0, 0))) if nq_pad != nq else hist
    hb = hp.reshape(nq_pad // blk, blk, N_CELLS)
    tril = jnp.tril(jnp.ones((blk, blk), hist.dtype), k=-1)
    excl_b = jnp.einsum("rs,bsc->brc", tril, hb,
                        preferred_element_type=jnp.float32)
    tots = jnp.sum(hb, axis=1, dtype=jnp.float32)
    offs = jnp.cumsum(tots, axis=0) - tots
    return (excl_b + offs[:, None, :]).reshape(nq_pad, N_CELLS)[:nq]


@jax.jit
def argsort_pairs(cells, live):
    flat = jnp.where(live.reshape(-1), cells.reshape(-1),
                     jnp.int32(N_CELLS))
    return jnp.argsort(flat)


@jax.jit
def sort_kv(cells, live):
    # sort (cell, query) with query as payload via single fused key
    nq, n_probe = cells.shape
    flat = jnp.where(live.reshape(-1), cells.reshape(-1), jnp.int32(N_CELLS))
    q = jnp.repeat(jnp.arange(nq, dtype=jnp.int32), n_probe)
    key = flat * jnp.int32(nq) + q  # nq*n_cells < 2^31 at this shape
    s = jnp.sort(key)
    return s // nq, s % nq


@functools.partial(jax.jit, static_argnames=("b_max",))
def grid_scatters(pair_block, pair_slot, flat_cells, flat_q, *, b_max):
    block_cell = jnp.full((b_max,), -1, jnp.int32).at[pair_block].set(
        flat_cells, mode="drop")
    probers = jnp.full((b_max, p_tile := P_TILE), -1, jnp.int32).at[
        pair_block, pair_slot].set(flat_q, mode="drop")
    return block_cell, probers


@functools.partial(jax.jit, static_argnames=("b_max",))
def grid_scatter_1d(pair_block, pair_slot, flat_cells, flat_q, *, b_max):
    # flattened 1-D scatter (one index column instead of two)
    pos = pair_block * P_TILE + pair_slot
    probers = jnp.full((b_max * P_TILE,), -1, jnp.int32).at[pos].set(
        flat_q, mode="drop").reshape(b_max, P_TILE)
    block_cell = jnp.full((b_max,), -1, jnp.int32).at[pair_block].set(
        flat_cells, mode="drop")
    return block_cell, probers


@functools.partial(jax.jit, static_argnames=("n_cells", "p_tile", "b_max"))
def full_pack(cells, mask, *, n_cells, p_tile, b_max):
    return adc._pack_pairs(cells, mask, n_cells=n_cells, p_tile=p_tile,
                           b_max=b_max)


def main():
    rng = np.random.default_rng(0)
    for n_probe in (8, 32, 128):
        # realistic skewed cell distribution
        logits = rng.normal(size=N_CELLS)
        p = np.exp(logits) / np.exp(logits).sum()
        cells_np = np.stack([
            rng.choice(N_CELLS, size=n_probe, replace=False, p=p)
            for _ in range(256)])
        cells_np = cells_np[rng.integers(0, 256, NQ)]
        cells = jnp.asarray(cells_np, jnp.int32)
        live = jnp.ones((NQ, n_probe), bool)
        n_pairs = NQ * n_probe
        b_max = util.round_up(min(N_CELLS, n_pairs)
                              + util.cdiv(n_pairs, P_TILE), 8)

        h = hist_compare_bf16(cells, live)
        print(f"np={n_probe} (pairs={n_pairs}, b_max={b_max})")
        print(f"  hist compare bf16: {timeit(hist_compare_bf16, cells, live):.1f} ms")
        print(f"  hist compare i16 : {timeit(hist_compare_i16, cells, live):.1f} ms")
        print(f"  hist scatter-add : {timeit(hist_scatter, cells, live):.1f} ms")
        print(f"  cumsum direct    : {timeit(cumsum_direct, h):.1f} ms")
        print(f"  cumsum matmul    : {timeit(cumsum_matmul, h):.1f} ms")
        print(f"  argsort          : {timeit(argsort_pairs, cells, live):.1f} ms")
        print(f"  sort fused-kv    : {timeit(sort_kv, cells, live):.1f} ms")
        pb = jnp.asarray(rng.integers(0, b_max, n_pairs), jnp.int32)
        ps = jnp.asarray(rng.integers(0, P_TILE, n_pairs), jnp.int32)
        fc = cells.reshape(-1)
        fq = jnp.asarray(rng.integers(0, NQ, n_pairs), jnp.int32)
        print(f"  grid scatter 2d  : {timeit(grid_scatters, pb, ps, fc, fq, b_max=b_max):.1f} ms")
        print(f"  grid scatter 1d  : {timeit(grid_scatter_1d, pb, ps, fc, fq, b_max=b_max):.1f} ms")
        print(f"  full _pack_pairs : {timeit(full_pack, cells, live, n_cells=N_CELLS, p_tile=P_TILE, b_max=b_max):.1f} ms")


if __name__ == "__main__":
    main()
