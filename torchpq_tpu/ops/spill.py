"""Device-resident capacity-bounded (spill) assignment.

Reference counterpart: none — the reference always adds to the argmax cell
(IVFPQIndex.add, torchpq/index/IVFPQIndex.py:316-364) and lets hot cells grow
without bound. Bounded cells matter on TPU because every probed cell pays for
s_max slots (ops/adc.py), so this framework routes overflow to next-best
cells (index/ivfpq.py:_assign_cells).

The first implementation ran the greedy routing on the host
(native/spill_assign, C++): exact arrival-order semantics, but it forces a
[n, l] D2H + [n] H2D on every add — and on hosts where transfers serialize,
that sync sits right on the ingest critical path and blocks the next chunk's
upload from overlapping. This kernel keeps the whole decision on device:

  round r (unrolled, l static): every still-undecided item bids for its
  r-th-choice cell; items are ranked within each cell by batch position
  (the same sort + run-start trick as the container's ioa), and an item is
  accepted iff occupancy[cell] + rank < cap. Occupancies update by one
  segment count per round. Items that exhaust all l choices fall back to
  their least-occupied choice (the near-impossible all-full case rides the
  container's expansion check, which still sees true per-cell counts).

vs host greedy: round-based instead of arrival-interleaved, so ties break
differently — the *distribution* (every cell below cap, items at their best
feasible choice) is the same, assignments are not bit-identical.

Returns (cells [n] i32, counts [n_cells] i32) — counts lets the container
update its host shadows with a 4*n_cells-byte sync instead of a full [n]
readback.
"""

import functools

import jax
import jax.numpy as jnp


def rank_in_group(cells, active, n_cells):
    """Rank of each active item among active items in the same cell, stable
    by batch position — the reference's get_ioa (get_ioa.cu) as one sort +
    searchsorted run-start subtraction. Shared by CellContainer's add
    pipeline (container/cell.py:_compute_ioa) and the spill rounds here."""
    b = cells.shape[0]
    key = jnp.where(active, cells, n_cells)
    order = jnp.argsort(key)
    sorted_key = key[order]
    first = jnp.searchsorted(sorted_key, jnp.arange(n_cells), side="left")
    pos = jnp.arange(b, dtype=jnp.int32)
    safe = jnp.minimum(sorted_key, n_cells - 1)
    rank_sorted = pos - first[safe].astype(jnp.int32)
    return jnp.zeros((b,), jnp.int32).at[order].set(rank_sorted)


@functools.partial(jax.jit, static_argnames=("cap", "n_cells"))
def spill_assign_device(top, cell_size, *, cap, n_cells):
    """top: [n, l] int32 best-first candidate cells; cell_size: [n_cells]
    i32 current occupancy. cap: static per-cell bound.

    Returns (chosen [n] i32, counts [n_cells] i32 new-item counts)."""
    n, l = top.shape
    occ = cell_size.astype(jnp.int32)
    chosen = jnp.full((n,), -1, jnp.int32)
    undecided = jnp.ones((n,), bool)
    for r in range(l):
        cand = top[:, r].astype(jnp.int32)
        rank = rank_in_group(cand, undecided, n_cells)
        accept = undecided & (occ[cand] + rank < cap)
        chosen = jnp.where(accept, cand, chosen)
        occ = occ.at[jnp.where(accept, cand, n_cells)].add(
            1, mode="drop")
        undecided = undecided & ~accept
    # leftovers: least-occupied of the l choices (may exceed cap; the
    # container's expansion check still sees the true counts)
    lf = jnp.argmin(occ[top], axis=1)
    fallback = jnp.take_along_axis(top, lf[:, None], axis=1)[:, 0] \
        .astype(jnp.int32)
    chosen = jnp.where(undecided, fallback, chosen)
    counts = jnp.zeros((n_cells,), jnp.int32).at[chosen].add(1, mode="drop")
    return chosen, counts
