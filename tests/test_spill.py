"""Device-resident spill assignment (ops/spill.py)."""

import numpy as np
import jax.numpy as jnp

from torchpq_tpu.ops.spill import spill_assign_device


def test_capacity_respected_and_best_feasible():
    n_cells, cap = 8, 10
    rng = np.random.default_rng(0)
    # 60 items all preferring cell 0, second choice spread
    top = np.stack([np.zeros(60, np.int32),
                    rng.integers(1, n_cells, 60).astype(np.int32)], axis=1)
    cells, counts = spill_assign_device(
        jnp.asarray(top), jnp.zeros((n_cells,), jnp.int32),
        cap=cap, n_cells=n_cells)
    cells, counts = np.asarray(cells), np.asarray(counts)
    assert counts.sum() == 60
    assert counts[0] == cap  # first choice filled to capacity, not beyond
    # everyone else landed on their second choice
    spilled = cells != 0
    assert (cells[spilled] == top[spilled, 1]).all()


def test_existing_occupancy_counts():
    n_cells, cap = 4, 5
    top = np.stack([np.full(6, 2, np.int32), np.full(6, 3, np.int32)], axis=1)
    occ = jnp.asarray(np.array([0, 0, 3, 0], np.int32))  # cell 2 has 3 items
    cells, counts = spill_assign_device(jnp.asarray(top), occ,
                                        cap=cap, n_cells=n_cells)
    cells = np.asarray(cells)
    assert (cells == 2).sum() == 2  # only 2 free slots in cell 2
    assert (cells == 3).sum() == 4


def test_all_full_falls_back_least_occupied():
    n_cells, cap = 2, 1
    top = np.stack([np.zeros(5, np.int32), np.ones(5, np.int32)], axis=1)
    cells, counts = spill_assign_device(
        jnp.asarray(top), jnp.zeros((n_cells,), jnp.int32),
        cap=cap, n_cells=n_cells)
    counts = np.asarray(counts)
    # 1 to cell 0, 1 to cell 1; the 3 leftovers go to the least-occupied
    # choice (the container's expansion check handles the overflow)
    assert counts.sum() == 5
    assert counts.min() >= 1
