"""Randomized model-based container tests.

Random interleavings of add / remove / lookup checked against a plain
Python model — the strongest form of the reference's add/remove
interleaving tests (tests/CellContainerTestCase.py:193-237, which never
ran as committed; SURVEY.md §4). Catches slot-reuse, expansion, and
id-map regressions that fixed scenarios miss.
"""

import numpy as np
import jax.numpy as jnp

from torchpq_tpu.container import CellContainer, FlatContainer


def _check_against_model(container, model):
    """model: dict id -> (vector, cell_or_None)."""
    assert container.n_items == len(model)
    if not model:
        return
    ids = np.fromiter(model.keys(), dtype=np.int64)
    got = np.asarray(container.get_data_by_id(jnp.asarray(ids))).T
    want = np.stack([model[i][0] for i in ids])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # a removed / never-inserted id resolves to address -1 and zero data
    dead = int(ids.max()) + 1000
    addr = np.asarray(container.get_address_by_id(jnp.asarray([dead])))
    assert addr[0] == -1


def test_cell_container_random_interleaving(rng):
    code, n_cells = 8, 8
    c = CellContainer(code_size=code, n_cells=n_cells, dtype="float32",
                      initial_size=16)
    model = {}
    for step in range(30):
        op = rng.random()
        if op < 0.6 or not model:
            n = int(rng.integers(1, 40))
            data = rng.standard_normal((code, n)).astype(np.float32)
            cells = rng.integers(0, n_cells, n)
            ids = np.asarray(c.add(jnp.asarray(data), cells))
            for j, i in enumerate(ids):
                model[int(i)] = (data[:, j], int(cells[j]))
        else:
            live = np.fromiter(model.keys(), dtype=np.int64)
            pick = rng.choice(live, size=min(len(live),
                                             int(rng.integers(1, 20))),
                              replace=False)
            removed = c.remove(ids=jnp.asarray(pick))
            assert removed == len(pick)
            for i in pick:
                del model[int(i)]
        _check_against_model(c, model)
    # per-cell sizes must match the model exactly
    sizes = np.asarray(c._cell_size)
    want_sizes = np.bincount([v[1] for v in model.values()],
                             minlength=n_cells)
    np.testing.assert_array_equal(sizes, want_sizes)
    # every model id must live in its assigned cell
    for i, (vec, cell) in list(model.items())[:50]:
        addr = int(np.asarray(c.get_address_by_id(jnp.asarray([i])))[0])
        got_cell = int(np.asarray(c.get_cell_by_address(
            jnp.asarray([addr])))[0])
        assert got_cell == cell


def test_flat_container_random_interleaving(rng):
    code = 6
    c = FlatContainer(code_size=code, dtype="float32", initial_size=16)
    model = {}
    for step in range(30):
        op = rng.random()
        if op < 0.6 or not model:
            n = int(rng.integers(1, 30))
            data = rng.standard_normal((code, n)).astype(np.float32)
            ids = np.asarray(c.add(jnp.asarray(data)))
            for j, i in enumerate(ids):
                model[int(i)] = (data[:, j], None)
        else:
            live = np.fromiter(model.keys(), dtype=np.int64)
            pick = rng.choice(live, size=min(len(live),
                                             int(rng.integers(1, 15))),
                              replace=False)
            c.remove(ids=jnp.asarray(pick))
            for i in pick:
                del model[int(i)]
        _check_against_model(c, model)
        # swap-from-tail invariant: live rows form a dense prefix
        a2i = np.asarray(c._address2id)
        assert (a2i[:c.n_items] >= 0).all()
        assert (a2i[c.n_items:] < 0).all()
