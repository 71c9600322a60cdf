"""Container semantics tests — modeled on the reference's (intended) test
suite (tests/FlatContainerTestCase.py, tests/CellContainerTestCase.py:
add with/without ids, id<->address<->data round trips, remove semantics,
add/remove interleaving with slot reuse, expansion; SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from torchpq_tpu.container import (FlatContainer, CellContainer,
                                   FlatContainerGroup)


def _data(rng, code, n):
    return rng.normal(size=(code, n)).astype(np.float32)


class TestFlatContainer:
    def test_add_roundtrip(self, rng):
        c = FlatContainer(code_size=8, initial_size=16)
        d = _data(rng, 8, 10)
        ids, addr = c.add(jnp.asarray(d), return_address=True)
        assert c.n_items == 10
        got = np.asarray(c.get_data_by_address(addr))
        np.testing.assert_allclose(got, d, rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(c.get_id_by_address(addr)), np.asarray(ids))
        np.testing.assert_array_equal(
            np.asarray(c.get_address_by_id(ids)), np.asarray(addr))

    def test_add_with_custom_ids(self, rng):
        c = FlatContainer(code_size=4, initial_size=16)
        d = _data(rng, 4, 5)
        ids = np.array([10, 20, 30, 40, 50], np.int64)
        out = c.add(jnp.asarray(d), ids=ids)
        np.testing.assert_array_equal(np.asarray(out), ids)
        got = np.asarray(c.get_data_by_id(ids))
        np.testing.assert_allclose(got, d, rtol=1e-6)
        assert c.max_id == 51

    def test_expand(self, rng):
        c = FlatContainer(code_size=4, initial_size=8, expand_step_size=8)
        d = _data(rng, 4, 100)
        ids = c.add(jnp.asarray(d))
        assert c.capacity >= 100
        np.testing.assert_allclose(
            np.asarray(c.get_data_by_id(ids)), d, rtol=1e-6)

    def test_remove_compacts(self, rng):
        c = FlatContainer(code_size=4, initial_size=32)
        d = _data(rng, 4, 20)
        ids = np.asarray(c.add(jnp.asarray(d)))
        r = c.remove(ids=ids[5:10])
        assert r == 5 and c.n_items == 15
        # removed ids gone
        assert np.all(np.asarray(c.get_address_by_id(ids[5:10])) == -1)
        # survivors keep their data (dense prefix maintained)
        for i in list(range(5)) + list(range(10, 20)):
            a = int(np.asarray(c.get_address_by_id(ids[i:i + 1]))[0])
            assert 0 <= a < 15
            np.testing.assert_allclose(
                np.asarray(c.get_data_by_address(np.array([a])))[:, 0],
                d[:, i], rtol=1e-6)

    def test_add_remove_interleaved(self, rng):
        c = FlatContainer(code_size=4, initial_size=16)
        d1 = _data(rng, 4, 8)
        ids1 = np.asarray(c.add(jnp.asarray(d1)))
        c.remove(ids=ids1[:4])
        d2 = _data(rng, 4, 6)
        ids2 = np.asarray(c.add(jnp.asarray(d2)))
        assert c.n_items == 10
        np.testing.assert_allclose(
            np.asarray(c.get_data_by_id(ids2)), d2, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(c.get_data_by_id(ids1[4:])), d1[:, 4:], rtol=1e-6)

    def test_empty(self, rng):
        c = FlatContainer(code_size=4, initial_size=16)
        c.add(jnp.asarray(_data(rng, 4, 8)))
        c.empty()
        assert c.n_items == 0 and c.max_id == 0


class TestCellContainer:
    def test_add_roundtrip(self, rng):
        c = CellContainer(code_size=4, n_cells=4, initial_size=8)
        d = _data(rng, 4, 20)
        cells = rng.integers(0, 4, size=20)
        ids, addr = c.add(jnp.asarray(d), cells, return_address=True)
        assert c.n_items == 20
        np.testing.assert_allclose(
            np.asarray(c.get_data_by_address(addr)), d, rtol=1e-6)
        got_cells = np.asarray(c.get_cell_by_address(addr))
        np.testing.assert_array_equal(got_cells, cells)
        np.testing.assert_array_equal(
            np.asarray(c.get_address_by_id(ids)), np.asarray(addr))

    def test_cell_sizes(self, rng):
        c = CellContainer(code_size=4, n_cells=4, initial_size=8)
        cells = np.array([0, 0, 0, 1, 2, 2, 3, 3, 3, 3])
        c.add(jnp.asarray(_data(rng, 4, 10)), cells)
        np.testing.assert_array_equal(
            np.asarray(c._cell_size), [3, 1, 2, 4])

    def test_expand_cells(self, rng):
        c = CellContainer(code_size=4, n_cells=4, initial_size=4,
                          expand_step_size=4)
        d = _data(rng, 4, 64)
        cells = np.zeros(64, np.int64)  # all into cell 0 -> forced expansion
        ids = c.add(jnp.asarray(d), cells)
        assert int(c._cell_capacity_np[0]) >= 64
        np.testing.assert_allclose(
            np.asarray(c.get_data_by_id(ids)), d, rtol=1e-6)
        assert np.asarray(c._cell_size)[0] == 64

    def test_presize_empty_then_add(self, rng):
        """expand(required) on an EMPTY container takes the fresh-alloc
        path (no gather relayout — at 100M a gather-fusion u8 output pads
        to 128 lanes and doubles its bytes); adds must then land exactly
        as in a container built large."""
        c = CellContainer(code_size=4, n_cells=4, initial_size=16)
        c.expand(required={0: 100, 2: 33})
        assert int(c._cell_capacity_np[0]) >= 100
        assert int(c._cell_capacity_np[2]) >= 33
        assert c.n_items == 0
        d = _data(rng, 4, 150)
        cells = np.concatenate([np.zeros(100), np.full(17, 1),
                                np.full(33, 2)]).astype(np.int64)
        ids = c.add(jnp.asarray(d), cells)
        np.testing.assert_allclose(
            np.asarray(c.get_data_by_id(ids)), d, rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(c._cell_size), [100, 17, 33, 0])

    def test_remove_and_slot_reuse(self, rng):
        c = CellContainer(code_size=4, n_cells=2, initial_size=8)
        d = _data(rng, 4, 8)
        cells = np.array([0, 0, 0, 0, 1, 1, 1, 1])
        ids = np.asarray(c.add(jnp.asarray(d), cells))
        r = c.remove(ids=ids[1:3])
        assert r == 2 and c.n_items == 6
        assert np.all(np.asarray(c.get_address_by_id(ids[1:3])) == -1)
        np.testing.assert_array_equal(np.asarray(c._cell_size), [2, 4])
        # re-add into cell 0: holes must be reused, no expansion
        cap_before = c.capacity
        d2 = _data(rng, 4, 2)
        ids2 = np.asarray(c.add(jnp.asarray(d2), np.array([0, 0])))
        assert c.capacity == cap_before
        np.testing.assert_allclose(
            np.asarray(c.get_data_by_id(ids2)), d2, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(c._cell_size), [4, 4])
        # originals intact
        np.testing.assert_allclose(
            np.asarray(c.get_data_by_id(ids[3:4])), d[:, 3:4], rtol=1e-6)

    def test_remove_by_address(self, rng):
        c = CellContainer(code_size=4, n_cells=2, initial_size=8)
        ids, addr = c.add(jnp.asarray(_data(rng, 4, 6)),
                          np.array([0, 1, 0, 1, 0, 1]), return_address=True)
        r = c.remove(address=np.asarray(addr)[:2])
        assert r == 2 and c.n_items == 4

    def test_save_load(self, tmp_path, rng):
        c = CellContainer(code_size=4, n_cells=4, initial_size=8)
        d = _data(rng, 4, 20)
        cells = rng.integers(0, 4, size=20)
        ids = np.asarray(c.add(jnp.asarray(d), cells))
        path = str(tmp_path / "cell.npz")
        c.save(path)
        c2 = CellContainer(code_size=4, n_cells=4, initial_size=8)
        c2.load(path)
        assert c2.n_items == 20
        np.testing.assert_allclose(
            np.asarray(c2.get_data_by_id(ids)), d, rtol=1e-6)


class TestFlatContainerGroup:
    def test_parallel_storages(self, rng):
        g = FlatContainerGroup(code_sizes=[4, 8], dtypes=["float32", "uint8"],
                               initial_size=16)
        d0 = _data(rng, 4, 10)
        d1 = rng.integers(0, 255, size=(8, 10)).astype(np.uint8)
        ids, addr = g.add([jnp.asarray(d0), jnp.asarray(d1)],
                          return_address=True)
        np.testing.assert_allclose(
            np.asarray(g[0].get_data_by_address(addr)), d0, rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(g[1].get_data_by_address(addr)), d1)
        # remove keeps stores in lockstep
        g.remove(ids=np.asarray(ids)[:3])
        assert g.n_items == 7
        keep = np.asarray(ids)[3:]
        np.testing.assert_allclose(
            np.asarray(g[0].get_data_by_id(keep)), d0[:, 3:], rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(g[1].get_data_by_id(keep)), d1[:, 3:])


def test_packed_row_write_matches_elementwise(rng):
    """_packed_row_write (pair-RMW row scatter) must equal the per-element
    reference under shuffled addresses, same-row collisions, and invalid
    (addr == cap) drops — for every supported pack group."""
    import jax.numpy as jnp
    from torchpq_tpu.container.cell import _packed_row_write

    for g in (2, 4, 16):
        m = 128 // g
        n_rows, cap = 8, 8 * g
        storage = rng.integers(0, 255, (n_rows, 128), dtype=np.uint8)
        b = cap  # enough to hit every row multiple times
        addr = rng.permutation(cap).astype(np.int32)
        # make some invalid and duplicate a row collision on purpose
        addr[::5] = cap
        data = rng.integers(0, 255, (b, m), dtype=np.uint8)
        ref = storage.copy()
        for i in range(b):
            if addr[i] == cap:
                continue
            rr, off = addr[i] // g, (addr[i] % g) * m
            ref[rr, off:off + m] = data[i]
        out = np.asarray(_packed_row_write(
            jnp.asarray(storage), jnp.asarray(addr), jnp.asarray(data), g))
        np.testing.assert_array_equal(out, ref, err_msg=f"g={g}")


class TestExactPresize:
    def test_expand_exact_16_128_multiples(self, rng):
        """expand(required=..., exact=True): capacities round to 16 (128
        once >= 128) instead of pow2; starts stay 16-aligned and adds/
        searches work on the exact layout (the 50M/100M demo presize)."""
        c = CellContainer(code_size=8, n_cells=4, initial_size=64,
                          dtype="uint8")
        c.expand(required={0: 150, 1: 20, 2: 700}, exact=True)
        caps = np.asarray(c._cell_capacity)
        assert caps[0] == 256 and caps[1] == 64 and caps[2] == 768, caps
        starts = np.asarray(c._cell_start)
        assert (starts % 16 == 0).all()
        d = rng.integers(0, 255, size=(8, 40)).astype(np.uint8)
        cells = jnp.asarray(np.repeat(np.arange(4), 10))
        ids, addr = c.add(jnp.asarray(d), cells=cells, return_address=True)
        got = np.asarray(c.get_data_by_address(addr))
        np.testing.assert_array_equal(got, d)
