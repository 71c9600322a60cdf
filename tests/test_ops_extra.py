import numpy as np
import jax.numpy as jnp

from torchpq_tpu.ops import bmm as bmm_ops
from torchpq_tpu.ops.pallas_gather import gather_rows
from torchpq_tpu.container import CellContainer
from torchpq_tpu import profiling


def test_bmm_distances(rng):
    a = rng.normal(size=(3, 10, 8)).astype(np.float32)
    b = rng.normal(size=(3, 7, 8)).astype(np.float32)
    out = np.asarray(bmm_ops.bmm(jnp.asarray(a), jnp.asarray(b), "euclidean"))
    want = -((a[:, :, None] - b[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)
    out = np.asarray(bmm_ops.bmm(jnp.asarray(a), jnp.asarray(b), "inner"))
    np.testing.assert_allclose(out, np.einsum("lmd,lnd->lmn", a, b),
                               rtol=1e-4, atol=1e-4)


def test_min_topk_masked_bmm(rng):
    a = rng.normal(size=(2, 6, 4)).astype(np.float32)
    b = rng.normal(size=(2, 9, 4)).astype(np.float32)
    vals, idx = bmm_ops.min_bmm(jnp.asarray(a), jnp.asarray(b), "euclidean")
    sims = -((a[:, :, None] - b[:, None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), sims.argmax(2))
    tv, ti = bmm_ops.topk_bmm(jnp.asarray(a), jnp.asarray(b), k=3)
    assert tv.shape == (2, 6, 3)
    mask = np.zeros((2, 6, 9), bool)
    mask[:, :, 0] = True
    mv = np.asarray(bmm_ops.masked_bmm(jnp.asarray(a), jnp.asarray(b),
                                       jnp.asarray(mask)))
    assert np.isneginf(mv[:, :, 1:]).all()


def test_pallas_gather_interpret(rng):
    t = jnp.asarray(rng.normal(size=(300, 32)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 300, size=(777,)).astype(np.int32))
    out = gather_rows(t, idx, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(t)[np.asarray(idx)])


def test_cell_container_ioa_write_address(rng):
    c = CellContainer(code_size=4, n_cells=3, initial_size=8)
    cells = jnp.asarray(np.array([0, 1, 0, 2, 0, 1], np.int32))
    ioa = np.asarray(c.get_ioa(cells))
    np.testing.assert_array_equal(ioa, [0, 0, 1, 0, 2, 1])
    addr = np.asarray(c.get_write_address(cells))
    starts = np.asarray(c._cell_start)
    np.testing.assert_array_equal(addr, starts[np.asarray(cells)] + ioa)


def test_phase_timer():
    t = profiling.PhaseTimer()
    with t.phase("a"):
        pass
    assert "a" in t.report()


def test_native_reader_offset_and_stream(tmp_path, rng):
    from torchpq_tpu import native
    d, n = 12, 107
    data = rng.standard_normal((n, d)).astype(np.float32)
    path = tmp_path / "toy.fvecs"
    with open(path, "wb") as f:
        for row in data:
            f.write(np.int32(d).tobytes())
            f.write(row.tobytes())
    # full, bounded, offset reads agree with the source (native path)
    np.testing.assert_array_equal(native.read_fvecs(path), data)
    np.testing.assert_array_equal(native.read_fvecs(path, n_max=5),
                                  data[:5])
    np.testing.assert_array_equal(
        native.read_fvecs(path, n_max=10, offset=100), data[100:107])
    # the numpy fallback matches the native reader
    np.testing.assert_array_equal(
        native._read_vecs_numpy(path, np.float32, 10, 100), data[100:107])
    # streaming covers the file exactly once
    got = np.concatenate(list(native.stream_vecs(path, chunk_rows=25)))
    np.testing.assert_array_equal(got, data)
    got2 = np.concatenate(list(native.stream_vecs(path, chunk_rows=25,
                                                  n_max=60)))
    np.testing.assert_array_equal(got2, data[:60])


def test_locality_order_groups_near_centroids(rng):
    """util.locality_order: valid permutation, and id-adjacent groups are
    spatially tighter than the input order — the property supercell
    grouping (ops/adc.py scan_group) converts into fewer live probe pairs."""
    from torchpq_tpu import util
    # clustered centroid cloud (what a trained coarse codebook looks like)
    centers = rng.normal(size=(16, 32)).astype(np.float64) * 5
    c = (centers[rng.integers(0, 16, 256)]
         + rng.normal(size=(256, 32))).astype(np.float64)
    order = util.locality_order(c)
    assert sorted(order.tolist()) == list(range(256))  # permutation

    def group_spread(cl, g=4):
        grp = cl.reshape(-1, g, cl.shape[-1])
        return float(((grp - grp.mean(1, keepdims=True)) ** 2).sum(-1)
                     .mean())

    # shuffled baseline vs locality order: grouped spread must shrink a lot
    shuf = c[rng.permutation(256)]
    assert group_spread(c[order]) < 0.5 * group_spread(shuf)
