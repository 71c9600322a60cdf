import numpy as np
import jax.numpy as jnp

from torchpq_tpu.index import IVFPQIndex


def test_spill_bounds_cells(rng):
    d, n = 16, 3000
    # heavily skewed data: most points near one center
    x = np.concatenate([
        rng.normal(size=(2700, d)) * 0.1,
        rng.normal(size=(300, d)) + 5.0]).astype(np.float32)
    idx = IVFPQIndex(d_vector=d, n_subvectors=4, n_cells=16,
                     initial_size=256, scan_cache_dtype="float32")
    idx.train(jnp.asarray(x.T))
    idx.spill_cells = 8
    idx.spill_capacity = 256
    ids = np.asarray(idx.add(jnp.asarray(x.T)))
    sizes = np.asarray(idx._cell_size)
    assert sizes.sum() == n
    # without spill the dominant cell would blow far past 256
    assert sizes.max() <= 300, sizes
    # recall must survive spilling (spilled items live in probed cells)
    idx.n_probe = 8
    idx.use_smart_probing = False
    _, got = idx.search(jnp.asarray(x[:200].T), k=5)
    hit = (np.asarray(got) == ids[:200, None]).any(1).mean()
    assert hit > 0.9, hit


def test_approx_topk_flag(rng):
    d, n = 16, 1000
    x = rng.normal(size=(n, d)).astype(np.float32)
    idx = IVFPQIndex(d_vector=d, n_subvectors=4, n_cells=8,
                     initial_size=256, scan_cache_dtype="float32")
    idx.train(jnp.asarray(x.T))
    ids = np.asarray(idx.add(jnp.asarray(x.T)))
    idx.n_probe = 4
    idx.use_approx_topk = True
    _, got = idx.search(jnp.asarray(x[:100].T), k=5)
    hit = (np.asarray(got) == ids[:100, None]).any(1).mean()
    assert hit > 0.85, hit


def test_supercell_grouping_superset(rng):
    """group>1 scans a superset of candidates: results must be at least as
    good, and returned addresses must stay valid."""
    d, n = 16, 2000
    x = rng.normal(size=(n, d)).astype(np.float32)
    idx = IVFPQIndex(d_vector=d, n_subvectors=4, n_cells=16,
                     initial_size=256, scan_cache_dtype="float32")
    idx.train(jnp.asarray(x.T))
    ids = np.asarray(idx.add(jnp.asarray(x.T)))
    idx.n_probe = 4
    idx.use_smart_probing = False
    q = jnp.asarray(x[:200].T)
    _, got1 = idx.search(q, k=5)
    hit1 = (np.asarray(got1) == ids[:200, None]).any(1).mean()
    idx.scan_group = 4
    _, got4 = idx.search(q, k=5)
    hit4 = (np.asarray(got4) == ids[:200, None]).any(1).mean()
    assert hit4 >= hit1 - 1e-9, (hit1, hit4)
    assert hit4 > 0.95


def test_int8_scan_cache(rng):
    d, n = 16, 2000
    x = rng.normal(size=(n, d)).astype(np.float32)
    idx = IVFPQIndex(d_vector=d, n_subvectors=4, n_cells=16,
                     initial_size=256, scan_cache_dtype="int8")
    idx.train(jnp.asarray(x.T))
    ids = np.asarray(idx.add(jnp.asarray(x.T)))
    idx.n_probe = 4
    idx.use_smart_probing = False
    _, got = idx.search(jnp.asarray(x[:200].T), k=5)
    hit = (np.asarray(got) == ids[:200, None]).any(1).mean()
    assert hit > 0.9, hit
    assert idx.aux("decoded").dtype == jnp.int8
