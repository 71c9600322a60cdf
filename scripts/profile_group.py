"""Supercell-group sweep on the real chip."""
import faulthandler, os, signal, sys, time
faulthandler.register(signal.SIGUSR1)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/torchpq_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bench import make_data, brute_force_topk, recall_at_k
from torchpq_tpu.index import IVFPQIndex
from torchpq_tpu.index.ivfpq import _coarse_probe
from torchpq_tpu.ops import adc

def timeit(f, reps=5):
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps): r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1e3

n_base, d, n_cells, m, nq = 1_000_000, 128, 4096, 64, 10_000
base, query = make_data(n_base, nq, d)
index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                   initial_size=(n_base // n_cells) * 2)
index.use_approx_topk = True
index.spill_cells = 8
index.spill_capacity = index.max_cell_capacity
index.train(jnp.asarray(base[:100_000].T))
for i in range(0, n_base, 250_000):
    index.add(jnp.asarray(base[i:i + 250_000].T))
print(f"built s_max={index.max_cell_capacity}", flush=True)
gt = brute_force_topk(base, query[:2000], 10, cache_key="full")[:2000]
ids_map = np.arange(n_base)
q = jnp.asarray(query)
cb = index.vq_codec.kmeans._centroids[0]
args0 = (index.aux("decoded"), index.aux("norm")[:, 0], index._is_empty,
         index._cell_start, index._cell_capacity)
for n_probe in (8, 32):
    _, cells, mask = _coarse_probe(q, cb, jnp.float32(30.0), n_probe=n_probe,
                                   use_smart=True, precision=None, approx=True)
    for impl in ("xla", "pallas"):
        for g in (1, 2, 4, 8):
            f = lambda: adc.scan_cell_major(
                q, cells, mask, *args0, k=10, distance="euclidean",
                s_max=index.max_cell_capacity, n_cells=n_cells,
                approx=True, impl=impl, group=g)
            try:
                dt = timeit(f)
                v, a = f()
                ids = np.asarray(index.get_id_by_address(
                    jnp.maximum(a[:2000], 0))).copy()
                ids[np.asarray(a[:2000]) < 0] = -1
                rec = recall_at_k(ids, gt, ids_map, 10)
                print(f"np={n_probe} impl={impl} group={g}: {dt:.1f} ms "
                      f"-> {nq/dt*1e3:,.0f} q/s recall={rec:.4f}", flush=True)
            except Exception as e:
                print(f"np={n_probe} impl={impl} group={g} FAIL "
                      f"{type(e).__name__} {str(e)[:150]}", flush=True)
