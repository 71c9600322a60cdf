"""A/B the probed-scan config knobs on the saved 1M index state.

Times the COMPOSED `index.search` (what the sweep records) at
n_probe 8/32/128 for scan_group in {1, 2, 4} and both scan impls, on
the /tmp/profile_1m_state.npz index (initial_mult=2 -> 512-wide pow2
windows, spill-bounded).  Round-1 chose group=4 on the XLA impl
(commit b54f1c7: np=8 280k->455k); the round-2 Pallas kernel changed
the window-DMA economics, so re-measure before re-recording the
class sweep.
"""
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

from bench import make_data, brute_force_topk, recall_at_k
from torchpq_tpu.index import IVFPQIndex


def main():
    n_base, d, n_cells, m, nq = 1_000_000, 128, 4096, 64, 10_000
    base, query = make_data(n_base, nq, d, spectrum="manifold-12")
    index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                       initial_size=(n_base // n_cells) * 2)
    index.use_approx_topk = True
    index.spill_cells = 8
    index.spill_capacity = index.max_cell_capacity
    state = "/tmp/profile_1m_state.npz"
    t0 = time.perf_counter()
    if os.path.exists(state):
        index.load(state)
    else:
        index.train(jnp.asarray(base[:100_000]).T)
        for i in range(0, n_base, 250_000):
            index.add(jnp.asarray(base[i:i + 250_000]).T)
        index.save(state)
    print(f"state ready in {time.perf_counter() - t0:.0f}s "
          f"s_max={index.max_cell_capacity}", flush=True)

    gt = brute_force_topk(base, query, 10, cache_key="full_manifold12")
    ids_map = np.arange(n_base)
    qj = jnp.asarray(query.T)
    index.scan_mode = "cell_major"
    k = 10
    for impl in ("pallas", "xla"):
        index.scan_impl = impl
        for group in (1, 2, 4):
            index.scan_group = group
            for n_probe in (8, 32, 128):
                index.n_probe = n_probe
                vals, pred = index.search(qj, k=k)
                jax.block_until_ready(vals)
                t0 = time.perf_counter()
                reps = 5
                for _ in range(reps):
                    vals, pred = index.search(qj, k=k)
                jax.block_until_ready(vals)
                dt = (time.perf_counter() - t0) / reps
                r = recall_at_k(np.asarray(pred), gt[:, :k], ids_map, k)
                print(f"impl={impl} group={group} np={n_probe}: "
                      f"{dt * 1e3:.1f} ms -> {nq / dt:,.0f} q/s "
                      f"recall@10={r:.4f}", flush=True)


if __name__ == "__main__":
    main()
