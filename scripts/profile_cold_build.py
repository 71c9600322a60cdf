"""Cold-build attribution at the GIST shape (VERDICT r3 #8).

Round 3 measured cold GIST train at 1545 s vs the reference's 60 s and
couldn't say which programs the time went to. This script runs the exact
sweep-shaped build (d=960, IVF4096, PQ64, 1M adds) with jax_log_compiles
on and wall-clocks every stage, twice if asked:

  --cache off : jax_compilation_cache_dir cleared — the true out-of-box
                cold build (every program compiles over the tunnel)
  --cache on  : the package default (~/.cache/torchpq_tpu_jax) — what a
                second process on the same machine pays

Compile events print to stderr with program names + durations; the JSON
line at the end gives the stage walls so ARCHITECTURE.md can attribute
the floor program-by-program.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

ap = argparse.ArgumentParser()
ap.add_argument("--cache", choices=("on", "off"), default="on")
ap.add_argument("--d", type=int, default=960)
ap.add_argument("--n-base", type=int, default=1_000_000)
ap.add_argument("--n-cells", type=int, default=4096)
args = ap.parse_args()

jax.config.update("jax_log_compiles", True)
if args.cache == "off":
    jax.config.update("jax_compilation_cache_dir", None)

from bench import make_data  # noqa: E402
from torchpq_tpu.index import IVFPQIndex  # noqa: E402

d, n_cells, m = args.d, args.n_cells, 64
base, _ = make_data(args.n_base, 16, d, spectrum="manifold-12")

stages = {}
t_all = time.perf_counter()

t0 = time.perf_counter()
index = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=n_cells,
                   initial_size=max(16, (args.n_base // n_cells) * 2))
index.use_approx_topk = True
index.spill_cells = 8
index.spill_capacity = index.max_cell_capacity
stages["init_s"] = time.perf_counter() - t0

# time the codec sub-trains without changing train() semantics
for name, codec in (("vq", index.vq_codec), ("pq", index.pq_codec)):
    orig = codec.train

    def timed(x, _orig=orig, _name=name):
        t = time.perf_counter()
        r = _orig(x)
        jax.effects_barrier()
        stages[f"{_name}_train_s"] = time.perf_counter() - t
        return r

    codec.train = timed
t0 = time.perf_counter()
index.train(jnp.asarray(base[:100_000]).T)
stages["train_total_s"] = time.perf_counter() - t0

chunk = max(62_500, 250_000 * 128 // d)
t0 = time.perf_counter()
index.add(jnp.asarray(base[:chunk]).T)
jax.effects_barrier()
stages["first_add_s"] = time.perf_counter() - t0

t0 = time.perf_counter()
for i in range(chunk, args.n_base, chunk):
    index.add(jnp.asarray(base[i:i + chunk]).T)
jax.effects_barrier()
stages["rest_add_s"] = time.perf_counter() - t0

q = jnp.asarray(base[:1000].T)
index.n_probe = 32
index.scan_mode = "cell_major"
t0 = time.perf_counter()
v, _ = index.search(q, k=10)
jax.block_until_ready(v)
stages["first_search_s"] = time.perf_counter() - t0

stages["total_s"] = time.perf_counter() - t_all
out = {"cache": args.cache, "d": d, "n_cells": n_cells,
       "n_base": args.n_base,
       **{k: round(v, 1) for k, v in stages.items()}}
print(json.dumps(out), flush=True)
