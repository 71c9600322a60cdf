"""AOT-compile the 100M code-domain search program and print its memory
analysis — no buffers needed, so it runs even though the 100M index
state itself is not loaded. Finds the allocation that RESOURCE_EXHAUSTED
the r4c demo's search rows (ingest + freeze succeeded at 11.06 GB; the
search program then refused to fit the remaining ~5 GB).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from torchpq_tpu.index.ivfpq import _search_full_codes

# r4c demo shapes: n=100M, presized capacity from the count pass
CAP = 143_966_336
N_CELLS = 32_768
M, D, NQ, G = 64, 128, 256, 2
S_MAX = 8_192

sds = jax.ShapeDtypeStruct
args = (
    sds((NQ, D), jnp.float32),                    # q
    sds((N_CELLS, D), jnp.float32),               # coarse codebook
    sds((CAP // G, G * M), jnp.uint8),            # packed codes
    sds((CAP,), jnp.float32),                     # norms
    sds((CAP,), jnp.bool_),                       # is_empty
    sds((N_CELLS,), jnp.int32),                   # cell_start
    sds((N_CELLS,), jnp.int32),                   # cell_capacity
    sds((CAP,), jnp.int32),                       # address2id
    sds((M, 256, D // M), jnp.float32),           # pq codebook
    sds((), jnp.float32),                         # temperature
)

for n_probe in (1, 8, 32):
    lowered = _search_full_codes.lower(
        *args, k=10, n_probe=n_probe, use_smart=True, precision=None,
        distance="euclidean", s_max=S_MAX, n_cells=N_CELLS, approx=True,
        m=M, impl="auto")
    try:
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        print(f"np={n_probe}: compiled OK; "
              f"temp={ma.temp_size_in_bytes / 1e9:.2f} GB "
              f"args={ma.argument_size_in_bytes / 1e9:.2f} GB "
              f"out={ma.output_size_in_bytes / 1e9:.2f} GB "
              f"peak_alias={ma.alias_size_in_bytes / 1e9:.2f} GB",
              flush=True)
    except Exception as e:
        print(f"np={n_probe}: COMPILE FAILED: {str(e)[:1500]}", flush=True)
