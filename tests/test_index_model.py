"""Randomized end-to-end index property test.

Interleaves add / remove / search on an IVFPQIndex and checks every
search against a brute-force oracle over the *current* live set — the
index-level counterpart of the container model tests. Catches staleness
bugs (flat-cache invalidation, id-map drift, hole reuse) that fixed
scenarios miss.
"""

import numpy as np
import jax.numpy as jnp

from torchpq_tpu.index import IVFPQIndex


def test_index_random_interleaving(rng):
    d, n_cells = 32, 8
    index = IVFPQIndex(d_vector=d, n_subvectors=8, n_cells=n_cells,
                       initial_size=64)
    pool = rng.standard_normal((4000, d)).astype(np.float32)
    index.train(jnp.asarray(pool[:1000].T))
    index.n_probe = n_cells  # all cells: recall loss is PQ-only

    live = {}  # id -> row index into pool
    cursor = 0
    for step in range(12):
        op = rng.random()
        if op < 0.55 or len(live) < 50:
            n = int(rng.integers(20, 200))
            rows = np.arange(cursor, cursor + n) % len(pool)
            cursor += n
            ids = np.asarray(index.add(jnp.asarray(pool[rows].T)))
            for i, r in zip(ids, rows):
                live[int(i)] = int(r)
        else:
            pick = rng.choice(np.fromiter(live, np.int64),
                              size=int(rng.integers(10, 60)), replace=False)
            assert index.remove(ids=jnp.asarray(pick)) == len(pick)
            for i in pick:
                del live[int(i)]
        assert index.n_items == len(live)

        # oracle: exact ADC top-1 over the decoded reconstructions of the
        # live set (n_probe = n_cells makes the scan exhaustive, so any
        # disagreement is a real bookkeeping bug, not probing loss)
        ids_live = np.fromiter(live, np.int64)
        qrows = rng.choice(ids_live, size=min(16, len(live)), replace=False)
        q = pool[[live[int(i)] for i in qrows]]
        for mode in ("cell_major", "flat"):
            index.scan_mode = mode
            vals, got = index.search(jnp.asarray(q.T), k=1)
            got = np.asarray(got)[:, 0]
            # the query IS a stored vector; its reconstruction is the
            # unique ADC argmax with overwhelming probability
            match = (got == qrows).mean()
            assert match >= 0.9, (step, mode, match)
            assert set(got.tolist()) <= set(ids_live.tolist()) | {-1}
        index.scan_mode = "auto"
