"""Shape/dtype utilities (reference counterpart: torchpq/util.py).

The reference's util validates devices/dtypes and tabulates CUDA shared-memory
capacity (torchpq/util.py:45-80); none of that maps to TPU. What survives is
normalization, dtype parsing and the timing probe, plus TPU-specific padding
helpers (lane = 128, sublane = 8 for f32).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128
SUBLANE = 8


def cdiv(a, b):
    return -(-a // b)


def round_up(x, m):
    return cdiv(x, m) * m


def next_pow2(x):
    x = int(x)
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


def locality_order(centroids):
    """Recursive balanced PCA-bisection order over [n, d] centroid rows:
    spatially near centroids receive near ids, at EVERY pow2 granularity
    (each recursion level splits a contiguous id range in half), so
    supercell grouping (ops/adc.py scan_group) turns id-adjacency into
    probe-window sharing: a query's coarse top-n_probe cells — all near
    the query, hence near each other — dedup into ~n_probe/group live
    supercell pairs instead of ~n_probe. Pure relabeling: the probed cell
    SET is unchanged, so recall is identical at group=1 and can only
    improve under grouping (supersets are scored). Host-side, one-shot at
    train time. Returns an int64 permutation: new id i holds old centroid
    order[i]."""
    c = np.asarray(centroids, np.float64)
    n = c.shape[0]
    order = np.empty(n, np.int64)
    pos = 0

    def rec(idx):
        nonlocal pos
        if len(idx) <= 2:
            order[pos:pos + len(idx)] = idx
            pos += len(idx)
            return
        x = c[idx] - c[idx].mean(0)
        v = x[0] + 1e-9  # top principal axis by power iteration
        for _ in range(8):
            v = x.T @ (x @ v)
            nv = np.linalg.norm(v)
            if nv < 1e-30:
                break
            v = v / nv
        t = x @ v
        srt = np.argsort(t, kind="stable")
        h = len(idx) // 2
        rec(idx[srt[:h]])
        rec(idx[srt[h:]])

    rec(np.arange(n))
    return order


def pad_cols(x, w):
    """Zero-pad the trailing axis to width `w` (no-op when already there).

    Used to match queries against a lane-padded decoded scan cache
    (d rounded up to a multiple of LANE so the Pallas scan's window DMA
    tiles cleanly): zero columns add nothing to any dot product, so
    scores are unchanged."""
    if x.shape[-1] == w:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, w - x.shape[-1])])


def str2dtype(dtype):
    """Parse a dtype name the way the reference's util.str2dtype does."""
    if not isinstance(dtype, str):
        return jnp.dtype(dtype)
    aliases = {
        "float": "float32", "double": "float64", "half": "float16",
        "long": "int64", "int": "int32", "uint8": "uint8",
    }
    return jnp.dtype(aliases.get(dtype, dtype))


def id_dtype():
    """Dtype for user-visible id arrays: int64 under jax_enable_x64 (the
    reference's int64 handles), int32 under JAX's default x32 mode (fine
    below 2^31 items). Creating arrays at this dtype instead of a blanket
    int64 avoids jax's per-call truncation warning."""
    import jax
    return jnp.int64 if jax.config.jax_enable_x64 else jnp.int32


def int8_quantize_rows(rows):
    """Per-row symmetric int8 quantization for the scan cache:
    rows [n, d] f32 -> (q [n, d] int8, scale [n] f32) with
    rows ≈ q * scale[:, None]. One definition for the index add path, the
    relayout rebuilder, and the sharded add path."""
    absmax = jnp.maximum(jnp.max(jnp.abs(rows), axis=-1), 1e-12)
    scale = absmax / 127.0
    return jnp.round(rows / scale[:, None]).astype(jnp.int8), scale


def normalize(x, axis=-1, eps=1e-12):
    """L2-normalize along `axis` (reference torchpq/util.py `normalize`)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def as_n_d(x, d_vector=None):
    """Accept the reference's [d, n] layout and return row-major [n, d].

    All public entry points call this at the boundary; internal compute is
    [n, d] (reference layout convention: README.md:51).
    """
    x = jnp.asarray(x)
    assert x.ndim == 2, f"expected 2-D [d_vector, n_data] input, got {x.shape}"
    if d_vector is not None:
        assert x.shape[0] == d_vector, (
            f"expected [d_vector={d_vector}, n_data], got {x.shape}")
    return x.T


def as_d_n(x):
    """Return to the reference's [d, n] layout at the boundary."""
    return x.T


def pad_rows(x, multiple, value=0):
    """Pad axis 0 of `x` up to a multiple; returns (padded, n_valid)."""
    n = x.shape[0]
    target = round_up(max(n, 1), multiple)
    if target == n:
        return x, n
    pad = [(0, target - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=value), n


class Timer:
    """Wall-clock probe with device sync (reference torchpq/util.py:86 tick())."""

    def __init__(self):
        self.t = time.perf_counter()

    def tick(self, label="", sync=None):
        """dt since the last tick. Pass the jax outputs being timed as
        `sync`: effects_barrier alone does not wait for pending *pure*
        computations, so without it a tick right after a jitted call
        measures dispatch time (the 'timings read ~0' trap, CLAUDE.md)."""
        if sync is not None:
            block_until_ready(sync)
        else:
            jax.effects_barrier()
        now = time.perf_counter()
        dt = now - self.t
        self.t = now
        if label:
            print(f"[tick] {label}: {dt * 1e3:.3f} ms")
        return dt


def block_until_ready(tree):
    return jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a,
        tree,
    )


def to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)
