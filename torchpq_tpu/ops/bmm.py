"""Batched matmul family with distance epilogues.

Reference counterpart: the BMM CUDA kernel family —
torchpq/kernels/cuda/bmm.cu (plain bmm with madd/squared_l2/l1/... epilogues,
bmm_helpers.cu:25-74), minbmm.cu (fused bmm + min/argmin), topkbmm.cu (fused
bmm + per-row top-128 with a global-merge mutex), mbmm.cu (masked bmm) and
their wrappers BMMCuda/MinBMMCuda/TopkBMMCuda/MBMMCuda.

On TPU these are one einsum plus a fused epilogue; XLA does the fusion the
reference hand-schedules, and top-k/argmax run per tile without any global
mutex (no cross-block races exist in the XLA model — SURVEY.md §5.2).

All functions take batched row-major operands: a [l, m, d], b [l, n, d]
(transpose modes of the reference collapse to how callers lay out inputs).
"""

import functools

import jax
import jax.numpy as jnp

from .. import config
from .. import util
from ..metric import canonical_distance


@functools.partial(jax.jit, static_argnames=("distance", "precision"))
def bmm(a, b, distance="inner", precision=None):
    """Batched similarity matrices: [l, m, d] x [l, n, d] -> [l, m, n].

    `distance` plays the role of the reference's epilogue selection
    (negative_squared_l2 / inner / negative_manhattan / cosine).
    """
    distance = canonical_distance(distance)
    precision = precision or config.SEARCH_PRECISION
    if distance == "manhattan":
        # VPU path: chunk the m axis so the [l, chunk, n, d] broadcast
        # difference stays within the configured score-tile budget
        l, m, d = a.shape
        n = b.shape[1]

        def one(blk):
            return -jnp.sum(
                jnp.abs(blk[:, :, None, :] - b[:, None, :, :]), axis=-1)

        chunk = max(8, min(m, config.MAX_SIM_CHUNK_ELEMS // max(l * n, 1)))
        if m <= chunk:
            return one(a)
        m_pad = util.round_up(m, chunk)
        a_pad = jnp.pad(a, ((0, 0), (0, m_pad - m), (0, 0)))
        blocks = a_pad.reshape(l, -1, chunk, d).swapaxes(0, 1)
        out = jax.lax.map(one, blocks)  # [nb, l, chunk, n]
        return out.swapaxes(0, 1).reshape(l, m_pad, n)[:, :m]
    if distance == "cosine":
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    ab = jnp.einsum("lmd,lnd->lmn", a, b, precision=precision,
                    preferred_element_type=jnp.float32)
    if distance == "euclidean":
        ab = (2.0 * ab
              - jnp.sum(jnp.square(a), -1)[:, :, None]
              - jnp.sum(jnp.square(b), -1)[:, None, :])
    return ab


@functools.partial(jax.jit, static_argnames=("distance", "dim", "precision"))
def min_bmm(a, b, distance="euclidean", dim=2, precision=None):
    """Fused bmm + max-similarity reduce (reference minbmm.cu / MaxSimCuda):
    returns (values, indices) of the best match along `dim` (1 or 2)."""
    sims = bmm(a, b, distance=distance, precision=precision)
    assert dim in (1, 2)
    vals = jnp.max(sims, axis=dim)
    idx = jnp.argmax(sims, axis=dim).astype(jnp.int32)
    return vals, idx


@functools.partial(jax.jit,
                   static_argnames=("k", "distance", "dim", "precision"))
def topk_bmm(a, b, k=128, distance="inner", dim=2, precision=None):
    """Fused bmm + per-row top-k (reference topkbmm.cu, k <= 128)."""
    sims = bmm(a, b, distance=distance, precision=precision)
    assert dim in (1, 2)
    if dim == 1:
        sims = jnp.swapaxes(sims, 1, 2)
    k = min(k, sims.shape[-1])
    vals, idx = jax.lax.top_k(sims, k)
    return vals, idx


@functools.partial(jax.jit, static_argnames=("distance", "precision"))
def masked_bmm(a, b, mask, distance="inner", precision=None):
    """Masked bmm (reference mbmm.cu — broken/unwired there, working here):
    positions where mask is False score -inf. mask: broadcastable to
    [l, m, n]."""
    sims = bmm(a, b, distance=distance, precision=precision)
    return jnp.where(mask, sims, -jnp.inf)
