"""Bitonic top-k merge of pre-sorted runs — the deep-k final merge.

Reference counterpart: the streaming in-kernel merge of
torchpq/kernels/cuda/ivfpq_topk.cu:763-931 (per-thread register stacks +
final bitonic merge network) and the k-bucket select dispatch of
fn/IVFPQTopk.py:54-228. The TPU shape of the problem: after the block scan
and the unsort, each query holds `r` per-pair partial top-k lists that are
DESCENDING SORTED RUNS (the per-block select emits winners best-first).
`jax.lax.top_k` over the concatenation is a full O(w log^2 w) sort network
that ignores that structure — measured 36 ms at [10k, 2048] — while a
bitonic merge tree exploits it: merging two sorted runs of width w costs
log2(2w)+1 compare-exchange stages of full-width vector min/max, and each
round's output can be truncated to the top next_pow2(k) columns (top-k of a
union is inside the union of top-halves), so the tree costs
~sum_r log2(width) stages instead of log^2(total). Every stage is a static
reshape + elementwise select — no gathers, no data-dependent control flow,
exactly what the VPU wants.

Keys are compared as int32 (callers pass sortable-int32 packed keys — the
pack32 wire format and the exact path's sortable keys both already live in
that space); one int32 payload rides along through the same selects (the
pair index for pack32, the address for the exact path).
"""

import functools

import jax
import jax.numpy as jnp

from .. import util

NEG = jnp.int32(-2 ** 31)  # -inf in sortable-int32 space


def _merge_two_desc(ak, ap, bk, bp):
    """Bitonic-merge two descending [..., w] runs into one descending
    [..., 2w] run. Payload follows its key through every exchange."""
    w = ak.shape[-1]
    # desc ++ reverse(desc) = ascending-then-descending: a bitonic sequence
    k = jnp.concatenate([ak, bk[..., ::-1]], axis=-1)
    p = jnp.concatenate([ap, bp[..., ::-1]], axis=-1)
    dist = w
    while dist >= 1:
        shape = k.shape[:-1] + (k.shape[-1] // (2 * dist), 2, dist)
        k2 = k.reshape(shape)
        p2 = p.reshape(shape)
        lo_k, hi_k = k2[..., 0, :], k2[..., 1, :]
        lo_p, hi_p = p2[..., 0, :], p2[..., 1, :]
        take_lo = lo_k >= hi_k
        mx_k = jnp.where(take_lo, lo_k, hi_k)
        mx_p = jnp.where(take_lo, lo_p, hi_p)
        mn_k = jnp.where(take_lo, hi_k, lo_k)
        mn_p = jnp.where(take_lo, hi_p, lo_p)
        k = jnp.stack([mx_k, mn_k], axis=-2).reshape(k.shape)
        p = jnp.stack([mx_p, mn_p], axis=-2).reshape(p.shape)
        dist //= 2
    return k, p


def merge_runs_topk(keys, payload, k):
    """Top-k of `r` descending sorted runs.

    keys: [nq, r, w] int32, each [i, j] row descending (padding rows/tails
    must be NEG); payload: int32 same shape. Returns (keys [nq, kk],
    payload [nq, kk]) descending, kk = min(k, r*w).
    """
    nq, r, w = keys.shape
    kk = min(k, r * w)
    # pow2-pad the run axis with NEG rows (their payloads never win)
    rp = util.next_pow2(r)
    if rp != r:
        keys = jnp.pad(keys, ((0, 0), (0, rp - r), (0, 0)),
                       constant_values=NEG)
        payload = jnp.pad(payload, ((0, 0), (0, rp - r), (0, 0)),
                          constant_values=0)
        r = rp
    # pow2-pad the width (runs stay descending with a NEG tail)
    wp = util.next_pow2(w)
    if wp != w:
        keys = jnp.pad(keys, ((0, 0), (0, 0), (0, wp - w)),
                       constant_values=NEG)
        payload = jnp.pad(payload, ((0, 0), (0, 0), (0, wp - w)),
                          constant_values=0)
        w = wp
    keep = util.next_pow2(kk)
    while r > 1:
        mk, mp = _merge_two_desc(keys[:, 0::2], payload[:, 0::2],
                                 keys[:, 1::2], payload[:, 1::2])
        if mk.shape[-1] > keep:
            # merged pairs are fully sorted: truncating to the top `keep`
            # (>= k) columns cannot drop a global top-k element
            mk = mk[..., :keep]
            mp = mp[..., :keep]
        keys, payload = mk, mp
        r //= 2
    return keys[:, 0, :kk], payload[:, 0, :kk]


@functools.partial(jax.jit, static_argnames=("k",))
def topk_desc_runs(keys2d, payload2d, *, k, run_width):
    """Convenience wrapper over [nq, r*run_width] flattened runs."""
    nq, total = keys2d.shape
    r = total // run_width
    return merge_runs_topk(keys2d.reshape(nq, r, run_width),
                           payload2d.reshape(nq, r, run_width), k)
