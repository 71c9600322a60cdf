"""Row-wise top-k facade (reference counterpart: torchpq/fn/Topk.py).

The reference buckets k into seven hand-written CUDA select kernels
(torchpq/fn/Topk.py:43-67: top1/top32/topk_select at tpb 64..1024) because GPU
top-k needs bespoke warp/block sort networks. On TPU the compiler already owns
this: `jax.lax.top_k` lowers to an optimized sort-based TPU implementation and
`jax.lax.approx_max_k` to the TPU's native approximate top-k unit. We keep the
facade (with the reference's `dim` semantics) and add the approximate fast path
as an explicit option.
"""

import jax
import jax.numpy as jnp


def topk(x, k, dim=-1, approx=False, recall_target=0.95):
    """Top-k along `dim`; returns (values, indices), largest first.

    x may be any float array; k must be static. With approx=True uses the
    TPU-native approximate top-k (jax.lax.approx_max_k).
    """
    x = jnp.asarray(x)
    ndim = x.ndim
    dim = dim % ndim
    if dim != ndim - 1:
        x = jnp.moveaxis(x, dim, -1)
    n = x.shape[-1]
    k_eff = min(int(k), n)
    if approx:
        values, indices = jax.lax.approx_max_k(x, k_eff,
                                               recall_target=recall_target)
    else:
        values, indices = jax.lax.top_k(x, k_eff)
    if k_eff < k:
        # Pad to the requested k with -inf / index 0, mirroring the reference's
        # "pad n_candidates" behaviour (kernels/IVFPQTopkCuda.py:113-114).
        pad = int(k) - k_eff
        values = jnp.pad(values, [(0, 0)] * (ndim - 1) + [(0, pad)],
                         constant_values=-jnp.inf)
        indices = jnp.pad(indices, [(0, 0)] * (ndim - 1) + [(0, pad)])
    if dim != ndim - 1:
        values = jnp.moveaxis(values, -1, dim)
        indices = jnp.moveaxis(indices, -1, dim)
    return values, indices


class Topk:
    """Callable facade matching the reference's `torchpq.fn.Topk` object
    (constructed once at import, torchpq/__init__.py:22)."""

    def __call__(self, x, k, dim=-1, approx=False, recall_target=0.95):
        return topk(x, k, dim=dim, approx=approx, recall_target=recall_target)
