"""Scalar-quantizer codec (reference: torchpq/codec/SQCodec.py).

bits in {4, 8, 16, 32}; modes `minmax` (per-dimension min/max window) and
`meanstd` (mean ± alpha·std window); 4-bit packs two nibbles per byte
(reference SQCodec.py:95-117). Input layout is the reference's
[d_vector, n_data]; lower/upper are per-dimension.
"""

import jax.numpy as jnp

from .base import BaseCodec


class SQCodec(BaseCodec):
    def __init__(self, bits=8, alpha=1.0, mode="minmax", verbose=0):
        super().__init__(verbose=verbose)
        assert bits in (4, 8, 16, 32)
        assert mode in ("minmax", "meanstd")
        self.bits = bits
        self.alpha = alpha
        self.mode = mode
        self.n_bins = 2 ** bits
        self.register_state("lower", None)
        self.register_state("upper", None)
        self.register_state("binsize", None)

    def train(self, x):
        """x: [d_vector, n] (reference SQCodec.py:36-65)."""
        x = jnp.asarray(x).astype(jnp.float32)
        if self.mode == "minmax":
            lower = jnp.min(x, axis=-1)
            upper = jnp.max(x, axis=-1)
        else:
            mean = jnp.mean(x, axis=-1)
            std = jnp.std(x, axis=-1)
            lower = mean - self.alpha * std
            upper = mean + self.alpha * std
        self.register_state("lower", lower)
        self.register_state("upper", upper)
        if self.bits <= 8:
            self.register_state(
                "binsize", jnp.maximum(upper - lower, 1e-12) / (self.n_bins - 1))
        self._set_trained()

    def encode(self, x):
        """x: [d, n] -> packed codes (reference SQCodec.py:119-135)."""
        assert self.is_trained, "codec is not trained"
        x = jnp.asarray(x).astype(jnp.float32)
        if self.bits == 32:
            return x
        if self.bits == 16:
            return x.astype(jnp.float16)
        q = jnp.clip(
            jnp.round((x - self.lower[:, None]) / self.binsize[:, None]),
            0, self.n_bins - 1).astype(jnp.uint8)
        if self.bits == 8:
            return q
        # 4-bit: pack two codes per byte along the feature dim
        d = q.shape[0]
        assert d % 2 == 0, "4-bit SQ needs an even d_vector"
        hi = q[0::2]
        lo = q[1::2]
        return (hi * 16 + lo).astype(jnp.uint8)

    def decode(self, code):
        """Inverse of encode (reference SQCodec.py:137-152)."""
        assert self.is_trained, "codec is not trained"
        code = jnp.asarray(code)
        if self.bits == 32:
            return code.astype(jnp.float32)
        if self.bits == 16:
            return code.astype(jnp.float32)
        if self.bits == 8:
            return code.astype(jnp.float32) * self.binsize[:, None] + \
                self.lower[:, None]
        hi = (code // 16).astype(jnp.float32)
        lo = (code % 16).astype(jnp.float32)
        d2, n = code.shape
        out = jnp.zeros((d2 * 2, n), jnp.float32)
        out = out.at[0::2].set(hi)
        out = out.at[1::2].set(lo)
        return out * self.binsize[:, None] + self.lower[:, None]
