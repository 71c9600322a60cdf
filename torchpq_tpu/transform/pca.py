"""PCA transform (reference: torchpq/transform/PCA.py — covariance +
torch.symeig, encode/decode with mean handling, :52-100)."""

import jax.numpy as jnp

from ..module import StateModule


class PCA(StateModule):
    def __init__(self, n_components, verbose=0):
        super().__init__(verbose=verbose)
        self.n_components = int(n_components)
        self.register_state("_components", None)  # [n_components, d]
        self.register_state("_mean", None)        # [d]
        self.register_state("_is_trained", False)

    @property
    def is_trained(self):
        return bool(self._is_trained)

    @staticmethod
    def covar(x, meaned=True, rowvar=True):
        """Covariance helper with the reference's signature (PCA.py:18-50).
        x: [d, n] when rowvar else [n, d]."""
        x = jnp.asarray(x).astype(jnp.float32)
        if not rowvar:
            x = x.T
        if not meaned:
            x = x - jnp.mean(x, axis=1, keepdims=True)
        n = x.shape[1]
        return (x @ x.T) / max(n - 1, 1)

    def train(self, x):
        """x: [d_vector, n] (reference PCA.py:52-74)."""
        x = jnp.asarray(x).astype(jnp.float32)
        mean = jnp.mean(x, axis=1)
        centered = x - mean[:, None]
        cov = self.covar(centered, meaned=True, rowvar=True)
        eigvals, eigvecs = jnp.linalg.eigh(cov)  # ascending
        comps = eigvecs[:, ::-1][:, :self.n_components].T  # [k, d]
        self.register_state("_components", comps)
        self.register_state("_mean", mean)
        self.register_state("_is_trained", True)
        explained = eigvals[::-1][:self.n_components].sum() / eigvals.sum()
        self.print_message(f"explained variance: {float(explained):.4f}", 1)
        return self

    def encode(self, x):
        """[d, n] -> [n_components, n] (reference PCA.py:76-87)."""
        assert self.is_trained
        x = jnp.asarray(x).astype(jnp.float32)
        return self._components @ (x - self._mean[:, None])

    def decode(self, y):
        """[n_components, n] -> [d, n] (reference PCA.py:89-99)."""
        assert self.is_trained
        return self._components.T @ jnp.asarray(y) + self._mean[:, None]
