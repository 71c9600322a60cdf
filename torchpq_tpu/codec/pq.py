"""Product-quantizer codec (reference: torchpq/codec/PQCodec.py).

Trains 256-centroid codebooks per subvector with MultiKMeans (25 iterations,
reference PQCodec.py:27-32), encodes to uint8 [m, n], decodes by codebook
gather, and builds the per-query ADC table. Encode/decode are batched matmuls
and gathers — both MXU/XLA-native; the reference needed a dedicated decode
kernel (pq_decode.cu) only because of its interleaved uchar4 storage.
"""

import functools

import jax
import jax.numpy as jnp

from .base import BaseCodec
from ..clustering import MultiKMeans
from ..ops import adc
from ..ops.max_sim import batched_max_sim
from .. import util
from ..metric import canonical_distance


@functools.partial(jax.jit, static_argnames=("m", "dsub", "fast"))
def _decode_nd(codes_nm, codebook, *, m, dsub, fast=False):
    """codes [n, m] uint8, codebook [m, n_clusters, dsub] -> [n, d] f32.

    Large batches decode by a block-diagonal one-hot matmul: the gather
    formulation materializes a [n*m, dsub] intermediate whose TPU tiling
    pads dsub up to 128 lanes (64x waste at dsub=2 — a 32 GB allocation at
    the 1M rebuild chunk, which aborts compilation). One-hot f32 at
    HIGHEST precision is bit-exact with the gather (verified on v5e:
    maxdiff 0.0 over 20k rows) and measured 151 ms for 1M x m64 vs 1.9 s
    for the best-layout gather. Small batches keep the gather — the
    one-hot's [sub, m*n_clusters] buffer is wasteful there, and CPU test
    runs would pay a 17 GF matmul per tiny decode.

    fast=True runs the one-hot in bf16 at default precision (~8x the f32
    HIGHEST MXU rate): values are the bf16-rounded codewords — the same
    rounding the bf16 decoded scan cache applies — summed exactly (f32
    accumulation over a one-hot row). The IVFPQR rerank uses it: its
    candidate-batch decode is the rescore's dominant cost and bf16
    reconstruction is precisely what round 1's decoded_full cache scored
    against."""
    n = codes_nm.shape[0]
    nc = codebook.shape[1]
    if n <= 8192 or m * nc > 65536:
        # gather per subvector: out[n, i, :] = codebook[i, codes[n, i], :]
        gathered = jnp.take_along_axis(
            codebook[None, :, :, :],
            codes_nm.astype(jnp.int32)[:, :, None, None], axis=2)
        g = gathered.reshape(n, m * dsub)
        return g.astype(jnp.bfloat16).astype(jnp.float32) if fast else g
    mm_dtype = jnp.bfloat16 if fast else jnp.float32
    mm_prec = None if fast else jax.lax.Precision.HIGHEST
    bd = jnp.zeros((m, nc, m, dsub), jnp.float32)
    bd = bd.at[jnp.arange(m), :, jnp.arange(m), :].set(codebook)
    bd = bd.reshape(m * nc, m * dsub).astype(mm_dtype)
    sub = 4096
    cvals = jnp.arange(nc, dtype=jnp.int32)

    def one(c):  # [sub, m]
        oh = (c.astype(jnp.int32)[:, :, None]
              == cvals[None, None, :]).astype(mm_dtype)
        return jnp.dot(oh.reshape(sub, m * nc), bd,
                       preferred_element_type=jnp.float32,
                       precision=mm_prec)

    n_pad = util.round_up(n, sub)
    cp = jnp.pad(codes_nm, ((0, n_pad - n), (0, 0)))
    out = jax.lax.map(one, cp.reshape(n_pad // sub, sub, m))
    return out.reshape(n_pad, m * dsub)[:n]


def _aniso_chunk(m, k):
    from .. import config
    return util.next_pow2(min(max(
        8, config.MAX_SIM_CHUNK_ELEMS // max(m * k, 1)), 65536))


def _aniso_blocks(sub_dn, chunk, labels=None, k=None):
    """Pad n to the chunk and split into [nb, m, d, chunk] blocks (and the
    matching label blocks, padded into the dropped one-hot bin k)."""
    m, d, n = sub_dn.shape
    n_pad = util.round_up(n, chunk)
    pad = jnp.pad(sub_dn, ((0, 0), (0, 0), (0, n_pad - n)))
    blocks = pad.reshape(m, d, -1, chunk).transpose(2, 0, 1, 3)
    if labels is None:
        return blocks
    lab_pad = jnp.pad(labels, ((0, 0), (0, n_pad - n)), constant_values=k)
    return blocks, lab_pad.reshape(m, -1, chunk).swapaxes(0, 1)


@functools.partial(jax.jit, static_argnames=("eta", "k", "chunk"))
def _aniso_assign(sub_dn, cents, *, eta, k, chunk):
    """Anisotropic (score-aware) codeword assignment, Guo et al. 2020
    ("Accelerating Large-Scale Inference with Anisotropic Vector
    Quantization", ScaNN), separable per-subvector approximation.

    Loss per (row, codeword): eta*|r_par|^2 + |r_orth|^2 with r = x - c
    decomposed along x_hat = x/|x|. Row-constant terms dropped, the cost
    reduces to |c|^2 - 2*eta*|x|*p + (eta-1)*p^2 with p = <c, x_hat> — two
    batched matmul terms per subvector, chunked over n in the feature-major
    [m, d, n] layout (a [m, n, dsub] array pays up to 64x lane padding).
    sub_dn [m, dsub, n]; cents [m, k, dsub] -> labels [m, n]."""
    m, d, n = sub_dn.shape
    c_sq = jnp.sum(cents * cents, axis=-1)                    # [m, k]

    def one(b_dn):
        nrm = jnp.sqrt(jnp.sum(jnp.square(b_dn), axis=1))     # [m, c]
        xhat = b_dn / jnp.maximum(nrm, 1e-12)[:, None, :]
        p = jnp.einsum("mdc,mkd->mck", xhat, cents,
                       preferred_element_type=jnp.float32)
        cost = (c_sq[:, None, :] - (2.0 * eta) * nrm[..., None] * p
                + (eta - 1.0) * p * p)
        return jnp.argmin(cost, axis=-1).astype(jnp.int32)    # [m, c]

    if n <= chunk:
        return one(sub_dn)
    labels = jax.lax.map(one, _aniso_blocks(sub_dn, chunk))   # [nb, m, c]
    return labels.transpose(1, 0, 2).reshape(m, -1)[:, :n]


@functools.partial(jax.jit, static_argnames=("eta", "iters", "k", "chunk"))
def _aniso_refine(sub_dn, cents, *, eta, iters, k, chunk):
    """Anisotropic Lloyd refinement (warm-started from plain k-means).

    Update: the minimizer of the summed anisotropic loss per cluster is the
    [dsub, dsub] solve (n_c*I + (eta-1)*sum x_hat x_hat^T) c = eta*sum x —
    closed form because the separable loss is quadratic in c (at eta=1 this
    is exactly the plain Lloyd mean). Batched over m subvectors x k
    clusters; per-cluster sums accumulate as chunked one-hot contractions
    in the feature-major layout (same recipe as
    ops/segment_ops.batched_compute_centroids_dn); empty clusters keep
    their centroid."""
    m, d, n = sub_dn.shape
    eye = jnp.eye(d, dtype=jnp.float32)
    e1 = eta - 1.0

    def body(_, c):
        lab = _aniso_assign(sub_dn, c, eta=eta, k=k, chunk=chunk)
        blocks, lab_blocks = _aniso_blocks(sub_dn, chunk, lab, k)

        def step(carry, args):
            cnt, sx, mat = carry
            b_dn, lb = args                                   # [m,d,c], [m,c]
            nrm = jnp.sqrt(jnp.sum(jnp.square(b_dn), axis=1))
            xhat = b_dn / jnp.maximum(nrm, 1e-12)[:, None, :]
            oh = jax.nn.one_hot(lb, k, dtype=jnp.float32)     # [m, c, k]
            cnt = cnt + jnp.sum(oh, axis=1)
            sx = sx + jnp.einsum("mdc,mck->mkd", b_dn, oh,
                                 preferred_element_type=jnp.float32)
            mat = mat + jnp.einsum("mdc,mec,mck->mkde", xhat, xhat, oh,
                                   preferred_element_type=jnp.float32)
            return (cnt, sx, mat), None

        init = (jnp.zeros((m, k), jnp.float32),
                jnp.zeros((m, k, d), jnp.float32),
                jnp.zeros((m, k, d, d), jnp.float32))
        (cnt, sx, mat), _ = jax.lax.scan(step, init, (blocks, lab_blocks))
        a = cnt[..., None, None] * eye + e1 * mat + 1e-6 * eye
        c_new = jnp.linalg.solve(a, (eta * sx)[..., None])[..., 0]
        return jnp.where((cnt > 0)[..., None], c_new, c)

    return jax.lax.fori_loop(0, iters, body, cents)


class PQCodec(BaseCodec):
    def __init__(self, d_vector, n_subvectors=8, n_clusters=256,
                 distance="euclidean", verbose=0, max_iter=25, n_redo=1,
                 tol=1e-4, seed=0, anisotropic_eta=None, anisotropic_iters=8):
        super().__init__(verbose=verbose)
        assert d_vector % n_subvectors == 0
        assert anisotropic_eta is None or anisotropic_eta >= 1.0, \
            "anisotropic_eta weights the parallel residual; must be >= 1"
        self.anisotropic_eta = (None if anisotropic_eta is None
                                else float(anisotropic_eta))
        self.anisotropic_iters = int(anisotropic_iters)
        self.d_vector = d_vector
        self.n_subvectors = n_subvectors
        self.n_clusters = n_clusters
        self.d_subvector = d_vector // n_subvectors
        self.distance = canonical_distance(distance)
        self.register_module("kmeans", MultiKMeans(
            n_clusters=n_clusters, distance=distance, max_iter=max_iter,
            n_redo=n_redo, tol=tol, verbose=verbose, seed=seed))

    @property
    def codebook(self):
        """[n_subvectors, d_subvector, n_clusters] (reference PQCodec.py:37-47)."""
        return self.kmeans.centroids if self.is_trained else None

    @property
    def codebook_internal(self):
        """[m, n_clusters, d_subvector] row-major, for the ops layer."""
        return self.kmeans._centroids

    # -- reference-layout API ([d, n] tensors) --
    def train(self, x, centroids=None):
        """x: [d_vector, n] (reference PQCodec.py:48-60). `centroids`
        ([m, d_subvector, n_clusters]) warm-starts the codebooks — used by
        OPQ's alternation (transform/opq.py)."""
        x = jnp.asarray(x)
        assert x.shape[0] == self.d_vector
        sub = x.reshape(self.n_subvectors, self.d_subvector, -1)
        self.kmeans.fit(sub, centroids=centroids)
        if self.anisotropic_eta is not None and self.anisotropic_eta > 1.0:
            # score-aware refinement (ScaNN, Guo et al. 2020): weight the
            # residual component parallel to the datapoint by eta — raises
            # recall@k for MIPS/cosine retrieval at equal code budget
            m, k = self.n_subvectors, self.n_clusters
            cents = _aniso_refine(
                sub.astype(jnp.float32), self.kmeans._centroids,
                eta=self.anisotropic_eta, iters=self.anisotropic_iters,
                k=k, chunk=_aniso_chunk(m, k))
            self.kmeans.register_state("_centroids", cents)
        self._set_trained()

    def encode(self, x):
        """x: [d_vector, n] -> codes [n_subvectors, n] uint8
        (reference PQCodec.py:77-93)."""
        assert self.is_trained, "codec is not trained"
        x = jnp.asarray(x)
        return self.encode_nd(x.T).T

    def decode(self, code):
        """codes [n_subvectors, n] uint8 -> [d_vector, n] f32
        (reference PQCodec.py:113-130)."""
        assert self.is_trained, "codec is not trained"
        return self.decode_nd(jnp.asarray(code).T).T

    def precompute_adc(self, query):
        """query [d_vector, nq] -> ADC table [m, nq, 256]
        (reference PQCodec.py:62-75)."""
        assert self.is_trained
        table = adc.build_adc_table(
            jnp.asarray(query).T.astype(jnp.float32),
            self.codebook_internal, self.distance)
        return jnp.swapaxes(table, 0, 1)

    # -- row-major internal API used by indexes --
    def encode_nd(self, x_nd):
        """[n, d] -> [n, m] uint8 codes."""
        assert self.is_trained, "codec is not trained"
        x_nd = jnp.asarray(x_nd).astype(jnp.float32)
        n = x_nd.shape[0]
        # feature-major [m, dsub, n]: a [m, n, dsub] array with tiny
        # trailing dsub pays up to 64x lane padding (ops/max_sim.py dn path)
        sub = x_nd.T.reshape(self.n_subvectors, self.d_subvector, n)
        if self.anisotropic_eta is not None and self.anisotropic_eta > 1.0:
            labels = _aniso_assign(
                sub, self.codebook_internal, eta=self.anisotropic_eta,
                k=self.n_clusters,
                chunk=_aniso_chunk(self.n_subvectors, self.n_clusters))
            return labels.T.astype(jnp.uint8)
        if self.distance == "cosine":
            # assignment on normalized subvectors, mirroring the reference's
            # cosine MultiKMeans fit/predict (clustering/KMeans.py:307-321)
            sub = util.normalize(sub, axis=1)
        _, labels = batched_max_sim(sub, self.codebook_internal,
                                    self.distance, layout="dn")
        return labels.T.astype(jnp.uint8)  # [n, m]

    def decode_nd(self, codes_nm):
        """[n, m] uint8 -> [n, d] f32 reconstruction."""
        assert self.is_trained, "codec is not trained"
        return _decode_nd(jnp.asarray(codes_nm), self.codebook_internal,
                          m=self.n_subvectors, dsub=self.d_subvector)


def pack_nibbles(codes):
    """Pack 4-bit codes [m, n] (values < 16) into [m//2, n] bytes — the
    reference's two-codes-per-byte 4-bit PQ layout (ivfpq4_top1_v1.cu,
    IVFPQ4Top1Cuda_v1.py:17-28)."""
    codes = jnp.asarray(codes)
    assert codes.shape[0] % 2 == 0
    hi = codes[0::2].astype(jnp.uint8)
    lo = codes[1::2].astype(jnp.uint8)
    return hi * 16 + lo


def unpack_nibbles(packed):
    """Inverse of pack_nibbles: [m//2, n] -> [m, n]."""
    packed = jnp.asarray(packed)
    m2, n = packed.shape
    out = jnp.zeros((m2 * 2, n), jnp.uint8)
    out = out.at[0::2].set(packed // 16)
    out = out.at[1::2].set(packed % 16)
    return out


@jax.jit
def paired_codebook(codebook):
    """4-bit codebook [m, 16, dsub] -> byte-pair codebook [m//2, 256, 2*dsub]
    with entry (i, hi*16+lo) = concat(codebook[2i, hi], codebook[2i+1, lo]).

    This is the TPU translation of the reference's packed 4-bit PQ
    (ivfpq4_top1_v1.cu, IVFPQ4Top1Cuda_v1.py:17-28): instead of unpacking
    nibbles in the inner loop, treat each packed BYTE as a code over a
    256-entry codebook of double-width subvectors. Packed codes against this
    codebook are bit-identical in meaning to unpacked 4-bit codes against the
    original for every per-subvector-decomposable quantity — decode
    (concatenation), inner-product/euclidean ADC tables (sums), and manhattan
    (L1 sums) — so the entire downstream machinery (decoded-cache rebuild,
    one-hot code-domain scan, rerank decode) runs on packed storage unchanged.
    """
    m, nc, dsub = codebook.shape
    assert m % 2 == 0 and nc == 16
    hi = jnp.repeat(codebook[0::2], nc, axis=1)   # index b -> b // 16
    lo = jnp.tile(codebook[1::2], (1, nc, 1))     # index b -> b %  16
    return jnp.concatenate([hi, lo], axis=-1)
