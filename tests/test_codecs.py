import numpy as np
import jax.numpy as jnp

from torchpq_tpu.codec import VQCodec, PQCodec, SQCodec
from torchpq_tpu.transform import PCA, OPQ
from torchpq_tpu.ops import adc


def test_vq_codec(rng):
    x = rng.normal(size=(16, 400)).astype(np.float32)
    vq = VQCodec(n_clusters=8, max_iter=20)
    vq.train(jnp.asarray(x))
    code = vq.encode(jnp.asarray(x))
    assert code.shape == (400,)
    recon = vq.decode(code)
    assert recon.shape == (16, 400)
    # VQ reconstruction must beat the global mean
    base = ((x - x.mean(1, keepdims=True)) ** 2).mean()
    assert ((x - np.asarray(recon)) ** 2).mean() < base


def test_pq_codec_roundtrip(rng):
    d, n, m = 32, 600, 8
    x = rng.normal(size=(d, n)).astype(np.float32)
    pq = PQCodec(d_vector=d, n_subvectors=m)
    pq.train(jnp.asarray(x))
    code = pq.encode(jnp.asarray(x))
    assert code.shape == (m, n) and code.dtype == jnp.uint8
    recon = np.asarray(pq.decode(code))
    assert ((x - recon) ** 2).mean() < (x ** 2).mean() * 0.5
    assert pq.codebook.shape == (m, d // m, 256)


def test_pq_adc_table_is_exact(rng):
    """ADC via LUT gather == similarity vs reconstruction (the core identity
    the decoded-cache scan relies on)."""
    d, n, m, nq = 16, 100, 4, 7
    x = rng.normal(size=(d, n)).astype(np.float32)
    q = rng.normal(size=(nq, d)).astype(np.float32)
    pq = PQCodec(d_vector=d, n_subvectors=m)
    pq.train(jnp.asarray(x))
    codes_nm = pq.encode_nd(jnp.asarray(x.T))  # [n, m]
    lut = adc.build_adc_table(jnp.asarray(q), pq.codebook_internal,
                              "euclidean")
    scores_lut = np.asarray(adc.adc_lookup_scores(lut, codes_nm))
    recon = np.asarray(pq.decode_nd(codes_nm))  # [n, d]
    want = -((q[:, None, :] - recon[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(scores_lut, want, rtol=1e-3, atol=1e-3)


def test_pq_precompute_adc_reference_shape(rng):
    d, n, m = 16, 200, 4
    x = rng.normal(size=(d, n)).astype(np.float32)
    pq = PQCodec(d_vector=d, n_subvectors=m)
    pq.train(jnp.asarray(x))
    table = pq.precompute_adc(jnp.asarray(x[:, :5]))
    assert table.shape == (m, 5, 256)


def test_sq_codec_bits(rng):
    x = rng.normal(size=(8, 100)).astype(np.float32)
    for bits, tol in [(4, 0.5), (8, 0.05), (16, 1e-2), (32, 1e-6)]:
        sq = SQCodec(bits=bits)
        sq.train(jnp.asarray(x))
        rec = np.asarray(sq.decode(sq.encode(jnp.asarray(x))))
        assert rec.shape == x.shape
        err = np.abs(rec - x).mean()
        assert err < tol, f"bits={bits}: err {err}"


def test_sq_meanstd(rng):
    x = rng.normal(size=(8, 100)).astype(np.float32)
    sq = SQCodec(bits=8, mode="meanstd", alpha=2.0)
    sq.train(jnp.asarray(x))
    rec = np.asarray(sq.decode(sq.encode(jnp.asarray(x))))
    assert np.abs(rec - x).mean() < 0.2


def test_pca(rng):
    basis = rng.normal(size=(4, 32)).astype(np.float32)
    z = rng.normal(size=(500, 4)).astype(np.float32)
    x = (z @ basis + 0.01 * rng.normal(size=(500, 32))).astype(np.float32).T
    pca = PCA(n_components=4)
    pca.train(jnp.asarray(x))
    y = pca.encode(jnp.asarray(x))
    assert y.shape == (4, 500)
    rec = np.asarray(pca.decode(y))
    assert ((rec - x) ** 2).mean() < 1e-3


def test_opq_beats_or_matches_pq(rng):
    # correlated dims across subvector boundaries: rotation should help
    d, n = 16, 800
    z = rng.normal(size=(n, d)).astype(np.float32)
    mix = rng.normal(size=(d, d)).astype(np.float32)
    x = (z @ mix).astype(np.float32).T
    pq = PQCodec(d_vector=d, n_subvectors=4, max_iter=10)
    pq.train(jnp.asarray(x))
    pq_err = ((np.asarray(pq.decode(pq.encode(jnp.asarray(x)))) - x) ** 2).mean()
    opq = OPQ(d_vector=d, n_subvectors=4, n_iter=4, pq_max_iter=10)
    opq.train(jnp.asarray(x))
    opq_err = ((np.asarray(opq.decode(opq.encode(jnp.asarray(x)))) - x) ** 2).mean()
    assert opq_err < pq_err * 1.1


def test_codec_save_load(tmp_path, rng):
    x = rng.normal(size=(16, 300)).astype(np.float32)
    pq = PQCodec(d_vector=16, n_subvectors=4)
    pq.train(jnp.asarray(x))
    code_before = np.asarray(pq.encode(jnp.asarray(x)))
    path = str(tmp_path / "pq.npz")
    pq.save(path)
    pq2 = PQCodec(d_vector=16, n_subvectors=4)
    pq2.load(path)
    assert pq2.is_trained
    np.testing.assert_array_equal(
        np.asarray(pq2.encode(jnp.asarray(x))), code_before)


def test_pq4bit_codec(rng):
    """4-bit PQ (16 clusters/subquantizer) — reference's ivfpq4 variant
    (kernels/cuda/ivfpq4_top1_v1.cu, K=16 LUT, two codes per byte)."""
    import jax.numpy as jnp
    d, n, m = 32, 500, 8
    x = rng.normal(size=(d, n)).astype(np.float32)
    pq = PQCodec(d_vector=d, n_subvectors=m, n_clusters=16)
    pq.train(jnp.asarray(x))
    code = pq.encode(jnp.asarray(x))
    assert int(np.asarray(code).max()) < 16
    rec = np.asarray(pq.decode(code))
    assert ((rec - x) ** 2).mean() < (x ** 2).mean()
    # nibble packing round trip
    from torchpq_tpu.codec.pq import pack_nibbles, unpack_nibbles
    packed = pack_nibbles(code)
    assert packed.shape == (m // 2, n)
    np.testing.assert_array_equal(np.asarray(unpack_nibbles(packed)),
                                  np.asarray(code))


def test_anisotropic_recall_gain(rng):
    """Score-aware (anisotropic) PQ, Guo et al. 2020: weighting the
    parallel residual by eta > 1 must (a) actually change assignments and
    the codebook, (b) raise recall@k for inner-product retrieval at equal
    code budget vs plain reconstruction-loss PQ."""
    n, d, m, nq, k = 6000, 32, 8, 128, 10
    # MIPS-shaped data: clustered directions with a norm spread, queries
    # drawn near data directions (inner-product winners mix norm + angle)
    centers = rng.standard_normal((24, d)).astype(np.float32)
    lab = rng.integers(0, 24, size=n)
    x = centers[lab] + 0.35 * rng.standard_normal((n, d)).astype(np.float32)
    x *= (0.5 + rng.random((n, 1))).astype(np.float32) ** 2
    q = centers[rng.integers(0, 24, size=nq)] + 0.35 * rng.standard_normal(
        (nq, d)).astype(np.float32)
    gt = np.argsort(-(q @ x.T), axis=1)[:, :k]

    def recall(eta):
        codec = PQCodec(d_vector=d, n_subvectors=m, distance="inner",
                        anisotropic_eta=eta, seed=3)
        codec.train(jnp.asarray(x.T))
        codes = np.asarray(codec.encode_nd(jnp.asarray(x)))
        dec = np.asarray(codec.decode_nd(jnp.asarray(codes)))
        pred = np.argsort(-(q @ dec.T), axis=1)[:, :k]
        return np.mean([len(set(pred[i]) & set(gt[i])) / k
                        for i in range(nq)]), codes

    r_plain, codes_plain = recall(None)
    r_aniso, codes_aniso = recall(4.0)
    assert (codes_plain != codes_aniso).any(), "eta must change assignments"
    assert r_aniso > r_plain, (r_aniso, r_plain)
