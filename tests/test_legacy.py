import numpy as np
import jax.numpy as jnp

from torchpq_tpu.legacy import IVFPQ, IVFPQR, PQ, SQ, IVFPQTopk


def test_legacy_ivfpq_end_to_end(rng):
    d, n = 16, 600
    x = rng.normal(size=(d, n)).astype(np.float32)
    index = IVFPQ(d_vector=d, n_subvectors=4, n_cq_clusters=8, blocksize=128,
                  scan_cache_dtype="float32")
    index.train(jnp.asarray(x))
    ids = np.asarray(index.add(jnp.asarray(x)))
    index.n_probe = 8
    vals, got = index.topk(jnp.asarray(x[:, :30]), k=1)
    hit = (np.asarray(got)[:, 0] == ids[:30]).mean()
    assert hit > 0.9
    sims = index.similarity_at_id(jnp.asarray(x[:, :5]), ids[:5])
    assert sims.shape == (5, 5)
    index.remove(ids[:10])
    assert index.n_items == n - 10


def test_legacy_cpu_ram_tier(rng):
    d, n = 8, 200
    x = rng.normal(size=(d, n)).astype(np.float32)
    index = IVFPQ(d_vector=d, n_subvectors=4, n_cq_clusters=4,
                  blocksize=128, cpu_quantizer=SQ(bits=8),
                  scan_cache_dtype="float32")
    index.train(jnp.asarray(x))
    ids = np.asarray(index.add(jnp.asarray(x)))
    rec = np.asarray(index.reconstruct_from_cpu_ram(ids[:7]))
    assert rec.shape == (d, 7)
    assert np.abs(rec - x[:, :7]).mean() < 0.05


def test_legacy_pq_sq(rng):
    x = rng.normal(size=(16, 300)).astype(np.float32)
    pq = PQ(d_vector=16, n_subvectors=4)
    pq.train(jnp.asarray(x))
    code = pq.encode(jnp.asarray(x))
    assert code.shape == (4, 300)
    sq = SQ(bits=8)
    sq.train(jnp.asarray(x))
    assert np.abs(np.asarray(sq.decode(sq.encode(jnp.asarray(x)))) - x).mean() < 0.05


def test_legacy_ivfpq_topk_scores(rng):
    from torchpq_tpu.codec import PQCodec
    d, n, nq = 16, 200, 5
    x = rng.normal(size=(d, n)).astype(np.float32)
    pq = PQCodec(d_vector=d, n_subvectors=4)
    pq.train(jnp.asarray(x))
    codes = pq.encode_nd(jnp.asarray(x.T))
    q = jnp.asarray(rng.normal(size=(nq, d)).astype(np.float32))
    s = IVFPQTopk.scores(q, pq.codebook_internal, codes)
    assert s.shape == (nq, n)
    vals, idx = IVFPQTopk.topk(q, pq.codebook_internal, codes, k=3)
    assert vals.shape == (nq, 3)


def test_legacy_ivfpqr(rng):
    d, n = 16, 500
    x = rng.normal(size=(d, n)).astype(np.float32)
    index = IVFPQR(d_vector=d, n_subvectors=2, n_subq=8, n_cq_clusters=4,
                   blocksize=256, scan_cache_dtype="float32")
    index.train(jnp.asarray(x))
    ids = np.asarray(index.add(jnp.asarray(x)))
    index.n_probe = 4
    vals, got = index.topk(jnp.asarray(x[:, :20]), k=1)
    assert (np.asarray(got)[:, 0] == ids[:20]).mean() > 0.85
