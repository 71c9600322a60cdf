"""Pin the auto query planner's crossovers (IVFPQIndex.plan_scan_mode).

Every headline benchmark number depends on which physical plan actually ran
(probed cell-major scan vs dense flat sweep) — a silent change to the
128x/512x crossovers would re-label flat QPS as probed QPS. The planner
reads only host-side shadows (n_items, cell capacities), so these tests
fake the 1M bench scale on a tiny untrained index.

Reference counterpart: torchpq's n_probe semantics (IVFPQIndex.py) — an
accuracy knob; the planner may substitute a plan that is at least as fast
AND at least as accurate, never worse.
"""

import numpy as np
import pytest

from torchpq_tpu.index import IVFPQIndex


def _fake_scale(index, *, n_items, s_max, n_cells=None):
    """Simulate a large index's host shadows (the planner's only inputs)."""
    index._n_items = n_items
    n = n_cells if n_cells is not None else index.n_cells
    index._cell_capacity_np = np.full(n, s_max, np.int64)
    return index


def _make(d=32, **kw):
    kw.setdefault("n_subvectors", 8)
    kw.setdefault("n_cells", 64)
    kw.setdefault("initial_size", 16)
    return IVFPQIndex(d_vector=d, **kw)


BIG_NQ = 10_000  # >= batch_threshold, the bench regime


def test_pinned_mode_passes_through():
    index = _fake_scale(_make(), n_items=1_000_000, s_max=1024)
    index.use_approx_topk = True
    for mode in ("flat", "cell_major", "query_major"):
        index.scan_mode = mode
        assert index.plan_scan_mode(BIG_NQ, 10) == mode


def test_small_batch_routes_query_major():
    index = _fake_scale(_make(), n_items=500_000_000, s_max=1024)
    index.scan_mode = "auto"
    index.n_probe = 8
    index.use_approx_topk = True
    nq = index._ivfpq_topk.batch_threshold - 1
    assert index.plan_scan_mode(nq, 10) == "query_major"
    assert index.plan_scan_mode(nq + 1, 10) == "cell_major"


def test_flat_crossover_k_le_32_is_128x():
    """k<=32 + approx epilogue: flat once touched slots * 128 >= live.
    At the 1M bench shape (IVF4096, s_max=1024) np=32 touches 32768 slots
    -> 128x covers 4.19M, so 1M routes flat; np=1 (131k coverage) probes."""
    index = _fake_scale(_make(), n_items=1_000_000, s_max=1024)
    index.scan_mode = "auto"
    index.use_approx_topk = True
    index.n_probe = 32
    assert index.plan_scan_mode(BIG_NQ, 10) == "flat"
    index.n_probe = 1
    assert index.plan_scan_mode(BIG_NQ, 10) == "cell_major"
    # exactly at the boundary: touched * 128 == n_live -> flat
    _fake_scale(index, n_items=1024 * 128, s_max=1024)
    assert index.plan_scan_mode(BIG_NQ, 10) == "flat"
    _fake_scale(index, n_items=1024 * 128 + 1, s_max=1024)
    assert index.plan_scan_mode(BIG_NQ, 10) == "cell_major"


def test_flat_crossover_k_le_32_needs_approx():
    """The 128x model prices the approx epilogue; exact top-k never
    reroutes at k<=32."""
    index = _fake_scale(_make(), n_items=1_000_000, s_max=1024)
    index.scan_mode = "auto"
    index.use_approx_topk = False
    index.n_probe = 32
    assert index.plan_scan_mode(BIG_NQ, 10) == "cell_major"


def test_flat_crossover_k_gt_32_is_512x():
    """k>32 takes the exact multi-chunk flat epilogue (512x crossover):
    at 1M, np=1 (s_max=1024) covers 524k < 1M -> probes; np=2 -> flat."""
    index = _fake_scale(_make(), n_items=1_000_000, s_max=1024)
    index.scan_mode = "auto"
    index.use_approx_topk = True
    index.n_probe = 2
    assert index.plan_scan_mode(BIG_NQ, 100) == "flat"
    index.n_probe = 1
    assert index.plan_scan_mode(BIG_NQ, 100) == "cell_major"


def test_high_d_uses_128x_even_at_deep_k():
    """d>=512: the IVF scan's query-tile gather dominates, so deep k still
    takes the 128x crossover (measured d=960 k=100: IVF 342 q/s vs flat
    39.9k at better recall)."""
    index = _fake_scale(_make(d=512), n_items=1_000_000, s_max=1024)
    index.scan_mode = "auto"
    index.use_approx_topk = True
    index.n_probe = 32
    assert index.plan_scan_mode(BIG_NQ, 100) == "flat"


def test_code_domain_crossover_two_regimes():
    """scan_cache_dtype='none': the probed codes scan vs the
    decode-on-the-fly flat sweep. With the Pallas codes kernel eligible
    (packed storage, decode matrix fits VMEM) probing pays from ~12x
    pruning (r4: np=32 43.3k q/s vs flat 23.0k); on the XLA one-hot
    fallback probing needs ~512x (r3: np=32 3.6k vs flat 23k)."""
    # d=128: the kernel's real eligibility needs a lane-aligned decode
    # width (the 1M bench shape); d=32 would now correctly be ineligible
    index = _fake_scale(_make(d=128, n_subvectors=16,
                              scan_cache_dtype="none"),
                        n_items=1_000_000, s_max=1024)
    assert index._codes_kernel_eligible()
    index.scan_mode = "auto"
    index.use_approx_topk = True
    index.n_probe = 64   # touched 64*1024*12 = 786k < 1M: probing pays
    assert index.plan_scan_mode(BIG_NQ, 10) == "cell_major"
    _fake_scale(index, n_items=1_000_000, s_max=2048)
    index.n_probe = 64   # 64*2048*12 = 1.57M >= 1M: flat wins
    assert index.plan_scan_mode(BIG_NQ, 10) == "flat"
    _fake_scale(index, n_items=1_000_000, s_max=1024)

    # XLA-fallback regime: manhattan fails the kernel gate -> 512x rule
    ix2 = _fake_scale(_make(scan_cache_dtype="none", distance="manhattan"),
                      n_items=1_000_000, s_max=1024)
    assert not ix2._codes_kernel_eligible()
    ix2.scan_mode = "auto"
    ix2.use_approx_topk = True
    ix2.n_probe = 2
    assert ix2.plan_scan_mode(BIG_NQ, 10) == "flat"
    ix2.n_probe = 1
    assert ix2.plan_scan_mode(BIG_NQ, 10) == "cell_major"
    # huge-index regime (the 100M demo): probing pays in both regimes
    _fake_scale(index, n_items=100_000_000, s_max=2048)
    index.n_probe = 32
    assert index.plan_scan_mode(BIG_NQ, 10) == "cell_major"


def test_1m_bench_shape_probed_rows_need_pinning():
    """The recorded probed curve exists only because sweep.py pins
    scan_mode='cell_major'; auto reroutes every np at the 1M bench shape.
    This pins the fact the bench's honesty depends on."""
    index = _fake_scale(_make(), n_items=1_000_000, s_max=1024)
    index.scan_mode = "auto"
    index.use_approx_topk = True
    for np_ in (8, 32, 64):
        index.n_probe = np_
        assert index.plan_scan_mode(BIG_NQ, 10) == "flat"


def test_scan_gate_stable_across_n_probe_axis(rng):
    """The resolved scan impl must not flip along the n_probe axis of a
    sweep: the r3 class sweep's np=4/k=100 point silently ran XLA at 2.4x
    the latency because the default k_pair (4*ceil(k/np)) crossed the
    Pallas gate's 64 ceiling at small n_probe. The k_pair policy now caps
    at 64 (measured recall-flat 64 -> 100); this pins the invariant."""
    import jax.numpy as jnp
    from torchpq_tpu.index.ivfpq import _coarse_probe
    from torchpq_tpu.ops import adc
    d = 32
    x = rng.normal(size=(3000, d)).astype(np.float32)
    index = IVFPQIndex(d_vector=d, n_subvectors=8, n_cells=8,
                       scan_cache_dtype="float32", initial_size=64)
    index.train(jnp.asarray(x.T))
    index.add(jnp.asarray(x.T))
    q = jnp.asarray(rng.normal(size=(8, d)).astype(np.float32))
    impls = {}
    for n_probe in (1, 2, 4, 8):
        _, cells, mask = _coarse_probe(
            q, index.vq_codec.kmeans._centroids[0], jnp.float32(30.0),
            n_probe=n_probe, use_smart=False, precision=None)
        adc.scan_cell_major(
            q, cells, mask, index.aux("decoded"), index.aux("norm")[:, 0],
            index._is_empty, index._cell_start, index._cell_capacity,
            k=100, distance="euclidean", s_max=index.max_cell_capacity,
            n_cells=8, approx=True, impl="auto", interpret=True)
        impls[n_probe] = (adc.LAST_GATE["impl"], adc.LAST_GATE["k_pair"])
    # n_probe=1 is the deliberate exception: the completeness floor
    # (ADVICE r4 #2) lifts k_pair to k=100 there so the search can
    # return k results at all — correctness beats gate stability.
    assert impls[1][1] == 100, impls
    stable = {np_: v for np_, v in impls.items() if np_ >= 2}
    assert all(v[1] <= 64 for v in stable.values()), impls
    assert len({v[0] for v in stable.values()}) == 1, \
        f"scan impl flips along the n_probe axis: {impls}"


def test_codes_gate_mirror_matches_dispatch():
    """ADVICE r4 #1: the planner's _codes_kernel_eligible must equal the
    dispatch's shape gate for every packed shape — in particular packed
    indexes with d_vector < 128 (d=32/64/96), where the kernel cannot run
    and the XLA one-hot fallback costs ~512x."""
    from torchpq_tpu.ops.pallas_codes_scan import codes_kernel_static_gate
    for d, m in ((32, 8), (64, 16), (96, 16), (128, 64), (128, 16)):
        ix = IVFPQIndex(d_vector=d, n_subvectors=m, n_cells=8,
                        scan_cache_dtype="none", initial_size=64)
        if ix.pack_group <= 1:
            continue
        expect = codes_kernel_static_gate(m, ix.pack_group, d, "euclidean")
        assert ix._codes_kernel_eligible() == expect, (d, m)
        # and the concrete regression: sub-128 d_vector is NOT eligible
        if d < 128:
            assert not ix._codes_kernel_eligible(), (d, m)
