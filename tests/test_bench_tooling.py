"""Smoke tests for the benchmark tooling (sweep + plot) at tiny scale.

The reference validated its search quality through its benchmark harness
rather than unit tests (SURVEY.md §4); ours is tested so the recorded
sweeps can't bitrot. Runs in-process on the CPU backend (conftest pins
jax_platforms=cpu before anything imports jax).
"""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def sweep_json():
    # the GT cache is keyed by dataset identity (incl. d); still remove it
    # so the fixture never trusts a file from an earlier revision
    gt = "/tmp/gt_sweep_synth_d32_euclidean_2000_64_10.npy"
    if os.path.exists(gt):
        os.remove(gt)
    sweep = _load(os.path.join(REPO, "benchmark", "sweep.py"), "_sweep_smoke")
    argv = sys.argv
    sys.argv = ["sweep.py", "--n-base", "2000", "--n-query", "64",
                "--d", "32", "--n-cells", "64", "--n-subvectors", "8",
                "--n-probes", "1", "4", "--ks", "10", "--repeats", "1",
                "--name", "smoke"]
    try:
        sweep.main()
    finally:
        sys.argv = argv
    path = os.path.join(REPO, "benchmark", "results", "ivf64_pq8_smoke.json")
    yield path
    for p in (path, gt):
        if os.path.exists(p):
            os.remove(p)


def test_sweep_records_probing_curve_and_flat(sweep_json):
    with open(sweep_json) as f:
        out = json.load(f)
    assert out["n_base"] == 2000 and out["d"] == 32
    by_probe = {e["n_probe"]: e for e in out["entries"]}
    assert set(by_probe) == {1, 4, "flat"}
    for e in out["entries"]:
        assert e["qps"] > 0
    # flat sweep is the ADC ceiling: no probing point may beat it
    # (tolerance for the approx-top-k epilogue)
    assert by_probe["flat"]["recall@10"] >= by_probe[1]["recall@10"] - 0.02
    assert by_probe[4]["recall@10"] >= by_probe[1]["recall@10"] - 0.02
    assert by_probe["flat"]["recall@10"] > 0.2


def test_sweep_pq4_nospill_code_domain(sweep_json):
    """The round-2 sweep knobs compose: 4-bit packed PQ + reference add
    semantics (--no-spill) + the codes-only scan cache, in one run."""
    sweep = _load(os.path.join(REPO, "benchmark", "sweep.py"), "_sweep_pq4")
    argv = sys.argv
    sys.argv = ["sweep.py", "--n-base", "2000", "--n-query", "64",
                "--d", "32", "--n-cells", "64", "--n-subvectors", "8",
                "--n-probes", "1", "4", "--ks", "10", "--repeats", "1",
                "--n-bits", "4", "--no-spill", "--cache", "none",
                "--name", "smoke4"]
    try:
        sweep.main()
    finally:
        sys.argv = argv
    path = os.path.join(REPO, "benchmark", "results", "ivf64_pq8_smoke4.json")
    try:
        with open(path) as f:
            out = json.load(f)
        assert out["n_bits"] == 4 and out["spill"] is False
        assert out["cache"] == "none"
        by_probe = {e["n_probe"]: e for e in out["entries"]}
        assert by_probe["flat"]["recall@10"] > 0.1  # 32-bit codes: lossy
        for e in out["entries"]:
            assert e["qps"] > 0
    finally:
        if os.path.exists(path):
            os.remove(path)


def test_plot_renders_from_sweep_json(sweep_json, tmp_path):
    plot = _load(os.path.join(REPO, "benchmark", "plot.py"), "_plot_smoke")
    results = plot.load_results(os.path.dirname(sweep_json), "smoke")
    assert len(results) == 1
    out = tmp_path / "recall10.png"
    assert plot.plot_k(results, 10, str(out))
    assert out.stat().st_size > 10_000  # a real rendered figure
    # k with no recorded entries -> nothing drawn, no file
    assert not plot.plot_k(results, 1, str(tmp_path / "recall1.png"))
