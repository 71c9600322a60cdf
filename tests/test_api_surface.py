"""Public API surface lock.

Every symbol PARITY.md / docs/MIGRATION.md promise must exist with the
documented name — this test turns doc rot into a test failure. Mirrors
the reference's import surface (torchpq/__init__.py re-exports)."""

import importlib

import pytest

SURFACE = {
    "torchpq_tpu": [
        "topk", "Topk", "CustomModule", "StateModule", "metric", "util",
        "config", "fn", "ops", "clustering", "codec", "container", "index",
        "transform", "parallel", "legacy", "native", "profiling",
    ],
    "torchpq_tpu.index": ["FlatIndex", "IVFPQIndex", "IVFPQRIndex"],
    "torchpq_tpu.clustering": ["KMeans", "MultiKMeans", "MinibatchKMeans"],
    "torchpq_tpu.codec": ["BaseCodec", "VQCodec", "PQCodec", "SQCodec"],
    "torchpq_tpu.container": [
        "BaseContainer", "FlatContainer", "CellContainer",
        "FlatContainerGroup",
    ],
    "torchpq_tpu.transform": ["PCA", "OPQ"],
    "torchpq_tpu.fn": ["Topk", "IVFPQTopk"],
    "torchpq_tpu.parallel": [
        "get_mesh", "device_count", "ShardedIVFPQSearcher",
        "data_parallel_lloyd_step", "data_parallel_kmeans_fit",
    ],
    "torchpq_tpu.legacy": [
        "IVFPQ", "IVFPQR", "PQ", "SQ", "IVFPQTopk", "KMeansOld",
        "MultiKMeansOld",
    ],
    "torchpq_tpu.native": [
        "read_fvecs", "read_bvecs", "read_ivecs", "stream_vecs",
        "spill_assign",
    ],
    "torchpq_tpu.ops.adc": [
        "build_adc_table", "adc_lookup_scores", "scan_query_major",
        "scan_cell_major",
    ],
    "torchpq_tpu.ops.flat_adc": ["flat_adc_scan", "flat_adc_auto"],
    "torchpq_tpu.ops.max_sim": [
        "max_sim", "topk_sim", "batched_max_sim", "batched_topk_sim",
    ],
    "torchpq_tpu.ops.bmm": ["bmm", "min_bmm", "topk_bmm", "masked_bmm"],
    "torchpq_tpu.metric": [
        "similarity", "cosine_similarity", "negative_squared_l2_distance",
        "canonical_distance",
    ],
}

METHODS = {
    "torchpq_tpu.index.IVFPQIndex": [
        "train", "add", "remove", "search", "search_cells", "encode",
        "decode", "save", "load", "state_dict", "load_state_dict",
        "similarity_at_address", "similarity_at_id", "get_id_by_address",
        "get_address_by_id",
    ],
    "torchpq_tpu.clustering.KMeans": ["fit", "predict", "topk"],
    "torchpq_tpu.clustering.MinibatchKMeans": ["fit_minibatch", "predict"],
    "torchpq_tpu.codec.PQCodec": [
        "train", "encode", "decode", "precompute_adc",
    ],
    "torchpq_tpu.transform.OPQ": ["train", "encode", "decode", "rotate"],
    "torchpq_tpu.parallel.ShardedIVFPQSearcher": ["search", "add", "remove"],
}


@pytest.mark.parametrize("module", sorted(SURFACE))
def test_module_exports(module):
    mod = importlib.import_module(module)
    missing = [s for s in SURFACE[module] if not hasattr(mod, s)]
    assert not missing, f"{module} missing {missing}"


@pytest.mark.parametrize("qualname", sorted(METHODS))
def test_class_methods(qualname):
    mod_name, cls_name = qualname.rsplit(".", 1)
    cls = getattr(importlib.import_module(mod_name), cls_name)
    missing = [m for m in METHODS[qualname] if not hasattr(cls, m)]
    assert not missing, f"{qualname} missing {missing}"
