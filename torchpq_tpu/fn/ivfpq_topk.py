"""IVFPQ scan facade (reference counterpart: torchpq/fn/IVFPQTopk.py).

The reference facade owns tpb-256/512/1024 instances of the fused CUDA scan
kernel and dispatches on k buckets (fn/IVFPQTopk.py:15-228). Here the
underlying machines are the two XLA scan strategies in ops/adc.py; dispatch is
on query-batch size (query-major gather scan for small batches, cell-major
grouped-matmul scan for throughput batches) with explicit overrides.
"""

from ..ops import adc


class IVFPQTopk:
    def __init__(self, n_cells, mode="auto", batch_threshold=256,
                 p_tile=128, approx=False):
        # "flat" is handled by IVFPQIndex.search (no probe lists); with
        # explicit cells (topk below) it degrades to the cell-major scan
        assert mode in ("auto", "query_major", "cell_major", "flat")
        self.n_cells = n_cells
        self.mode = mode
        self.batch_threshold = batch_threshold
        self.p_tile = p_tile
        self.approx = approx

    def topk(self, query, cells, probe_mask, decoded, norms, is_empty,
             cell_start, cell_capacity, *, k, distance, s_max, scales=None,
             mode=None, approx=None, impl="xla", group=1, precision=None,
             pq_codebook=None, probe_cap=None, m=None):
        """Returns (values [nq, k] f32, addresses [nq, k] i32; -1 padding).
        mode/approx default to the instance settings; impl/group/precision
        pass through to the cell-major scan. When `decoded` is the raw uint8
        codes (scan_cache_dtype='none'), pass `pq_codebook` to route through
        the code-domain scan (`m` = per-slot code width when the codes are
        in the packed-at-ingest [cap/g, g*m] layout)."""
        nq = query.shape[0]
        mode = mode or self.mode
        assert mode in ("auto", "query_major", "cell_major", "flat"), mode
        approx = self.approx if approx is None else approx
        if pq_codebook is not None:
            from ..ops.onehot_adc import scan_cell_major_codes
            return scan_cell_major_codes(
                query, cells, probe_mask, decoded, norms, is_empty,
                cell_start, cell_capacity, pq_codebook, k=k,
                distance=distance, s_max=s_max, n_cells=self.n_cells,
                p_tile=self.p_tile, approx=approx, precision=precision,
                m=m, impl=impl)
        if mode in ("auto", "flat"):
            mode = "query_major" if nq < self.batch_threshold else "cell_major"
        if scales is not None:
            mode = "cell_major"  # int8 cache path
        if mode == "query_major":
            return adc.scan_query_major(
                query, cells, probe_mask, decoded, norms, is_empty,
                cell_start, cell_capacity, k=k, distance=distance,
                s_max=s_max, approx=approx, precision=precision)
        return adc.scan_cell_major(
            query, cells, probe_mask, decoded, norms, is_empty,
            cell_start, cell_capacity, k=k, distance=distance, s_max=s_max,
            n_cells=self.n_cells, p_tile=self.p_tile, approx=approx,
            scales=scales, impl=impl, group=group, precision=precision,
            probe_cap=probe_cap)
