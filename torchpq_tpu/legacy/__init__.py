"""Legacy (v1) API adapters.

Reference counterpart: torchpq/legacy/ — the library's first-generation API
(IVFPQ, IVFPQR, PQ, SQ, IVFPQTopk) kept for backwards compatibility
(SURVEY.md §2.8). Here they are thin adapters over the current components so
v1 call sites keep working: v1 names (n_cq_clusters, blocksize, topk,
input_ids, remove_ids) map onto IVFPQIndex / PQCodec / SQCodec.

The v1 extras the v2 reference dropped — similarity_at_address /
similarity_at_id rescoring (legacy/IVFPQ.py:253-311) and the optional
CPU-RAM tier via an SQ `cpu_quantizer` (legacy/IVFPQBase.py:55-58) — are
kept: rescoring lives on IVFPQIndex itself; the CPU-RAM tier stores
SQ-compressed originals host-side for reconstruction.
"""

from .ivfpq import IVFPQ, IVFPQR
from .pq import PQ
from .sq import SQ
from .ivfpq_topk import IVFPQTopk

# previous-generation clustering names kept by the reference "for reference"
# (torchpq/clustering/KMeansOld.py, MultiKMeansOld.py — same API, older
# internals there; here they alias the current implementations)
from ..clustering import KMeans as KMeansOld
from ..clustering import MultiKMeans as MultiKMeansOld
