"""torchpq_tpu — a TPU-native ANN / MIPS framework (IVF + Product Quantization).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of DeMoriarty/TorchPQ
(reference: /root/reference). Same capability contract — IVFPQ indexes, k-means
family, PQ/VQ/SQ codecs, dynamic containers, exact flat search — but architected
for TPU hardware:

  * ADC scoring runs on the MXU as matmuls against a PQ-decoded bf16 cache plus
    precomputed norms (mathematically identical to LUT-based ADC; see
    ``torchpq_tpu/ops/adc.py``) instead of emulating CUDA shared-memory LUT
    gathers (reference ``torchpq/kernels/cuda/ivfpq_topk.cu``).
  * All state is pytrees of arrays; compute is pure jitted functions with static
    shapes; growth is bounded power-of-two reallocation (reference
    ``torchpq/container/CellContainer.py:249`` expand-splice equivalent).
  * Multi-chip scaling is first-class: IVF cells shard over a
    ``jax.sharding.Mesh``; codebooks replicate; local scans merge with an
    all-gather top-k (the reference is single-GPU; see SURVEY.md §2.7/§5.8).

Layout convention: the public API accepts the reference's ``[d_vector, n_data]``
(feature-major) tensors (reference README.md:51); everything internal is
row-major ``[n, d]`` padded to TPU lane multiples.
"""

from . import config
from . import util
from . import metric
from . import fn
from . import ops
from . import clustering
from . import codec
from . import container
from . import index
from . import transform
from . import parallel
from . import legacy
from . import native
from . import profiling

from .fn import Topk
from .module import StateModule

# Reference parity: `torchpq.CustomModule` (torchpq/__init__.py:19) — the
# stateful-shell base class; here it's StateModule, aliased for drop-ins.
CustomModule = StateModule

# Reference parity: `torchpq.topk` module-level singleton (torchpq/__init__.py:22).
topk = Topk()

__version__ = "0.1.0"
