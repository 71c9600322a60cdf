"""Global configuration for torchpq_tpu.

The reference exposes per-object tunables (use_tensor_core, fp16_scale_mode —
torchpq/index/IVFPQIndex.py:98-122) to opt into low-precision tensor-core
matmuls. The TPU analogue is matmul precision control: float32 inputs on the
MXU can run as a single bfloat16 pass (fast, ~8 mantissa bits) or as multi-pass
"float32-ish" accumulation. We keep one global default plus per-call overrides.
"""

import jax

# Precision used for *training* math (k-means, PQ codebooks, PCA): exact.
TRAIN_PRECISION = jax.lax.Precision.HIGHEST

# Precision used for *search* scoring: fast bf16 passes by default; recall
# impact is validated in bench (scores use f32 accumulation regardless).
SEARCH_PRECISION = jax.lax.Precision.DEFAULT

# dtype of the decoded-vector scan cache kept by IVFPQIndex.
SCAN_CACHE_DTYPE = "bfloat16"

# Default chunk sizes (elements) used to bound intermediate buffers.
MAX_SIM_CHUNK_ELEMS = 1 << 26  # ~64M f32 elems = 256 MiB score chunks

# approx_max_k recall target for COARSE cell selection. 0.99 was measured
# 3-9x slower than the 0.95 default at the 1M bench shape ([10k, 4096]
# scores: 25.9 ms vs ~3 ms at n_probe=32) for <0.2% end recall difference —
# a missed 33rd-best cell rarely holds a true neighbor, and smart probing
# already masks the probe tail. Raise it for tiny n_probe if needed.
COARSE_RECALL_TARGET = 0.95


def set_search_precision(p):
    global SEARCH_PRECISION
    SEARCH_PRECISION = p


def set_train_precision(p):
    global TRAIN_PRECISION
    TRAIN_PRECISION = p


# Force Pallas kernels to interpreter mode (CPU test runs — compiled Mosaic
# kernels only exist on TPU). Read at trace time; set it before any scan is
# traced (tests/conftest.py does).
PALLAS_INTERPRET = False

# code-domain scans fetch candidate windows by row-GATHER instead of
# dynamic_slice once the codes array exceeds this: XLA's layout assignment
# re-lays a multi-GB u8 dynamic_slice operand into a lane-padded tile (a
# 2x whole-array copy that OOMs the 100M single-chip demo); gather
# operands keep their layout. Tests lower it to cover the gather path.
CODES_GATHER_BYTES = 1 << 31


def enable_persistent_cache(path="~/.cache/torchpq_tpu_jax",
                            min_compile_secs=1.0):
    """Point JAX's persistent compilation cache at a shared directory.

    Called at package import: TPU compiles here run 15-60 s per program
    over the tunnel, and a cold out-of-box index build pays ~15-30 of
    them — the cache turns every later process's build from minutes into
    seconds (reference cold-build parity, BASELINE.md). jax.config.update
    only sets flags (no backend init), and the min-compile-time floor
    keeps fast CPU test compiles from churning the directory.

    ORDER CONTRACT (ADVICE r4 #3): sessions that force the CPU backend
    must do so BEFORE importing torchpq_tpu (tests/conftest.py does), or
    call `disable_persistent_cache()` right after the late
    `jax.config.update("jax_platforms", "cpu")` — XLA:CPU cache entries
    are AOT-compiled for one host's exact machine features, and loading
    them on another host risks SIGILL.
    """
    import os
    d = os.path.expanduser(path)
    try:
        # sessions explicitly pinned to CPU (tests, virtual meshes) opt
        # out: CPU compiles are cheap anyway. (Reading the flag does NOT
        # initialize a backend.)
        if jax.config.jax_platforms == "cpu":
            return
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except (OSError, AttributeError):  # read-only fs / older jax: best effort
        pass


def disable_persistent_cache():
    """Undo enable_persistent_cache — REQUIRED after any post-import
    jax.config.update("jax_platforms", "cpu") (see the order contract in
    enable_persistent_cache's docstring)."""
    try:
        jax.config.update("jax_compilation_cache_dir", None)
    except (AttributeError, ValueError):
        pass


enable_persistent_cache()
