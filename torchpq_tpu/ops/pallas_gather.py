"""Pallas TPU kernel: row gather from a small (VMEM-resident) table.

XLA's generic gather on TPU runs at ~1 GB/s; for the scan's query-tile
gather (rows from a [nq, d] table that easily fits VMEM) a Pallas kernel
keeps the whole table on-chip and copies rows with dynamic sublane reads.
STATUS: kept as a measured experiment (like ops/pallas_flat.py), not wired
into production — the cell-major scan's Pallas path gathers query rows
inside its own kernel (ops/pallas_scan.py) and the XLA path's plain
row-gather measured fast enough; unit tests keep this kernel honest.

Reference counterpart: none — the reference's CUDA kernels read queries
directly from global memory per thread-block (ivfpq_topk.cu); gathers are
free on GPUs and this kernel exists purely because of TPU memory semantics.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import util

# table must fit in VMEM alongside a couple of row tiles
_VMEM_TABLE_BYTES = 8 * 1024 * 1024


def _gather_kernel(idx_ref, table_ref, out_ref, *, tile, n_rows):
    def body(i, _):
        row = jnp.clip(idx_ref[i], 0, n_rows - 1)
        out_ref[i, :] = table_ref[row, :]
        return 0

    jax.lax.fori_loop(0, tile, body, 0)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def gather_rows(table, idx, *, tile=1024, interpret=False):
    """out[i] = table[idx[i]]; idx values are clipped into range.

    table: [n, d] (d padded to the lane width by the caller for best speed);
    idx: [m] int32. Requires n * d * itemsize <= ~8 MiB.
    """
    n, d = table.shape
    if table.dtype.itemsize == 2 and d % 2 == 0:
        # Mosaic can't express single-sublane dynamic row writes for 16-bit
        # dtypes; gather as uint32 pairs and bitcast back.
        packed = jax.lax.bitcast_convert_type(
            table.reshape(n, d // 2, 2), jnp.uint32)
        out = gather_rows(packed, idx, tile=tile, interpret=interpret)
        return jax.lax.bitcast_convert_type(
            out, table.dtype).reshape(-1, d)
    m = idx.shape[0]
    m_pad = util.round_up(max(m, 1), tile)
    idx_pad = jnp.zeros((m_pad,), jnp.int32).at[:m].set(idx.astype(jnp.int32))

    out = pl.pallas_call(
        functools.partial(_gather_kernel, tile=tile, n_rows=n),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), table.dtype),
        grid=(m_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda g: (g,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx_pad, table)
    return out[:m]


def gather_rows_fits(table):
    return (table.size * table.dtype.itemsize) <= _VMEM_TABLE_BYTES
