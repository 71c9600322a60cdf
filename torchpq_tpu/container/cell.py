"""Cell (inverted-list) dynamic store.

Reference counterpart: torchpq/container/CellContainer.py — one flat buffer
partitioned into contiguous per-cell segments (`_cell_start`, `_cell_size`,
`_cell_capacity`, `_is_empty` bitmap, :46-80), with the add pipeline
unique-cells -> ioa -> expand-while-needed -> write-address -> scatter
(:313-367) and remove marking slots empty (the reference's remove guard is
inverted, :381-383 — implemented correctly here; SURVEY.md §2.6).

TPU-first replacements for the reference's CUDA helper kernels:
* get_ioa (rank within own cell among the batch, get_ioa.cu): a sort by cell
  plus searchsorted run-starts — O(B log B), fully jitted.
* get_write_address (ioa-th empty slot of the cell, get_write_address_v2.cu):
  one global prefix-sum over the is_empty bitmap + searchsorted — empty slots
  anywhere in the cell segment are found and reused, matching the reference's
  hole-reuse semantics without per-thread scans.
* expand (O(storage) torch.cat splice with per-cell .item() sync, :249-311):
  a single functional re-layout — new power-of-two per-cell capacities, new
  starts by cumsum, one gather to move every live slot. Bounded
  recompilation because all capacities are powers of two.

Aux row stores (decoded scan cache, rerank codes, ...) share the slot address
space and move in lockstep through add/remove/expand.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import util
from .base import BaseContainer, _aux_scatter


@functools.partial(jax.jit, static_argnames=("n_cells",))
def _device_bincount(cells, *, n_cells):
    return jnp.zeros((n_cells,), jnp.int32).at[cells].add(1, mode="drop")


@jax.jit
def _compute_ioa(cells, valid, n_cells_arr):
    """Rank of each batch item within its own cell — the reference's
    get_ioa kernel (get_ioa.cu); shared implementation in ops/spill.py."""
    from ..ops.spill import rank_in_group
    return rank_in_group(cells, valid, n_cells_arr.shape[0])


@jax.jit
def _find_write_addresses(is_empty, cell_start, cells, ioa, valid):
    """Address of the (ioa+1)-th empty slot at/after each cell's start —
    the reference's get_write_address kernel (get_write_address_v2.cu) as a
    global prefix-sum over the empty bitmap + searchsorted."""
    cap = is_empty.shape[0]
    empty_i32 = is_empty.astype(jnp.int32)
    inc = jnp.cumsum(empty_i32)             # empties in [0, i]
    excl = inc - empty_i32                  # empties in [0, i)
    start = cell_start[jnp.where(valid, cells, 0)]
    target = excl[start] + ioa + 1
    addr = jnp.searchsorted(inc, target, side="left").astype(jnp.int32)
    return jnp.where(valid, addr, cap)      # invalid -> dropped


def _packed_row_write(storage, addr, data, g):
    """Write each item's code bytes into the lane-packed [cap/g, g*m]
    storage at slot `addr` (addr == cap drops) via pair-RMW row scatter.

    A per-ELEMENT scatter here compiles an [b, m, 2] s32 index tensor
    whose 2-wide minor dim XLA lane-pads to 128 — a 32 GB transient at
    b=1M, m=64 (the r4 50M/100M demo failure). Rows are the TPU-correct
    write granularity: gather the [b, row] current rows (full-lane u8
    row gathers are layout-tax-free — ARCHITECTURE.md probe table),
    splice each item's bytes in registers, merge same-row edits (items
    are sorted by address, so the <= g items of one row are adjacent:
    ceil(log2(g)) doubling passes give the LAST item of each run the
    fully merged row), and scatter whole rows with a [b]-shaped index.
    The add path guarantees unique slots per batch (disjoint edits);
    duplicate addresses (possible via the public set_data_by_address)
    resolve LAST-wins — the merge only grafts lanes the later item does
    not already own (argsort is stable, so within one address batch
    order is preserved), matching the unpacked .at[].set batch-order
    semantics (ADVICE r4 #5).
    """
    b, m = data.shape
    n_rows = storage.shape[0]
    order = jnp.argsort(addr)
    a_s = addr[order].astype(jnp.int32)
    d_s = data[order]
    rr = a_s // g
    off = (a_s % g) * m
    lanes = jnp.arange(g * m, dtype=jnp.int32)[None, :]        # [1, g*m]
    mine = (lanes >= off[:, None]) & (lanes < (off + m)[:, None])
    rows = storage[jnp.clip(rr, 0, n_rows - 1)]                # [b, g*m]
    idx_in_code = jnp.clip(lanes - off[:, None], 0, m - 1)
    own = jnp.take_along_axis(d_s, idx_in_code, axis=1)
    new = jnp.where(mine, own, rows)
    cover = mine
    sh = 1
    # a same-row run is at most min(g, b) items long, and the shifted
    # slices below need sh < b to be well-formed (tiny batches, e.g. a
    # 3-item set_data_by_address on a g=16 layout)
    while sh < min(g, b):
        pad_r = jnp.full((sh,), -1, rr.dtype)
        same = (jnp.concatenate([pad_r, rr[:-sh]]) == rr)[:, None]
        prev_new = jnp.concatenate([new[:sh], new[:-sh]])
        prev_cover = jnp.concatenate(
            [jnp.zeros((sh, g * m), bool), cover[:-sh]])
        # ~cover: never overwrite lanes this (later) item already owns —
        # duplicate addresses resolve last-wins (disjoint edits unaffected)
        take = same & prev_cover & ~cover
        new = jnp.where(take, prev_new, new)
        cover = cover | take
        sh *= 2
    is_last = jnp.concatenate([rr[:-1] != rr[1:], jnp.ones((1,), bool)])
    tgt = jnp.where(is_last, rr, n_rows)      # non-last / invalid: dropped
    return storage.at[tgt].set(new, mode="drop")


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4),
                   static_argnames=("pack_g",))
def _cell_add(storage, address2id, id2address, is_empty, cell_size,
              cell_start, data, cells, ids, valid, *, pack_g=1):
    """Scatter a batch into its cells. cells: [b] i32, valid: [b] bool.

    pack_g > 1: storage is the lane-packed [cap/g, g*code_size] uint8 layout
    (see IVFPQIndex packed-at-ingest, ARCHITECTURE.md "layout wall") — items
    write through the pair-RMW row scatter (_packed_row_write), so ingest
    stays copy-free at any scale while the minor dim stays a full 128-lane
    tile for the scans."""
    cap = is_empty.shape[0]
    n_cells = cell_start.shape[0]
    ioa = _compute_ioa(cells, valid, cell_start)
    addr = _find_write_addresses(is_empty, cell_start, cells, ioa, valid)

    if pack_g > 1:
        storage = _packed_row_write(storage, addr, data, pack_g)
    else:
        storage = storage.at[addr].set(data, mode="drop")
    address2id = address2id.at[addr].set(ids, mode="drop")
    is_empty = is_empty.at[addr].set(False, mode="drop")
    id2address = id2address.at[
        jnp.where(valid, ids, id2address.shape[0])].set(
        addr, mode="drop")
    counts = jax.ops.segment_sum(
        valid.astype(jnp.int32), jnp.where(valid, cells, 0),
        num_segments=n_cells)
    cell_size = cell_size + counts
    return storage, address2id, id2address, is_empty, cell_size, addr


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _cell_remove(address2id, id2address, is_empty, cell_size, cell_start,
                 addrs, valid):
    """Mark slots empty and unmap ids; cells keep holes for reuse."""
    cap = is_empty.shape[0]
    n_cells = cell_start.shape[0]
    live = valid & ~is_empty[jnp.clip(addrs, 0, cap - 1)]
    tgt = jnp.where(live, addrs, cap)
    rm_ids = jnp.where(live, address2id[jnp.where(live, addrs, 0)], -1)
    address2id = address2id.at[tgt].set(-1, mode="drop")
    is_empty = is_empty.at[tgt].set(True, mode="drop")
    id2address = id2address.at[
        jnp.where(rm_ids >= 0, rm_ids, id2address.shape[0])].set(
        -1, mode="drop")
    # owning cell via searchsorted on the sorted cell_start array
    cell_of = (jnp.searchsorted(cell_start, addrs, side="right") - 1)
    counts = jax.ops.segment_sum(
        live.astype(jnp.int32),
        jnp.where(live, cell_of, 0).astype(jnp.int32),
        num_segments=n_cells)
    cell_size = cell_size - counts
    n_removed = jnp.sum(live.astype(jnp.int32))
    return address2id, id2address, is_empty, cell_size, n_removed, counts


@functools.partial(jax.jit, static_argnums=(4, 5))
def _relayout_gather(old_rows, old_start, old_cap_arr, new_start, new_cap_total,
                     fill_value):
    """Move every old slot to its position under new per-cell starts.

    Returns [new_cap_total, ...] rows. For each new slot j with cell c and
    offset o = j - new_start[c]: source = old_start[c] + o if o < old_cap[c]
    else a fill row.
    """
    n_cells = old_start.shape[0]
    j = jnp.arange(new_cap_total, dtype=jnp.int32)
    c = (jnp.searchsorted(new_start, j, side="right") - 1).astype(jnp.int32)
    o = j - new_start[c]
    in_old = o < old_cap_arr[c]
    src = jnp.where(in_old, old_start[c] + o, 0)
    rows = old_rows[src]
    if old_rows.ndim > 1:
        rows = jnp.where(in_old[:, None], rows, fill_value)
    else:
        rows = jnp.where(in_old, rows, fill_value)
    return rows


@functools.partial(jax.jit, static_argnums=(4, 5))
def _relayout_gather_packed(old_packed, old_start, old_cap_arr, new_start,
                            new_rows, pack_g):
    """Packed-storage relayout: a pure ROW gather on [cap/g, g*m] rows.

    Every packed row holds g consecutive slots of ONE cell (cell starts and
    capacities are multiples of 16 and g | 16), and slot offsets within a
    cell are preserved by relayout — so new packed row j (covering slots
    [j*g, (j+1)*g) of cell c at offset o = j*g - new_start[c]) is exactly
    old packed row (old_start[c] + o) // g, or zeros past the old capacity.
    The gather's operand AND output have full 128-lane minor dims, so no
    layout padding fires at any scale (ARCHITECTURE.md layout-wall table)."""
    j = jnp.arange(new_rows, dtype=jnp.int32)
    slot0 = j * pack_g
    c = (jnp.searchsorted(new_start, slot0, side="right") - 1) \
        .astype(jnp.int32)
    o = slot0 - new_start[c]
    in_old = o < old_cap_arr[c]
    src = jnp.where(in_old, (old_start[c] + o) // pack_g, 0)
    rows = old_packed[src]
    return jnp.where(in_old[:, None], rows, 0)


class CellContainer(BaseContainer):
    def __init__(self, code_size, n_cells, dtype="float32", device=None,
                 initial_size=None, expand_step_size=1024,
                 expand_mode="double", use_inverse_id_mapping=True,
                 contiguous_size=1, verbose=0, pack_group=1):
        del device, contiguous_size  # CUDA-isms accepted for API parity
        if initial_size is None:
            initial_size = max(expand_step_size // max(n_cells, 1), 16)
        # per-cell capacities are pow2 and >= 16, so every cell start is a
        # multiple of 16 — an alignment invariant the Pallas scan's DMA
        # relies on (ops/pallas_scan.py)
        per_cell = max(util.next_pow2(initial_size), 16)
        super().__init__(initial_size=per_cell * n_cells,
                         expand_step_size=expand_step_size,
                         expand_mode=expand_mode,
                         use_inverse_id_mapping=use_inverse_id_mapping,
                         verbose=verbose)
        self.code_size = int(code_size)
        self.n_cells = int(n_cells)
        self.dtype = util.str2dtype(dtype)
        # pack_group g > 1: storage is [capacity/g, g*code_size] — g
        # consecutive slots share one row whose byte width is a full
        # 128-lane tile. This is the PACKED-AT-INGEST layout the 100M-scale
        # code-domain serving needs (any XLA *read* of a u8 array with a
        # sub-128 minor dim re-lays the whole array into a 2x lane-padded
        # copy; see ARCHITECTURE.md "layout wall"). g must divide 16 so a
        # packed row never spans a cell boundary (cell starts are
        # 16-aligned).
        assert pack_group in (1, 2, 4, 8, 16), pack_group
        self.pack_group = int(pack_group)
        cap = per_cell * n_cells
        self._capacity = cap
        self.register_state("_address2id", jnp.full((cap,), -1, util.id_dtype()))
        self.register_state(
            "_storage", jnp.zeros((cap // self.pack_group,
                                   self.pack_group * self.code_size),
                                  self.dtype))
        self.register_state(
            "_cell_start",
            (jnp.arange(n_cells, dtype=jnp.int32) * per_cell))
        self.register_state(
            "_cell_size", jnp.zeros((n_cells,), jnp.int32))
        self.register_state(
            "_cell_capacity",
            jnp.full((n_cells,), per_cell, jnp.int32))
        self.register_state("_is_empty", jnp.ones((cap,), bool))
        self._aux = {}
        # host shadows for static-shape decisions
        self._cell_size_np = np.zeros(n_cells, np.int64)
        self._cell_capacity_np = np.full(n_cells, per_cell, np.int64)

    # -- properties --
    @property
    def n_items(self):
        return self._n_items

    @property
    def max_cell_capacity(self):
        """Static bound on any cell's capacity — the scan window S_max."""
        return int(self._cell_capacity_np.max())

    # -- aux stores --
    def add_aux_store(self, name, n_cols, dtype):
        self._aux[name] = (int(n_cols), util.str2dtype(dtype))
        self.register_state(
            "_aux_" + name,
            jnp.zeros((self._capacity, int(n_cols)), util.str2dtype(dtype)))

    def aux(self, name):
        return getattr(self, "_aux_" + name)

    def set_aux_rebuilder(self, names, fn):
        """Mark aux stores as *derived*: on relayout they are freed before
        the storage gathers and recreated by fn() (which must return
        {name: [new_capacity, cols] array} for every name, reading the
        already-relayouted canonical state). This caps relayout peak
        memory at ONE copy of each derived store — gathering them like
        primary state would transiently hold old + new copies of the
        decoded scan cache (~12 GB at GIST1M scale, an OOM)."""
        self._aux_rebuild_names = tuple(names)
        self._aux_rebuilder = fn

    # -- address helpers --
    def get_cell_by_address(self, address):
        """address [n] -> owning cell [n] (-1 if out of range); reference
        CellContainer.get_cell_by_address (:108-116)."""
        address = jnp.asarray(address)
        valid = (address >= 0) & (address < self._capacity)
        c = (jnp.searchsorted(self._cell_start,
                              jnp.where(valid, address, 0),
                              side="right") - 1).astype(jnp.int32)
        return jnp.where(valid, c, -1)

    def get_ioa(self, cells, unique_cells=None):
        """Rank of each element within its own cell, stable — reference
        CellContainer.get_ioa (:128-139)."""
        del unique_cells
        cells = jnp.asarray(cells).astype(jnp.int32)
        valid = jnp.ones(cells.shape, bool)
        return _compute_ioa(cells, valid, self._cell_start)

    def get_write_address(self, cells, empty_adr=None, ioa=None):
        """Target write address for each new item (the ioa-th empty slot of
        its cell) — reference CellContainer.get_write_address (:151-173)."""
        del empty_adr
        cells = jnp.asarray(cells).astype(jnp.int32)
        valid = jnp.ones(cells.shape, bool)
        if ioa is None:
            ioa = _compute_ioa(cells, valid, self._cell_start)
        return _find_write_addresses(
            self._is_empty, self._cell_start, cells, jnp.asarray(ioa), valid)

    def storage_rows(self, address):
        """Slot rows [n, code_size] at the given (pre-validated, in-range)
        addresses, independent of the pack_group layout."""
        address = jnp.asarray(address)
        g = self.pack_group
        if g == 1:
            return self._storage[address]
        rows = self._storage[address // g]  # [n, g*m]
        rows = rows.reshape(rows.shape[0], g, self.code_size)
        sub = jnp.take_along_axis(
            rows, (address % g)[:, None, None].astype(jnp.int32), axis=1)
        return sub[:, 0, :]

    def get_data_by_address(self, address):
        """[n] -> [code_size, n] reference layout; zeros for empty/invalid."""
        address = jnp.asarray(address)
        valid = (address >= 0) & (address < self._capacity)
        safe = jnp.where(valid, address, 0)
        valid = valid & ~self._is_empty[safe]
        rows = self.storage_rows(safe)
        rows = jnp.where(valid[:, None], rows, 0)
        return rows.T

    def set_data_by_address(self, data, address):
        address = jnp.asarray(address)
        valid = (address >= 0) & (address < self._capacity)
        tgt = jnp.where(valid, address, self._capacity)
        rows = jnp.asarray(data).T.astype(self.dtype)
        g = self.pack_group
        if g > 1:
            self.register_state(
                "_storage",
                _packed_row_write(self._storage, tgt, rows, g))
        else:
            self.register_state(
                "_storage", self._storage.at[tgt].set(rows, mode="drop"))
        self._mutations += 1

    def get_data_by_id(self, ids):
        return self.get_data_by_address(self.get_address_by_id(ids))

    # -- growth --
    def expand(self, cells=None, required=None, exact=False):
        """Re-layout storage with doubled capacities for the given cells.

        `required`: optional per-cell minimum sizes (host ints). Unlike the
        reference's per-cell torch.cat splice (CellContainer.py:249-311,
        O(storage) per cell with host syncs), this is one functional gather
        over the whole store, amortized by power-of-two growth.

        `exact` (with `required`): round capacities to multiples of 16
        (128 once >= 128, so the scan's s_eff window — the max capacity —
        stays 128-lane aligned for the Pallas gate) instead of powers of
        two. Cell starts stay 16-aligned (the Pallas window-DMA invariant
        needs only that), while capacity tracks the true counts — the
        pow2 rounding's 1.3-1.5x HBM overhead is what kept the 50M
        int8-cache tier from fitting one chip. Meant for the
        presize-before-ingest path (one relayout while the store is tiny);
        organic growth keeps pow2 for bounded recompilation.
        """
        new_caps = self._cell_capacity_np.copy()
        if required is not None:
            for c, req in required.items():
                if exact:
                    r = max(int(req), 16)
                    rounded = util.round_up(r, 16 if r < 128 else 128)
                else:
                    rounded = util.next_pow2(int(req))
                new_caps[c] = max(rounded, new_caps[c])
        elif cells is not None:
            for c in np.unique(np.asarray(cells)):
                new_caps[c] = new_caps[c] * 2
        else:
            new_caps = new_caps * 2
        self._relayout(new_caps)

    def _relayout(self, new_caps):
        new_caps = np.asarray(new_caps, np.int64)
        new_start_np = np.zeros_like(new_caps)
        np.cumsum(new_caps[:-1], out=new_start_np[1:])
        new_total = int(new_caps.sum())
        old_start = self._cell_start
        old_caps = self._cell_capacity
        new_start = jnp.asarray(new_start_np, jnp.int32)

        rebuild = (set(getattr(self, "_aux_rebuild_names", ()))
                   if getattr(self, "_aux_rebuilder", None) else set())
        for name in rebuild:
            # free derived stores BEFORE the gathers; recreated below
            setattr(self, "_aux_" + name, None)
        if self._n_items == 0:
            # empty container (the presize-before-ingest path): allocate
            # fresh stores instead of gather-relayouting zeros. Beyond the
            # wasted pass, XLA lays the gather fusion's u8 output out with
            # 128-lane tiling — a [100M, 64] u8 code store would PAD to 2x
            # its logical bytes and blow HBM, while plain zeros keep the
            # compact layout (measured: the 100M demo's 9.2 GB presize
            # compiled to an 18.4 GB allocation via the gather).
            aux_shapes = {name: self.aux(name).shape[1:]
                          for name in self._aux if name not in rebuild}
            aux_dtypes = {name: self.aux(name).dtype
                          for name in self._aux if name not in rebuild}
            self.register_state("_storage", jnp.zeros(
                (new_total // self.pack_group,) + self._storage.shape[1:],
                self._storage.dtype))
            self.register_state("_address2id", jnp.full(
                (new_total,), -1, self._address2id.dtype))
            self.register_state("_is_empty", jnp.ones((new_total,), bool))
            for name in aux_shapes:
                self.register_state("_aux_" + name, jnp.zeros(
                    (new_total,) + aux_shapes[name], aux_dtypes[name]))
        else:
            if self.pack_group > 1:
                self.register_state("_storage", _relayout_gather_packed(
                    self._storage, old_start, old_caps, new_start,
                    new_total // self.pack_group, self.pack_group))
            else:
                self.register_state("_storage", _relayout_gather(
                    self._storage, old_start, old_caps, new_start, new_total,
                    0))
            self.register_state("_address2id", _relayout_gather(
                self._address2id, old_start, old_caps, new_start, new_total,
                -1))
            self.register_state("_is_empty", _relayout_gather(
                self._is_empty, old_start, old_caps, new_start, new_total,
                True))
            for name in self._aux:
                if name in rebuild:
                    continue
                self.register_state("_aux_" + name, _relayout_gather(
                    self.aux(name), old_start, old_caps, new_start, new_total,
                    0))
        self.register_state("_cell_start", new_start)
        self.register_state("_cell_capacity",
                            jnp.asarray(new_caps, jnp.int32))
        self._cell_capacity_np = new_caps
        self._capacity = new_total
        if rebuild:
            rebuilt = self._aux_rebuilder()
            for name in rebuild:
                assert rebuilt[name].shape[0] == new_total
                self.register_state("_aux_" + name, rebuilt[name])
        self._mutations += 1
        # rebuild inverse map (addresses moved wholesale)
        self.create_inverse_id_mapping()
        self.print_message(
            f"relayout: capacity {new_total} "
            f"(max cell {int(new_caps.max())})", 1)

    # -- add / remove (reference CellContainer.py:313-367 / :369-393) --
    def add(self, data, cells, ids=None, return_address=False, aux_rows=None):
        """data: [code_size, n] reference layout; cells: [n] cell labels.

        `cells` may live on device (jax array) or host (numpy): the device
        path reads back only the [n_cells] per-cell counts the host shadows
        need (4*n_cells bytes) instead of the full [n] labels — it keeps
        per-item traffic off the ingest critical path (see ops/spill.py)."""
        data = jnp.asarray(data)
        assert data.shape[0] == self.code_size
        n = int(data.shape[1])
        ids_np = self._prepare_ids(ids, n)
        self._grow_id_map()

        if isinstance(cells, jax.Array):
            cells_dev = cells.astype(jnp.int32)
            counts = np.asarray(_device_bincount(
                cells_dev, n_cells=self.n_cells)).astype(np.int64)
        else:
            cells_np = np.asarray(cells).astype(np.int64)
            cells_dev = None
            counts = np.bincount(cells_np, minlength=self.n_cells)
        need = self._cell_size_np + counts
        over = need > self._cell_capacity_np
        if over.any():
            self.expand(required={
                int(c): int(need[c]) for c in np.nonzero(over)[0]})

        b = util.next_pow2(max(n, 1))
        rows = jnp.zeros((b, self.code_size), self.dtype).at[:n].set(
            data.T.astype(self.dtype))
        if cells_dev is not None:
            cellsj = jnp.zeros((b,), jnp.int32).at[:n].set(cells_dev)
        else:
            cellsj = jnp.zeros((b,), jnp.int32).at[:n].set(
                jnp.asarray(cells_np, dtype=jnp.int32))
        idsj = jnp.zeros((b,), util.id_dtype()).at[:n].set(jnp.asarray(ids_np))
        valid = jnp.arange(b) < n
        st, a2i, i2a, emp, csz, addr = _cell_add(
            self._storage, self._address2id, self._id2address,
            self._is_empty, self._cell_size, self._cell_start,
            rows, cellsj, idsj, valid, pack_g=self.pack_group)
        self.register_state("_storage", st)
        self.register_state("_address2id", a2i)
        self.register_state("_id2address", i2a)
        self.register_state("_is_empty", emp)
        self.register_state("_cell_size", csz)
        if aux_rows:
            tgt = jnp.where(valid, addr, self._capacity)
            for name, arr in aux_rows.items():
                cols, dt = self._aux[name]
                pad = jnp.zeros((b, cols), dt).at[:n].set(
                    jnp.asarray(arr).astype(dt))
                self.register_state(
                    "_aux_" + name, _aux_scatter(self.aux(name), pad, tgt))
        self._n_items += n
        self._mutations += 1
        self._cell_size_np += counts
        if return_address:
            return jnp.asarray(ids_np), addr[:n]
        return jnp.asarray(ids_np)

    def remove(self, ids=None, address=None):
        """Remove by ids or addresses; returns count actually removed.

        The reference's CellContainer.remove is a no-op in the normal case
        due to an inverted guard (:381-383); these are the semantics its
        tests describe (SURVEY.md §4)."""
        assert (ids is None) != (address is None), \
            "provide exactly one of ids / address"
        if address is None:
            address = self.get_address_by_id(jnp.asarray(ids))
        address = np.unique(np.asarray(address))
        address = address[(address >= 0) & (address < self._capacity)]
        r = len(address)
        if r == 0:
            return 0
        # liveness filtering and per-cell counts happen on device
        # (_cell_remove); the host reads back only the [n_cells] counts and
        # the removed total — never the O(capacity) is_empty bitmap
        b = util.next_pow2(r)
        addrs = jnp.full((b,), 0, jnp.int32).at[:r].set(
            jnp.asarray(address, dtype=jnp.int32))
        valid = jnp.arange(b) < r
        a2i, i2a, emp, csz, n_removed, counts = _cell_remove(
            self._address2id, self._id2address, self._is_empty,
            self._cell_size, self._cell_start, addrs, valid)
        self.register_state("_address2id", a2i)
        self.register_state("_id2address", i2a)
        self.register_state("_is_empty", emp)
        self.register_state("_cell_size", csz)
        self._cell_size_np -= np.asarray(counts).astype(np.int64)
        removed = int(n_removed)
        self._n_items -= removed
        self._mutations += 1
        return removed

    def empty(self):
        """Drop all items, keep layout (reference CellContainer.empty)."""
        self.register_state("_address2id",
                            jnp.full((self._capacity,), -1, util.id_dtype()))
        self.register_state("_id2address",
                            jnp.full((self._id_capacity,), -1, jnp.int32))
        self.register_state("_is_empty", jnp.ones((self._capacity,), bool))
        self.register_state("_cell_size",
                            jnp.zeros((self.n_cells,), jnp.int32))
        self._n_items = 0
        self._max_id = 0
        self._mutations += 1
        self._cell_size_np[:] = 0

    def _after_load(self):
        super()._after_load()
        self._mutations += 1
        self._cell_size_np = np.asarray(self._cell_size, dtype=np.int64)
        self._cell_capacity_np = np.asarray(self._cell_capacity,
                                            dtype=np.int64)
        # self-healing pack_group: derive the packed layout from the loaded
        # storage width so checkpoints round-trip across construction args
        self.pack_group = int(self._storage.shape[1]) // self.code_size
