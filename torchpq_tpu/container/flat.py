"""Flat (dense-prefix) dynamic store.

Reference counterpart: torchpq/container/FlatContainer.py — append-only
storage with swap-from-tail compaction on remove (:160-190) so live rows
always form a dense prefix [0, n_items).

Storage here is row-major [capacity, code_size] (the reference's interleaved
[code_size//cs, cap, cs] layout exists only for uchar4 vectorized loads, a
CUDA-ism). `aux` row stores (e.g. an index's bf16 decoded scan cache) share
the address space and are scattered/compacted in lockstep — this same
mechanism realizes FlatContainerGroup (see group.py).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import util
from .base import BaseContainer, _aux_scatter


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _flat_add(storage, address2id, id2address, data, ids, valid, n_items):
    """Append `valid` rows of data at addresses n_items + rank(valid)."""
    b = data.shape[0]
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    addr = jnp.where(valid, n_items + rank, storage.shape[0])  # invalid -> drop
    storage = storage.at[addr].set(data, mode="drop")
    address2id = address2id.at[addr].set(ids, mode="drop")
    id2address = id2address.at[
        jnp.where(valid, ids, id2address.shape[0])].set(
        addr.astype(jnp.int32), mode="drop")
    return storage, address2id, id2address, jnp.where(valid, addr, -1)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _flat_remove(storage, address2id, id2address, addrs, valid, n_items):
    """Swap-from-tail compaction (reference FlatContainer.py:160-190).

    addrs: [r] addresses to delete (unique among valid entries). Rows from the
    tail window [n_items - r_valid, n_items) that survive are moved into the
    holes below the new prefix end.
    """
    cap = storage.shape[0]
    r = addrs.shape[0]
    r_valid = jnp.sum(valid.astype(jnp.int32))
    new_n = n_items - r_valid

    removed = jnp.zeros((cap,), bool).at[
        jnp.where(valid, addrs, cap)].set(True, mode="drop")

    # ids of removed rows -> unmap
    rm_ids = jnp.where(valid, address2id[jnp.where(valid, addrs, 0)], -1)
    id2address = id2address.at[
        jnp.where(rm_ids >= 0, rm_ids, id2address.shape[0])].set(
        -1, mode="drop")

    # tail window has static length r; survivors are packed to the front
    win = new_n + jnp.arange(r, dtype=addrs.dtype)
    win_live = (win < n_items) & ~removed[jnp.clip(win, 0, cap - 1)]
    order = jnp.argsort(jnp.where(win_live, jnp.arange(r), r))  # stable pack
    survivors = win[order]  # first s are live tail rows
    n_surv = jnp.sum(win_live.astype(jnp.int32))

    # holes below new_n, packed ascending; exactly n_surv of them
    hole_key = jnp.where(valid & (addrs < new_n), addrs, cap)
    holes = jnp.sort(hole_key)

    do_move = jnp.arange(r) < n_surv
    src = jnp.where(do_move, survivors, 0)
    dst = jnp.where(do_move, holes, cap)  # drop when no move

    moved_rows = storage[src]
    moved_ids = address2id[src]
    storage = storage.at[dst].set(moved_rows, mode="drop")
    address2id = address2id.at[dst].set(moved_ids, mode="drop")
    id2address = id2address.at[
        jnp.where(do_move & (moved_ids >= 0), moved_ids,
                  id2address.shape[0])].set(
        dst.astype(jnp.int32), mode="drop")

    # clear the vacated tail [new_n, n_items)
    clear = jnp.where(win < n_items, win, cap)
    address2id = address2id.at[clear].set(-1, mode="drop")
    return storage, address2id, id2address, (src, dst, do_move)


class FlatContainer(BaseContainer):
    def __init__(self, code_size, contiguous_size=1, dtype="float32",
                 device=None, initial_size=None, expand_step_size=1024,
                 expand_mode="double", use_inverse_id_mapping=True,
                 verbose=0):
        super().__init__(initial_size=initial_size,
                         expand_step_size=expand_step_size,
                         expand_mode=expand_mode,
                         use_inverse_id_mapping=use_inverse_id_mapping,
                         verbose=verbose)
        del device, contiguous_size  # CUDA-isms accepted for API parity
        self.code_size = int(code_size)
        self.dtype = util.str2dtype(dtype)
        self.register_state(
            "_storage", jnp.zeros((self._capacity, self.code_size), self.dtype))
        self._aux = {}  # name -> (n_cols, dtype); arrays live as states

    # -- auxiliary row stores sharing the address space --
    def add_aux_store(self, name, n_cols, dtype):
        self._aux[name] = (int(n_cols), util.str2dtype(dtype))
        self.register_state(
            "_aux_" + name,
            jnp.zeros((self._capacity, int(n_cols)), util.str2dtype(dtype)))

    def aux(self, name):
        return getattr(self, "_aux_" + name)

    # -- data access (reference FlatContainer.py:50-90) --
    def get_data_by_address(self, address):
        """address [n] -> data [code_size, n] (reference layout); zeros for
        invalid addresses."""
        address = jnp.asarray(address)
        valid = (address >= 0) & (address < self._n_items)
        rows = self._storage[jnp.where(valid, address, 0)]
        rows = jnp.where(valid[:, None], rows, 0)
        return rows.T

    def set_data_by_address(self, data, address):
        """data [code_size, n] (reference layout) written at address [n]."""
        address = jnp.asarray(address)
        valid = (address >= 0) & (address < self._capacity)
        tgt = jnp.where(valid, address, self._capacity)
        self.register_state(
            "_storage",
            self._storage.at[tgt].set(jnp.asarray(data).T.astype(self.dtype),
                                      mode="drop"))
        self._mutations += 1

    def get_data_by_id(self, ids):
        return self.get_data_by_address(self.get_address_by_id(ids))

    # -- growth --
    def _grow_to(self, new_cap):
        if new_cap <= self._capacity:
            return
        pad = new_cap - self._capacity
        self.register_state("_storage", jnp.concatenate(
            [self._storage,
             jnp.zeros((pad, self.code_size), self.dtype)]))
        for name, (cols, dt) in self._aux.items():
            self.register_state("_aux_" + name, jnp.concatenate(
                [self.aux(name), jnp.zeros((pad, cols), dt)]))
        self.register_state("_address2id", jnp.concatenate(
            [self._address2id, jnp.full((pad,), -1, self._address2id.dtype)]))
        self._capacity = new_cap
        self._mutations += 1
        self.print_message(f"expanded to capacity {new_cap}", 1)

    def expand(self):
        """Reference-parity single-step expand (FlatContainer.py:97-115)."""
        self._grow_to(self._next_capacity(self._capacity + 1))

    # -- add / remove --
    def add(self, data, ids=None, return_address=False,
            aux_rows=None):
        """data: [code_size, n] reference layout. Returns ids (and addresses).
        (reference FlatContainer.add, :117-158)."""
        data = jnp.asarray(data)
        assert data.shape[0] == self.code_size
        n = int(data.shape[1])
        ids_np = self._prepare_ids(ids, n)
        self._grow_id_map()
        if self._n_items + n > self._capacity:
            self._grow_to(self._next_capacity(self._n_items + n))

        b = util.next_pow2(max(n, 1))
        rows = jnp.zeros((b, self.code_size), self.dtype).at[:n].set(
            data.T.astype(self.dtype))
        idsj = jnp.zeros((b,), util.id_dtype()).at[:n].set(jnp.asarray(ids_np))
        valid = (jnp.arange(b) < n)
        st, a2i, i2a, addr = _flat_add(
            self._storage, self._address2id, self._id2address,
            rows, idsj, valid, jnp.int32(self._n_items))
        self.register_state("_storage", st)
        self.register_state("_address2id", a2i)
        self.register_state("_id2address", i2a)
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
        if return_address:
            return jnp.asarray(ids_np), addr[:n]
        return jnp.asarray(ids_np)

    def remove(self, ids=None, address=None):
        """Remove by ids or addresses; compacts via swap-from-tail
        (reference FlatContainer.remove, :160-190)."""
        assert (ids is None) != (address is None), \
            "provide exactly one of ids / address"
        if address is None:
            address = self.get_address_by_id(jnp.asarray(ids))
        address = np.unique(np.asarray(address))
        address = address[(address >= 0) & (address < self._n_items)]
        r = len(address)
        if r == 0:
            return 0
        b = util.next_pow2(r)
        addrs = jnp.full((b,), -1, jnp.int32).at[:r].set(
            jnp.asarray(address, dtype=jnp.int32))
        valid = jnp.arange(b) < r
        st, a2i, i2a, (src, dst, do_move) = _flat_remove(
            self._storage, self._address2id, self._id2address,
            addrs, valid, jnp.int32(self._n_items))
        self.register_state("_storage", st)
        self.register_state("_address2id", a2i)
        self.register_state("_id2address", i2a)
        for name in self._aux:
            arr = self.aux(name)
            moved = arr[src]
            self.register_state(
                "_aux_" + name,
                arr.at[jnp.where(do_move, dst, self._capacity)].set(
                    moved, mode="drop"))
        self._n_items -= r
        self._mutations += 1
        return r

    def empty(self):
        """Drop all items (reference FlatContainer.empty, :92-95)."""
        self.register_state("_address2id",
                            jnp.full((self._capacity,), -1, util.id_dtype()))
        self.register_state("_id2address",
                            jnp.full((self._id_capacity,), -1, jnp.int32))
        self._n_items = 0
        self._max_id = 0
        self._mutations += 1
