"""Group of parallel flat stores sharing one id/address space.

Reference counterpart: torchpq/container/FlatContainerGroup.py — N storages
with per-storage code_size/dtype, one id/address bookkeeping, read-only
FlatContainer views via __getitem__ (:67-95). Used conceptually for
code + rerank-code pairs (SURVEY.md §2.6).

Implemented on FlatContainer's aux-store mechanism: storage 0 is the primary,
storages 1..N-1 are aux row stores that scatter/compact in lockstep.
"""

import jax.numpy as jnp

from .flat import FlatContainer


class _StorageView:
    """Read-only view of one member storage (reference's __getitem__ view)."""

    def __init__(self, group, i):
        self._group = group
        self._i = i

    @property
    def code_size(self):
        return self._group.code_sizes[self._i]

    @property
    def dtype(self):
        return self._group.dtypes[self._i]

    @property
    def n_items(self):
        return self._group.n_items

    def get_data_by_address(self, address):
        return self._group.get_data_by_address(address, self._i)

    def get_data_by_id(self, ids):
        return self._group.get_data_by_address(
            self._group.get_address_by_id(jnp.asarray(ids)), self._i)


class FlatContainerGroup(FlatContainer):
    def __init__(self, code_sizes, dtypes=None, contiguous_sizes=None,
                 device=None, initial_size=None, expand_step_size=1024,
                 expand_mode="double", use_inverse_id_mapping=True,
                 verbose=0):
        code_sizes = [int(c) for c in code_sizes]
        if dtypes is None:
            dtypes = ["float32"] * len(code_sizes)
        assert len(dtypes) == len(code_sizes)
        super().__init__(
            code_size=code_sizes[0], dtype=dtypes[0], device=device,
            initial_size=initial_size, expand_step_size=expand_step_size,
            expand_mode=expand_mode,
            use_inverse_id_mapping=use_inverse_id_mapping, verbose=verbose)
        del contiguous_sizes
        self.n_storages = len(code_sizes)
        self.code_sizes = code_sizes
        self.dtypes = dtypes
        for i in range(1, self.n_storages):
            self.add_aux_store(f"storage{i}", code_sizes[i], dtypes[i])

    def __getitem__(self, i):
        assert 0 <= i < self.n_storages
        return _StorageView(self, i)

    def add(self, data_list, ids=None, return_address=False):
        """data_list: list of [code_size_i, n] arrays, one per storage."""
        assert len(data_list) == self.n_storages
        aux_rows = {
            f"storage{i}": jnp.asarray(data_list[i]).T
            for i in range(1, self.n_storages)
        }
        return super().add(data_list[0], ids=ids,
                           return_address=return_address, aux_rows=aux_rows)

    def get_data_by_address(self, address, storage_index=0):
        if storage_index == 0:
            return super().get_data_by_address(address)
        address = jnp.asarray(address)
        valid = (address >= 0) & (address < self.n_items)
        rows = self.aux(f"storage{storage_index}")[
            jnp.where(valid, address, 0)]
        rows = jnp.where(valid[:, None], rows, 0)
        return rows.T

    def set_data_by_address(self, data, address, storage_index=0):
        if storage_index == 0:
            return super().set_data_by_address(data, address)
        address = jnp.asarray(address)
        name = f"storage{storage_index}"
        cols, dt = self._aux[name]
        valid = (address >= 0) & (address < self._capacity)
        tgt = jnp.where(valid, address, self._capacity)
        self.register_state(
            "_aux_" + name,
            self.aux(name).at[tgt].set(
                jnp.asarray(data).T.astype(dt), mode="drop"))
        self._mutations += 1
