"""Container base: id <-> address machinery.

Reference counterpart: torchpq/container/BaseContainer.py — `_address2id`
buffer with -1 sentinel, `max_id` counter, optional dense inverse map
(`create_inverse_id_mapping`, :100-110), expand growth policy (:112-127).

Design notes (TPU-first):
* All array state is device-resident jnp arrays with power-of-two capacities;
  every mutation is a functional scatter. Growth re-allocates to the next
  power of two, so jit specializations are bounded (SURVEY.md §7 "dynamic
  growth under jit").
* The id->address translation always uses the dense inverse map — the
  reference's O(n_data · n_ids) brute-force scan kernel
  (kernels/cuda/get_address_by_id.cu) exists only because that map is
  optional there; here it is maintained incrementally on every add/remove.
* Host-side *shadows* of scalar bookkeeping (n_items, max_id, capacities)
  are kept in python so growth decisions never force a device sync.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..module import StateModule
from .. import util


@functools.partial(jax.jit, donate_argnums=(0,))
def _aux_scatter(aux, pad, tgt):
    """Donated scatter for aux row stores. The decoded scan cache is the
    largest array in an index ([cap, d] — ~4 GB at GIST1M scale); without
    donation every add chunk transiently holds two copies of it, which
    OOMs a 16 GB chip. tgt == capacity rows are dropped (invalid items)."""
    return aux.at[tgt].set(pad, mode="drop")


class BaseContainer(StateModule):
    def __init__(self, initial_size=None, expand_step_size=1024,
                 expand_mode="double", use_inverse_id_mapping=True,
                 verbose=0):
        super().__init__(verbose=verbose)
        assert expand_mode in ("step", "double")
        self.expand_step_size = int(expand_step_size)
        self.expand_mode = expand_mode
        self.use_inverse_id_mapping = use_inverse_id_mapping
        self._expand_calls = 0
        # bumped on every storage mutation (add/remove/relayout/load);
        # lets caches derived from storage (e.g. the compacted flat-scan
        # cache in index/ivfpq.py) invalidate without content hashing
        self._mutations = 0

        cap = util.next_pow2(initial_size or expand_step_size)
        self._capacity = cap
        self._n_items = 0
        self._max_id = 0
        self._id_capacity = util.next_pow2(max(cap, 1))
        self.register_state("_address2id",
                            jnp.full((cap,), -1, util.id_dtype()))
        self.register_state("_id2address",
                            jnp.full((self._id_capacity,), -1, jnp.int32))

    # -- scalars --
    @property
    def capacity(self):
        return self._capacity

    @property
    def n_items(self):
        return self._n_items

    @property
    def max_id(self):
        return self._max_id

    # -- growth policy (reference BaseContainer.expand, :112-127) --
    def _next_capacity(self, required):
        cap = self._capacity
        while cap < required:
            if self.expand_mode == "double":
                # the reference doubles the *step size* each expand call
                step = self.expand_step_size * (2 ** self._expand_calls)
            else:
                step = self.expand_step_size
            cap = util.next_pow2(cap + step)
            self._expand_calls += 1
        return cap

    # -- id plumbing --
    def _prepare_ids(self, ids, n):
        """Materialize host int64 ids (default: consecutive from max_id,
        reference FlatContainer.add:117-158)."""
        if ids is None:
            ids = np.arange(self._max_id, self._max_id + n, dtype=np.int64)
        else:
            ids = np.asarray(ids, dtype=np.int64)
            assert ids.shape == (n,), f"ids shape {ids.shape} != ({n},)"
        if n:
            self._max_id = max(self._max_id, int(ids.max()) + 1)
        return ids

    def _grow_id_map(self):
        need = util.next_pow2(max(self._max_id, 1))
        if need > self._id_capacity:
            pad = need - self._id_capacity
            self.register_state(
                "_id2address",
                jnp.concatenate([self._id2address,
                                 jnp.full((pad,), -1, jnp.int32)]))
            self._id_capacity = need

    def create_inverse_id_mapping(self):
        """Rebuild the dense inverse map from _address2id (reference
        BaseContainer.create_inverse_id_mapping, :100-110)."""
        self._grow_id_map()
        a2i = self._address2id
        addrs = jnp.arange(a2i.shape[0], dtype=jnp.int32)
        safe = jnp.where(a2i >= 0, a2i, 0).astype(jnp.int32)
        inv = jnp.full((self._id_capacity,), -1, jnp.int32)
        inv = inv.at[jnp.where(a2i >= 0, safe, self._id_capacity)].set(
            addrs, mode="drop")
        self.register_state("_id2address", inv)

    def get_id_by_address(self, address):
        """address [n] -> ids [n] int64; -1 for empty/out-of-range
        (reference BaseContainer.get_id_by_address, :58-65)."""
        address = jnp.asarray(address)
        valid = (address >= 0) & (address < self._capacity)
        safe = jnp.where(valid, address, 0)
        out = self._address2id[safe]
        return jnp.where(valid, out, -1)

    def get_address_by_id(self, ids):
        """ids [n] int64 -> addresses [n] int32; -1 if absent
        (reference BaseContainer.get_address_by_id, :79-98)."""
        ids = jnp.asarray(ids)
        valid = (ids >= 0) & (ids < self._id_capacity)
        safe = jnp.where(valid, ids, 0)
        out = self._id2address[safe]
        return jnp.where(valid, out, -1)

    def _after_load(self):
        self._capacity = int(self._address2id.shape[0])
        self._id_capacity = int(self._id2address.shape[0])
        a2i = np.asarray(self._address2id)
        self._n_items = int((a2i >= 0).sum())
        self._max_id = int(a2i.max()) + 1 if (a2i >= 0).any() else 0
