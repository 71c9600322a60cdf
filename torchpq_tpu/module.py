"""Stateful-shell base class (reference counterpart: torchpq/CustomModule.py).

The reference makes every stateful object a torch.nn.Module so registered
buffers give save/load for free (README.md:90-97), with a shape-tolerant
load_state_dict (CustomModule.py:14-23). Here the equivalent is: each class
keeps its array state in named attributes registered via `register_state`;
`state_dict()` returns a flat dict of numpy arrays (plus python scalars), and
`load_state_dict()` restores them *replacing* shapes wholesale — the "state is
data, shape may differ on load" property the reference relies on.
"""

import numpy as np
import jax.numpy as jnp


class StateModule:
    def __init__(self, verbose=0):
        self.verbose = verbose
        self._state_keys = []
        self._submodules = {}

    # -- verbosity (reference CustomModule.print_message, :8-12) --
    def print_message(self, message, level=1):
        if getattr(self, "verbose", 0) >= level:
            print(f"[{type(self).__name__}] {message}")

    # -- state registry --
    def register_state(self, name, value):
        if name not in self._state_keys:
            self._state_keys.append(name)
        setattr(self, name, value)

    def register_module(self, name, module):
        self._submodules[name] = module
        setattr(self, name, module)

    def state_dict(self, prefix=""):
        out = {}
        for k in self._state_keys:
            v = getattr(self, k)
            if v is None:
                continue
            out[prefix + k] = np.asarray(v) if hasattr(v, "shape") else v
        for name, mod in self._submodules.items():
            out.update(mod.state_dict(prefix=prefix + name + "."))
        return out

    def state_nbytes(self):
        """Total bytes of registered state, summed WITHOUT device->host
        transfer (jax arrays report .nbytes from metadata). state_dict()
        materializes every array on the host — at 100M-slot scale that is
        a multi-GB pull over the device tunnel and can drop the TPU
        connection; use this for capacity accounting instead."""
        total = 0
        for k in self._state_keys:
            v = getattr(self, k)
            if v is not None and hasattr(v, "nbytes"):
                total += int(v.nbytes)
        for mod in self._submodules.values():
            total += mod.state_nbytes()
        return total

    def load_state_dict(self, state, prefix=""):
        for k in self._state_keys:
            key = prefix + k
            if key in state:
                v = state[key]
                if isinstance(v, np.ndarray) and v.ndim > 0:
                    v = jnp.asarray(v)
                elif isinstance(v, np.ndarray):
                    v = v.item()
                setattr(self, k, v)
        for name, mod in self._submodules.items():
            mod.load_state_dict(state, prefix=prefix + name + ".")
        self._after_load()

    def _after_load(self):
        """Hook for derived classes to rebuild derived/python-side state."""

    def save(self, path, format="npz"):
        """Checkpoint the state dict.

        format="npz" (default): one portable np.savez file. Extension
        dtypes (bfloat16) are not round-trippable through the .npy format,
        so they're stored as raw uint16 bits plus a `<key>::bfloat16`
        marker entry.
        format="orbax": an orbax PyTree checkpoint directory — the
        TPU-idiomatic path (async-capable, native bf16, scales to sharded
        arrays; SURVEY.md §5.4)."""
        if format == "orbax":
            import orbax.checkpoint as ocp
            import os
            ocp.PyTreeCheckpointer().save(
                os.path.abspath(os.fspath(path)),
                {k: np.asarray(v) for k, v in self.state_dict().items()})
            return
        assert format == "npz", format
        import ml_dtypes
        arrays = {}
        for k, v in self.state_dict().items():
            a = np.asarray(v)
            if a.dtype == ml_dtypes.bfloat16:
                arrays[k] = a.view(np.uint16)
                arrays[k + "::bfloat16"] = np.array(True)
            else:
                arrays[k] = a
        np.savez(path, **arrays)

    def load(self, path):
        import ml_dtypes
        import os
        if os.path.isdir(path):  # orbax checkpoint directory
            import orbax.checkpoint as ocp
            state = ocp.PyTreeCheckpointer().restore(
                os.path.abspath(os.fspath(path)))
            self.load_state_dict(
                {k: np.asarray(v) for k, v in state.items()})
            return
        if not os.path.exists(path) and os.path.exists(str(path) + ".npz"):
            # np.savez appends .npz to extension-less save paths; accept
            # the same string the caller saved with
            path = str(path) + ".npz"
        with np.load(path, allow_pickle=False) as f:
            state = {}
            for k in f.files:
                if k.endswith("::bfloat16"):
                    continue
                a = f[k]
                if k + "::bfloat16" in f.files:
                    a = a.view(ml_dtypes.bfloat16)
                elif a.dtype.kind == "V" and a.dtype.itemsize == 2:
                    # legacy file: bf16 saved without the marker
                    a = a.view(ml_dtypes.bfloat16)
                state[k] = a
            self.load_state_dict(state)
