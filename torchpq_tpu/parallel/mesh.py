"""Mesh helpers."""

import jax
import numpy as np
from jax.sharding import Mesh


def device_count():
    return len(jax.devices())


def get_mesh(n_devices=None, axis_name="shard", devices=None):
    """1-D mesh over the first n_devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))
