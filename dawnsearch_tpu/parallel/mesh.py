"""Mesh helpers for the device-parallel tier (SURVEY §2.3: the ICI
replacement for the reference's peer fan-out, udp_service.rs:297-330)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axes: dict[str, int] | None = None,
              devices: list | None = None) -> Mesh:
    """Build a Mesh. Default: all devices on one "shard" axis (the index
    fan-out axis). Pass e.g. {"data": 4, "model": 2} for training."""
    devices = devices if devices is not None else jax.devices()
    if axes is None:
        axes = {"shard": len(devices)}
    names = tuple(axes)
    shape = tuple(axes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh {axes} needs {np.prod(shape)} devices, "
                         f"have {len(devices)}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def single_device_mesh(axis: str = "shard") -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]), (axis,))
