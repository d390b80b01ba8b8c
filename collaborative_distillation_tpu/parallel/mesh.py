"""Device-mesh helpers.

Mesh axes used by the framework:

* ``data``  — batch data parallelism for distillation training (the reference
  is single-GPU, main.py:70; we shard the batch).
* ``space`` — spatial tiling of the image H axis for ultra-resolution
  inference (the reference's 12GB-GPU workarounds — CPU SVD, empty_cache,
  16x compression, WCT.py:100-105 — replaced by sharding pixels over chips
  with halo exchange riding ICI).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "P", "NamedSharding"]


def make_mesh(*, data: int = 1, space: int = 1, devices=None) -> Mesh:
    """Build a (data, space) mesh from the available devices.

    ``data * space`` must divide the device count; surplus devices are left
    unused (single-chip: both default to 1).
    """
    devices = list(devices if devices is not None else jax.devices())
    need = data * space
    if need > len(devices):
        raise ValueError(f"mesh {data}x{space} needs {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(data, space)
    return Mesh(arr, ("data", "space"))
