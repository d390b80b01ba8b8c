"""Device-mesh helpers (single-host and multi-host).

Mesh axes used by the framework:

* ``data``  — batch data parallelism for distillation training (the reference
  is single-GPU, main.py:70; we shard the batch).
* ``space`` — spatial tiling of the image H axis for ultra-resolution
  inference (the reference's 12GB-GPU workarounds — CPU SVD, empty_cache,
  16x compression, WCT.py:100-105 — replaced by sharding pixels over chips
  with halo exchange riding ICI).

Multi-host: call :func:`initialize_multihost` once per process (before any
jax computation), then :func:`make_mesh` as usual — it sees the *global*
device list and lays the ``space`` axis out within a host so that the
per-conv/per-stage halo ``ppermute`` traffic rides ICI, while the ``data``
axis (one psum per training step) crosses hosts over DCN.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize_multihost", "order_devices_for_mesh", "make_mesh",
           "P", "NamedSharding"]


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Join a multi-host JAX runtime (one call per process, before any op).

    Thin wrapper over ``jax.distributed.initialize``; on TPU pods the three
    arguments are auto-detected from the TPU metadata, elsewhere they come
    from the arguments or the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID). After this, ``jax.devices()`` spans
    all hosts and :func:`make_mesh` builds global meshes; per-host data
    feeding uses ``jax.process_index()``/``jax.make_array_from_process_
    local_data`` as usual.

    The reference has no distributed story at all (SURVEY §2.3: no
    torch.distributed/NCCL/MPI anywhere); this is the TPU-native pathway:
    XLA collectives over ICI within a slice, DCN across slices.
    """
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes is not None or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = (
            num_processes if num_processes is not None
            else int(os.environ["JAX_NUM_PROCESSES"]))
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = (
            process_id if process_id is not None
            else int(os.environ["JAX_PROCESS_ID"]))
    jax.distributed.initialize(**kwargs)


def order_devices_for_mesh(devices, data: int, space: int):
    """Arrange devices into a (data, space) grid, keeping the ``space`` axis
    within a host wherever possible.

    Row-major reshape makes ``space`` the fastest-varying axis, so sorting by
    (process_index, id) puts the ``space`` neighbours — who exchange halos at
    every stage — on the same host's ICI, and spreads ``data`` — one gradient
    psum per step — across hosts' DCN. Pure function over device-like objects
    (needs ``.process_index`` and ``.id``), unit-testable without hardware.
    """
    need = data * space
    if need > len(devices):
        raise ValueError(
            f"mesh {data}x{space} needs {need} devices, have {len(devices)}")
    ordered = sorted(devices, key=lambda d: (d.process_index, d.id))[:need]
    return np.array(ordered).reshape(data, space)


def make_mesh(*, data: int = 1, space: int = 1, devices=None) -> Mesh:
    """Build a (data, space) mesh from the available devices.

    ``data * space`` must divide the device count; surplus devices are left
    unused (single-chip: both default to 1). With a multi-host runtime
    (:func:`initialize_multihost`) the device list spans all hosts and the
    axes are laid out ICI-first for ``space`` (see
    :func:`order_devices_for_mesh`).
    """
    if devices is not None:
        # an explicit device list is an explicit LAYOUT: honor the caller's
        # ordering verbatim (they may be pinning specific chips to axes);
        # only auto-discovered devices get the ICI-first arrangement
        devices = list(devices)
        need = data * space
        if need > len(devices):
            raise ValueError(
                f"mesh {data}x{space} needs {need} devices, have {len(devices)}")
        return Mesh(np.array(devices[:need]).reshape(data, space),
                    ("data", "space"))
    devices = list(jax.devices())
    return Mesh(order_devices_for_mesh(devices, data, space), ("data", "space"))
