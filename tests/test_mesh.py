"""Mesh construction + multi-host pathway (logic-level, no pod needed)."""

from dataclasses import dataclass

import numpy as np
import pytest

import jax

from collaborative_distillation_tpu.parallel.mesh import (
    initialize_multihost,
    make_mesh,
    order_devices_for_mesh,
)


@dataclass(frozen=True)
class FakeDev:
    id: int
    process_index: int


def test_space_axis_stays_within_host():
    """2 hosts x 4 chips: space=4 must not cross hosts (halo ppermutes ride
    ICI); data=2 crosses hosts (one psum per step over DCN)."""
    devs = [FakeDev(id=i, process_index=i // 4) for i in range(8)]
    grid = order_devices_for_mesh(devs, data=2, space=4)
    assert grid.shape == (2, 4)
    for row in grid:
        assert len({d.process_index for d in row}) == 1
    assert {row[0].process_index for row in grid} == {0, 1}


def test_order_is_deterministic_regardless_of_input_order():
    devs = [FakeDev(id=i, process_index=i // 2) for i in range(4)]
    g1 = order_devices_for_mesh(devs, data=2, space=2)
    g2 = order_devices_for_mesh(devs[::-1], data=2, space=2)
    assert (g1 == g2).all()


def test_too_few_devices_raises():
    devs = [FakeDev(id=0, process_index=0)]
    with pytest.raises(ValueError, match="needs 4 devices"):
        order_devices_for_mesh(devs, data=2, space=2)


def test_make_mesh_on_virtual_devices():
    mesh = make_mesh(data=2, space=4)
    assert mesh.shape == {"data": 2, "space": 4}
    assert mesh.devices.shape == (2, 4)


def test_initialize_multihost_forwards_args(monkeypatch):
    calls = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.update(kw))
    initialize_multihost("coord:1234", 4, 2)
    assert calls == {"coordinator_address": "coord:1234",
                     "num_processes": 4, "process_id": 2}


def test_initialize_multihost_env_defaults(monkeypatch):
    calls = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.update(kw))
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "host0:9999")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "1")
    initialize_multihost()
    assert calls == {"coordinator_address": "host0:9999",
                     "num_processes": 2, "process_id": 1}


def test_initialize_multihost_autodetect(monkeypatch):
    """On TPU pods everything is metadata-autodetected: no args, no env."""
    calls = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.update(kw) or None)
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    initialize_multihost()
    assert calls == {}
