"""Test configuration: force JAX onto a virtual 8-device CPU platform.

The container's sitecustomize registers (and pins) the axon TPU platform at
interpreter start, before conftest runs — so plain env-var setdefaults are too
late. Instead we flip ``jax_platforms`` via jax.config before any backend is
initialized, and inject the 8-device host flag. Multi-chip sharding tests
(halo exchange, data parallelism) run on this virtual mesh; real-TPU behavior
is exercised by bench.py / __graft_entry__.py.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
# keep CPU-test compile artifacts out of the real (TPU) persistent cache:
# they'd only add cross-machine AOT-load warnings and disk churn there.
# jaxconfig's own tests monkeypatch their own cache dirs.
os.environ.setdefault("CD_TPU_COMPILATION_CACHE_DIR", "off")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream no
    # matter which other tests ran before it (a session-scoped generator
    # makes tolerance-tuned tests fail when collection order changes)
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def reference_ckpt_dir():
    d = os.path.join(REFERENCE_ROOT, "trained_models")
    if not os.path.isdir(d):
        pytest.skip("reference checkpoints not available")
    return d


@pytest.fixture(scope="session")
def weights_root():
    """Converted weight store; skip tests that need it if not yet generated."""
    root = os.path.join(REPO_ROOT, "weights")
    if not os.path.isdir(root):
        pytest.skip("converted weights not available (run cli/convert.py)")
    return root
