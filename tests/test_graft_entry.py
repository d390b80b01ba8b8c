"""Driver-contract checks for __graft_entry__.py (compile + tiny dryrun)."""

import os
import re
import subprocess
import sys

import jax
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    sys.path.insert(0, REPO_ROOT)
    import __graft_entry__
    return __graft_entry__


def test_entry_compiles():
    mod = _load()
    fn, args = mod.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    assert compiled is not None


def test_dryrun_multichip_8():
    mod = _load()
    mod.dryrun_multichip(8)


def test_dryrun_self_provisions_like_the_driver():
    """Run dryrun_multichip(8) the way the DRIVER does: a fresh subprocess
    (no conftest, no pre-built 8-device mesh) that sees only ONE device.
    dryrun_multichip must self-provision the virtual 8-device CPU mesh by
    re-exec — this is the round-1 contract failure (MULTICHIP_r01.json
    ok=false) pinned as a regression test.

    The outer process is pinned to a 1-device CPU platform (standing in for
    the driver's 1-TPU environment without depending on the axon tunnel);
    the child must override the inherited device-count flag itself.
    """
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = (
        re.sub(r"--xla_force_host_platform_device_count=\d+", "",
               env.get("XLA_FLAGS", ""))
        + " --xla_force_host_platform_device_count=1").strip()
    code = (
        "import jax, sys\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
        "print('driver-style dryrun ok')\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO_ROOT,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "driver-style dryrun ok" in proc.stdout
