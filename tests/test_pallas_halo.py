"""Pallas RDMA halo exchange == the ppermute implementation (interpret mode).

Runs the remote-DMA kernel on the virtual CPU mesh via Pallas TPU interpret
mode (remote copies simulated) and pins it against
``parallel.spatial._exchange_row_halos`` — same extended shape, same
neighbour rows, zero fill at global edges.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from jax.sharding import Mesh

from collaborative_distillation_tpu.parallel.spatial import _exchange_row_halos


def _space_mesh(n):
    # interpret-mode DMA simulation only supports single-axis meshes; the
    # kernel itself addresses neighbours by mesh-axis dict (multi-axis OK
    # on real hardware lowering)
    import numpy as _np
    return Mesh(_np.array(jax.devices()[:n]), ("space",))


@pytest.mark.parametrize("hm", [1, 2, 4])
def test_pallas_halo_matches_ppermute(rng, hm):
    from collaborative_distillation_tpu.ops.pallas.halo import (
        halo_exchange_rows_pallas,
    )

    n_dev = min(4, len(jax.devices()))
    if n_dev < 2:
        pytest.skip("needs >= 2 devices")
    mesh = _space_mesh(n_dev)
    h_loc = 8
    img = jnp.asarray(rng.random((1, h_loc * n_dev, 16, 8), np.float32))

    def ref_fn(x):
        return _exchange_row_halos(x, hm, "space")

    def pallas_fn(x):
        return halo_exchange_rows_pallas(x, hm, "space", interpret=True)

    spec = P(None, "space", None, None)
    ref = shard_map(ref_fn, mesh=mesh, in_specs=spec, out_specs=spec)(img)
    out = shard_map(pallas_fn, mesh=mesh, in_specs=spec, out_specs=spec,
                check_vma=False)(img)
    assert out.shape == ref.shape == (1, (h_loc + 2 * hm) * n_dev, 16, 8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_halo_feeds_conv_exactly(rng):
    """The exchanged rows are the true neighbour rows: a 3x3 valid conv over
    the extended shard equals the same conv over the unsharded image."""
    from collaborative_distillation_tpu.ops.pallas.halo import (
        halo_exchange_rows_pallas,
    )

    n_dev = min(4, len(jax.devices()))
    if n_dev < 2:
        pytest.skip("needs >= 2 devices")
    mesh = _space_mesh(n_dev)
    img = jnp.asarray(rng.random((1, 8 * n_dev, 16, 4), np.float32))
    w = jnp.asarray(rng.random((3, 3, 4, 4), np.float32))

    def conv_valid(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    full = conv_valid(img)  # (1, H-2, 14, 4)

    def per_shard(x):
        ext = halo_exchange_rows_pallas(x, 1, "space", interpret=True)
        y = conv_valid(ext)
        # interior rows only: y's row r comes from ext rows r..r+2, i.e.
        # image rows (start-1+r)..; valid interior = all h_loc rows
        return y[:, : x.shape[1]]

    spec = P(None, "space", None, None)
    tiled = shard_map(per_shard, mesh=mesh, in_specs=spec, out_specs=spec,
                  check_vma=False)(img)
    # shard 0's first output row uses the zero top halo (not a real image
    # row) and the last shard's last row likewise — compare the interior
    got = np.asarray(tiled)[:, 1 : img.shape[1] - 1]
    np.testing.assert_allclose(got, np.asarray(full), rtol=1e-5, atol=1e-5)


def test_pallas_halo_race_free(rng):
    """Run the kernel under the simulator's happens-before race detector:
    the barrier + semaphore protocol must order every remote write against
    the local reads/writes it could race with."""
    from collaborative_distillation_tpu.ops.pallas.halo import (
        halo_exchange_rows_pallas,
    )

    n_dev = min(4, len(jax.devices()))
    if n_dev < 2:
        pytest.skip("needs >= 2 devices")
    mesh = _space_mesh(n_dev)
    img = jnp.asarray(rng.random((1, 8 * n_dev, 16, 8), np.float32))

    def pallas_fn(x):
        return halo_exchange_rows_pallas(x, 2, "space", interpret=True,
                                         detect_races=True)

    spec = P(None, "space", None, None)
    out = shard_map(pallas_fn, mesh=mesh, in_specs=spec, out_specs=spec,
                    check_vma=False)(img)
    ref = shard_map(lambda x: _exchange_row_halos(x, 2, "space"), mesh=mesh,
                    in_specs=spec, out_specs=spec)(img)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_halo_combined_mesh_matches_ppermute(rng):
    """Mesh-coordinate addressing on a (data=2, space) mesh: each data
    shard's exchange stays within its own row of the mesh — exactly what
    the ppermute (which only ever sees the 'space' axis) produces."""
    from collaborative_distillation_tpu.ops.pallas.halo import (
        halo_exchange_rows_pallas,
    )

    n = len(jax.devices())
    if n < 4 or n % 2:
        pytest.skip("needs an even device count >= 4")
    n_sp = n // 2
    mesh = Mesh(np.array(jax.devices()[:n]).reshape(2, n_sp),
                ("data", "space"))
    img = jnp.asarray(rng.random((2, 8 * n_sp, 16, 8), np.float32))
    spec = P("data", "space", None, None)
    hm = 2
    ref = shard_map(lambda x: _exchange_row_halos(x, hm, "space"), mesh=mesh,
                    in_specs=spec, out_specs=spec)(img)
    out = shard_map(
        lambda x: halo_exchange_rows_pallas(x, hm, "space", interpret=True,
                                            extra_vma=("data",)),
        mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False)(img)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
