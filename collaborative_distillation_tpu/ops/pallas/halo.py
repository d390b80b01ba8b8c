"""Pallas TPU kernel: row-halo exchange over ICI via remote DMA.

Prototype for the multi-chip spatial-tiling path's halo exchange
(`parallel/spatial.py:_exchange_row_halos`, today a pair of XLA
``lax.ppermute``\\ s). Written directly against the inter-chip RDMA
primitives (``pltpu.make_async_remote_copy``) so the transfer can later be
overlapped with interior compute inside one kernel — XLA's ppermute is a
standalone collective that serializes with the convs that consume it.

Exchange pattern (SPMD over a row-sharded image, mesh axis ``space``):

* shard d sends its BOTTOM ``hm`` rows to shard d+1's top-halo region and
  its TOP ``hm`` rows to shard d-1's bottom-halo region — two RDMAs per
  shard, both riding ICI neighbour links;
* global-edge halos are zero-filled (identical contract to
  ``_exchange_row_halos``: callers' slab index arithmetic never reads them);
* a neighbour barrier precedes the writes so no shard's halo region is
  written before its kernel owns the buffer.

Semantics are validated against the ppermute implementation on a virtual
multi-device CPU mesh in TPU **interpret mode** (``tests/test_pallas_halo.py``)
— remote DMAs are simulated, on space-only AND combined (data, space) meshes
(neighbour addressing is by mesh coordinate). The kernel is wired into the
production multi-chip cascade behind ``build_tiled_slab_cascade(...,
halo="pallas")`` / ``WCTEngine(halo="pallas")``; ``ppermute`` stays the
default because measuring an ICI win needs real multi-chip hardware, which
this container does not have (one TPU chip).

Reference point: the reference has no multi-device story at all
(/root/reference/PytorchWCT/WCT.py:97 — single `.cuda()` placement).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["halo_exchange_rows_pallas"]


def _halo_kernel(x_ref, zeros_ref, out_ref,
                 loc_sem, send_r, recv_r, send_l, recv_l,
                 *, hm: int, axis_name: str):
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    h = x_ref.shape[1]
    has_left = idx > 0
    has_right = idx < n - 1

    # interior: out[:, hm:hm+h] = x  (HBM->HBM local DMA; overlaps the RDMAs)
    center = pltpu.make_async_copy(x_ref, out_ref.at[:, pl.ds(hm, h)], loc_sem)
    center.start()

    # neighbour addressing is by MESH COORDINATE dict: only the ``space``
    # coordinate is given, every other mesh axis (e.g. ``data`` on a combined
    # serving mesh) defaults to the sender's own index — so the exchange
    # stays within the correct data shard on any (data, space) mesh.
    left_id = {axis_name: jnp.maximum(idx - 1, 0)}
    right_id = {axis_name: jnp.minimum(idx + 1, n - 1)}

    # neighbour barrier: nobody writes into a halo region before its owner
    # has entered the kernel (the remote write lands in out_ref)
    barrier = pltpu.get_barrier_semaphore()

    @pl.when(has_left)
    def _sig_l():
        pltpu.semaphore_signal(barrier, 1, device_id=left_id,
                               device_id_type=pltpu.DeviceIdType.MESH)

    @pl.when(has_right)
    def _sig_r():
        pltpu.semaphore_signal(barrier, 1, device_id=right_id,
                               device_id_type=pltpu.DeviceIdType.MESH)

    pltpu.semaphore_wait(barrier, has_left.astype(jnp.int32)
                         + has_right.astype(jnp.int32))

    # my bottom rows -> right neighbour's TOP halo (matches ppermute
    # [(i, i+1)] on img[:, -hm:])
    rdma_right = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[:, pl.ds(h - hm, hm)],
        dst_ref=out_ref.at[:, pl.ds(0, hm)],
        send_sem=send_r, recv_sem=recv_r,
        device_id=right_id,
        device_id_type=pltpu.DeviceIdType.MESH)
    # my top rows -> left neighbour's BOTTOM halo ([(i+1, i)] on img[:, :hm])
    rdma_left = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[:, pl.ds(0, hm)],
        dst_ref=out_ref.at[:, pl.ds(hm + h, hm)],
        send_sem=send_l, recv_sem=recv_l,
        device_id=left_id,
        device_id_type=pltpu.DeviceIdType.MESH)

    @pl.when(has_right)
    def _send_right():
        rdma_right.start()

    @pl.when(has_left)
    def _send_left():
        rdma_left.start()

    # global edges: zero-fill the halo that has no neighbour
    @pl.when(jnp.logical_not(has_left))
    def _zero_top():
        z = pltpu.make_async_copy(zeros_ref, out_ref.at[:, pl.ds(0, hm)], loc_sem)
        z.start()
        z.wait()

    @pl.when(jnp.logical_not(has_right))
    def _zero_bot():
        z = pltpu.make_async_copy(zeros_ref, out_ref.at[:, pl.ds(hm + h, hm)],
                                  loc_sem)
        z.start()
        z.wait()

    # (a fused halo+conv kernel would run the interior convolution HERE,
    # while the halo RDMAs are in flight)

    @pl.when(has_right)
    def _wait_send_right():
        rdma_right.wait_send()

    @pl.when(has_left)
    def _wait_send_left():
        rdma_left.wait_send()

    # incoming halos: my TOP halo arrives on recv_r (sent by d-1's
    # rdma_right), my BOTTOM halo on recv_l (sent by d+1's rdma_left)
    @pl.when(has_left)
    def _wait_recv_top():
        rdma_right.wait_recv()

    @pl.when(has_right)
    def _wait_recv_bot():
        rdma_left.wait_recv()

    center.wait()


@functools.partial(jax.jit, static_argnames=("hm", "axis_name", "interpret",
                                             "detect_races", "extra_vma"))
def halo_exchange_rows_pallas(img: jax.Array, hm: int, axis_name: str,
                              *, interpret: bool = False,
                              detect_races: bool = False,
                              extra_vma: tuple = ()) -> jax.Array:
    """(N, H_loc, W, C) row shard -> (N, H_loc + 2*hm, W, C) with ``hm``
    rows from each mesh neighbour (zero fill at global edges). Must be
    called inside ``shard_map`` over ``axis_name``. Neighbours are addressed
    by MESH COORDINATE (``{axis_name: idx±1}``, other mesh axes defaulting
    to the sender's own index), so the exchange is correct on combined
    meshes — e.g. the (data, space) serving mesh — not just a space-only
    one. ``extra_vma``: further mesh axes the data varies over (e.g.
    ``("data",)``), so shard_map's varying-axes check passes without being
    disabled. Drop-in for ``parallel.spatial._exchange_row_halos``."""
    n, h, w, c = img.shape
    assert h >= hm > 0, (h, hm)
    zeros = jnp.zeros((n, hm, w, c), img.dtype)
    kernel = functools.partial(_halo_kernel, hm=hm, axis_name=axis_name)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, h + 2 * hm, w, c), img.dtype,
                                       vma=frozenset({axis_name, *extra_vma})),
        scratch_shapes=[pltpu.SemaphoreType.DMA] * 5,
        compiler_params=pltpu.CompilerParams(collective_id=7),
        # interpret=True selects the TPU *simulator* (DMAs, semaphores and
        # remote copies modeled; optional happens-before race detection),
        # not the generic HLO interpreter
        interpret=(pltpu.InterpretParams(detect_races=detect_races)
                   if interpret else False),
    )(img, zeros)
    return out
