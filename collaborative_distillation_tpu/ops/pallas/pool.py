"""Pallas TPU kernel: fused 2x2/2 max pool in width-packed space.

The packed pool is logically in-lane (original columns (2m, 2m+1) are
phases (2q, 2q+1) of the same packed column — ops/packed.py:
packed_max_pool_2x2), but its XLA lowering is three ops — a reduce_window
over H, a minor-dim reshape, and a max — and XLA prefers W-minor
({1,2,0}) layouts for that chain, inserting a full-map relayout copy on
BOTH sides of every pool against the C-minor ({2,1,0}) Pallas conv custom
calls around it (r4 student trace: ~8 ms per transition at the full-res
UHD shape, several per cascade).

This kernel does the whole pool in ONE pass over HBM in the conv kernels'
native (H, W, C) layout:

* H pairing is a contiguous-relabel reshape (2*bh rows -> (bh, 2)) + max
  over the pair axis;
* the phase-pair max reads CONTIGUOUS lane slices (group q of the f/2
  output groups = max of input lanes [2q*c, 2q*c+c) and [2q*c+c, 2q*c+2c))
  — static offsets, no lane gather;
* output factor is the natural f/2 (what plan_packing arranges), so no
  repack exists anywhere.

All buffers move through BlockSpec pipelines (no manual DMA), so sub-dense
channel counts ride the same contract as the stats and 1x1 kernels.

Reference math: nn.MaxPool2d(2, 2) (model_original.py, every encoder) in
packed space; parity vs ops/packed.py:packed_max_pool_2x2 is pinned in
tests/test_pallas_conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["packed_pool_lane", "pick_pool_blocks", "try_packed_pool_pallas",
           "packed_upsample_lane", "try_packed_upsample_pallas"]

_LANES = 128
# same calibrated ceiling as the conv kernels (ops/pallas/conv.py)
_VMEM_BUDGET = 14 * 1024 * 1024


def _pool_kernel(x_ref, o_ref, *, f: int, c: int):
    bh2, bw, fc = x_ref.shape
    bh = bh2 // 2
    xb = x_ref[:].reshape(bh, 2, bw, fc)
    hmax = jnp.maximum(xb[:, 0], xb[:, 1])        # (bh, bw, fc)
    if f == 1:
        # unpacked W pooling: adjacent columns (even/odd) — contiguous
        # sublane-dim relabel, same trick as the H pairing
        w2 = hmax.reshape(bh, bw // 2, 2, fc)
        o_ref[:] = jnp.maximum(w2[:, :, 0], w2[:, :, 1])
        return
    groups = [jnp.maximum(hmax[..., 2 * q * c:(2 * q + 1) * c],
                          hmax[..., (2 * q + 1) * c:(2 * q + 2) * c])
              for q in range(f // 2)]
    o_ref[:] = groups[0] if len(groups) == 1 else jnp.concatenate(groups, axis=-1)


def pick_pool_blocks(h2: int, wp: int, fc: int, itemsize: int):
    """(block_h_out, block_w) whose in/out blocks fit VMEM, or None.
    ``h2`` = pooled (output) height; the input block is 2x taller.

    The model counts the kernel's live VALUES, not just the pipeline
    buffers: 2 pipelined input blocks + the x_ref[:] load + the H-max +
    group/concat staging + 2 pipelined output blocks. Anchored to the
    on-chip probe at (2048, 256, 128) f=8: (bh=16, bw=256) crashes the
    compiler, (8, 256) and (16, 128) compile — the enriched model's cut
    line; the 2-buffer model accepted the crash config at 10.9 MB."""
    sub = 8 if itemsize == 4 else 16
    bws = [wp] + [wp // d for d in (2, 4, 8)
                  if wp % d == 0 and (wp // d) % sub == 0]
    half = fc // 2 or fc
    for bw in bws:
        for bh in (16, 8, 4, 2, 1):
            if h2 % bh:
                continue
            inb = 2 * bh * bw * fc          # one input block (2*bh rows)
            need = (2 * inb + inb            # pipeline + x_ref[:] value
                    + bh * bw * fc           # hmax
                    + 2 * bh * bw * half     # group values + concat
                    + 2 * bh * bw * half) * itemsize  # output pipeline
            if int(need * 1.15) <= _VMEM_BUDGET:
                return bh, bw
    return None


@functools.partial(jax.jit, static_argnames=("f", "c", "block_h", "block_w",
                                              "interpret"))
def packed_pool_lane(x: jax.Array, *, f: int, c: int, block_h: int,
                     block_w: int, interpret: bool = False) -> jax.Array:
    """(H, Wp, f*C) packed map -> (H//2, Wp, (f//2)*C) pooled map (f >= 2),
    or (H, W, C) -> (H//2, W//2, C) when f == 1 (plain unpacked pool)."""
    h, wp, fc = x.shape
    assert fc == f * c, (x.shape, f, c)
    h2 = h // 2
    x = x[: h2 * 2]
    if f == 1:
        out_shape = (h2, wp // 2, c)
        out_spec = pl.BlockSpec((block_h, block_w // 2, c),
                                lambda i, j: (i, j, 0))
    else:
        out_shape = (h2, wp, (f // 2) * c)
        out_spec = pl.BlockSpec((block_h, block_w, (f // 2) * c),
                                lambda i, j: (i, j, 0))
    return pl.pallas_call(
        functools.partial(_pool_kernel, f=f, c=c),
        grid=(h2 // block_h, wp // block_w),
        in_specs=[pl.BlockSpec((2 * block_h, block_w, fc),
                               lambda i, j: (i, j, 0))],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        name="packed_pool_lane",
        interpret=interpret,
    )(x)


def _upsample_kernel(x_ref, o_ref, *, f: int, c: int):
    bh, bw, fc = x_ref.shape
    xb = x_ref[:]
    # in-lane phase duplication: out phase pair (2q, 2q+1) = in phase q —
    # contiguous lane slices, no gather (mirror of the pool's pair max)
    parts = []
    for q in range(f):
        g = xb[..., q * c:(q + 1) * c]
        parts += [g, g]
    lanes = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    # H duplication: outer-dim broadcast + contiguous outer merge (free)
    y = jnp.broadcast_to(lanes[:, None], (bh, 2, bw, 2 * fc))
    o_ref[:] = y.reshape(2 * bh, bw, 2 * fc)


@functools.partial(jax.jit, static_argnames=("f", "c", "block_h", "block_w",
                                              "interpret"))
def packed_upsample_lane(x: jax.Array, *, f: int, c: int, block_h: int,
                         block_w: int, interpret: bool = False) -> jax.Array:
    """(H, Wp, f*C) packed map -> (2H, Wp, 2f*C): nearest 2x upsample whose
    W doubling is the in-lane phase duplication plan_packing arranges
    (ops/packed.py:packed_upsample_nearest_2x, out_f == 2f branch)."""
    h, wp, fc = x.shape
    assert fc == f * c, (x.shape, f, c)
    return pl.pallas_call(
        functools.partial(_upsample_kernel, f=f, c=c),
        grid=(h // block_h, wp // block_w),
        in_specs=[pl.BlockSpec((block_h, block_w, fc),
                               lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((2 * block_h, block_w, 2 * fc),
                               lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((2 * h, wp, 2 * fc), x.dtype),
        name="packed_upsample_lane",
        interpret=interpret,
    )(x)


def pick_upsample_blocks(h: int, wp: int, fc: int, itemsize: int):
    """(block_h, block_w) whose in (bh, bw, fc) + out (2bh, bw, 2fc) blocks
    fit VMEM, or None. Live-value accounting like :func:`pick_pool_blocks`:
    input pipeline + x_ref[:] + lane-duplicated value + broadcast value +
    output pipeline."""
    sub = 8 if itemsize == 4 else 16
    bws = [wp] + [wp // d for d in (2, 4, 8)
                  if wp % d == 0 and (wp // d) % sub == 0]
    for bw in bws:
        for bh in (16, 8, 4, 2, 1):
            if h % bh:
                continue
            px = bh * bw * fc
            need = (2 * px + px      # input pipeline + x_ref[:] value
                    + 2 * px         # lane-duplicated value
                    + 4 * px         # H-broadcast value
                    + 2 * 4 * px) * itemsize  # output pipeline (2bh, bw, 2fc)
            if int(need * 1.15) <= _VMEM_BUDGET:
                return bh, bw
    return None


def try_packed_upsample_pallas(x: jax.Array, f: int, out_f: int) -> jax.Array | None:
    """Router for the fused upsample: single-image TPU maps taking the
    natural out_f == 2f in-lane duplication. None -> XLA lowering."""
    from .conv import kernel_compiles, pallas_conv_enabled

    n, h, wp, fc = x.shape
    c = fc // f
    sub = 8 if x.dtype.itemsize == 4 else 16
    if not (n == 1 and out_f == 2 * f and 2 * fc <= _LANES
            and c % sub == 0 and fc % sub == 0
            and pallas_conv_enabled()
            and jax.default_backend() == "tpu"):
        return None
    blocks = pick_upsample_blocks(h, wp, fc, x.dtype.itemsize)
    if blocks is None:
        return None
    bh, bw = blocks
    if not kernel_compiles(
            packed_upsample_lane,
            (jax.ShapeDtypeStruct((h, wp, fc), x.dtype),),
            f=f, c=c, block_h=bh, block_w=bw):
        return None
    return packed_upsample_lane(x[0], f=f, c=c, block_h=bh, block_w=bw)[None]


def try_packed_pool_pallas(x: jax.Array, f: int, out_f: int) -> jax.Array | None:
    """Router: single-image TPU maps whose natural pooled factor matches
    ``out_f`` (f//2 for packed, 1 for unpacked) route to the fused kernel;
    None -> caller uses the XLA lowering. Shares the conv kill switches and
    the per-shape AOT compile probe."""
    from .conv import kernel_compiles, pallas_conv_enabled

    n, h, wp, fc = x.shape
    c = fc // f
    want = 1 if f == 1 else f // 2
    sub = 8 if x.dtype.itemsize == 4 else 16
    # f == 1 (unpacked W pooling) stays on XLA: its in-kernel sublane-dim
    # regroup fails Mosaic compilation on the real chip (probe-verified at
    # (2048, 256, 128)), and the f == 1 pools live at the deep, small map
    # scales where the relayout cost this kernel removes is negligible.
    if not (n == 1 and f % 2 == 0 and out_f == want and h >= 2
            and fc % sub == 0 and c % sub == 0
            and pallas_conv_enabled()
            and jax.default_backend() == "tpu"):
        return None
    blocks = pick_pool_blocks(h // 2, wp, fc, x.dtype.itemsize)
    if blocks is None:
        return None
    bh, bw = blocks
    if not kernel_compiles(
            packed_pool_lane,
            (jax.ShapeDtypeStruct((h, wp, fc), x.dtype),),
            f=f, c=c, block_h=bh, block_w=bw):
        return None
    return packed_pool_lane(x[0], f=f, c=c, block_h=bh, block_w=bw)[None]
