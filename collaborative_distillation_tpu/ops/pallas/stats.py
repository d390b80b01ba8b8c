"""Pallas TPU kernel: single-pass fused feature statistics.

Computes ``sum(x)`` and the Gram matrix ``x^T x`` of a (P, C) feature matrix
in ONE pass over HBM, accumulating in VMEM scratch across a 1-D grid of row
blocks. XLA computes the same quantities as two separate reductions over the
feature map (multi-output fusion is not guaranteed at these shapes); for the
WCT covariance over a 42 MPix stage-1 feature map the input is ~4 GB, so one
pass vs two is a straight bandwidth win.

The caller zero-pads P up to the block size (zero rows change neither sum nor
gram). Channel counts need NOT be lane-dense: any C that is a multiple of the
8-sublane tile works (the (P, C) operands put C on the lanes; Mosaic masks the
partial minor tile in both the VPU sum and the MXU gram). The slab cascade
routes its sub-dense stage widths here too — 96 (stage-1 SE width 24 packed
x4 at the slab's deepest factor) and 24/64 transition maps — which is pinned
against the XLA two-reduction path at exactly those widths in
tests/test_pallas_stats.py. C not divisible by 8 must be padded by the caller
(wct/slab.py gates on C % 8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_sum_gram", "pallas_feature_stats"]


def _stats_kernel(x_ref, sum_ref, gram_ref, acc_sum, acc_gram):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_sum[:] = jnp.zeros_like(acc_sum)
        acc_gram[:] = jnp.zeros_like(acc_gram)

    x = x_ref[:]
    acc_sum[:] += jnp.sum(x, axis=0, keepdims=True)
    # HIGHEST: full-f32 MXU passes. Every other stats path (slab, spatial,
    # wct_transform) accumulates the covariance at HIGHEST; the default
    # (bf16-mantissa passes) would silently feed a reduced-precision gram
    # into eigh at UHD pixel counts. The kernel is bandwidth-bound, so the
    # extra MXU passes are free (measured: same throughput).
    acc_gram[:] += lax.dot_general(
        x, x, (((0,), (0,)), ((), ())), precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        sum_ref[:] = acc_sum[:]
        gram_ref[:] = acc_gram[:]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_sum_gram(x: jax.Array, *, block_rows: int = 4096,
                   interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """x: (P, C) float -> (sum (C,), gram (C, C)) in f32, one HBM pass."""
    p, c = x.shape
    x = x.astype(jnp.float32)
    # scoped VMEM is 16 MB. Measured scoped-allocation sizes on the remote
    # v5e compiler: (C=512, 4096 rows) -> 33.2 MB, (C=512, 1280) -> 16.2 MB,
    # (C=256, 2680) -> 16.1 MB — consistent with ~12 B per row-channel of
    # slope plus a ~8.5 MB width-independent staging cost. The 4096-row
    # default is production-proven at student widths (C <= 128); for wider
    # (teacher) channels cap the block to keep the estimate under ~14 MB.
    if c > 128:
        block_rows = min(block_rows,
                         max(256, (5_500_000 // (12 * c)) // 8 * 8))
    pad = (-p) % block_rows
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    n_blocks = x.shape[0] // block_rows
    s, g = pl.pallas_call(
        _stats_kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((block_rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((c, c), jnp.float32),
        ],
        interpret=interpret,
    )(x)
    return s[0], g


def pallas_feature_stats(feat: jax.Array, *, block_rows: int = 4096,
                         interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Drop-in for :func:`..wct_transform.feature_stats` built on the fused
    kernel: (mean (C,), cov (C,C)) with the same /(P-1) normalization."""
    c = feat.shape[-1]
    x = feat.reshape(-1, c)
    p = x.shape[0]
    s, g = fused_sum_gram(x, block_rows=block_rows, interpret=interpret)
    mean = s / p
    cov = (g - p * jnp.outer(mean, mean)) / (p - 1)
    return mean, cov
