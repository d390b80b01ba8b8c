"""Width-packed convolutions: lane-dense layouts for skinny VGG layers.

TPU arrays tile their minor-most dimension onto 128 hardware lanes. The 16x
students' early layers have 16-32 channels, so NHWC feature maps waste up to
8x of every HBM byte and MXU tile on lane padding — measured: a single
full-UHD C=16 conv allocates 21.5 GB for a 2.7 GB logical tensor.

The fix: pack F adjacent *columns* into the channel dimension so the minor
dim is F*C ≈ 128 ("phase-major": channel index = p*C + c for column phase p).
A stride-1 3x3 conv on the unpacked image is *exactly* a 3x3 conv on the
packed image with a block-structured kernel (mostly zeros):

    out[col j, phase q] sums taps at original columns j*F+q+dx, dx in -1..1,
    which live in packed columns j-1, j, j+1 at phases (q+dx) mod F
    => W_packed[kh, (j'-j)+1, p*C+c, q*Co+co] = w[kh, dx+1, c, co]
       where p = (q+dx) mod F and j'-j = (q+dx) // F  (in {-1,0,1}).

The dense packed kernel does F times the MACs, but on a systolic array that
previously idled (128-C)/128 of its lanes the *time* is the same — while HBM
traffic drops F-fold. Pooling, nearest-upsampling and repacking are pure
reshapes in packed space. All of this is plain XLA; no custom kernels needed.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "pack_width",
    "unpack_width",
    "pack_conv3x3_weights",
    "packed_conv1x1",
    "packed_conv3x3",
    "packed_max_pool_2x2",
    "packed_upsample_nearest_2x",
    "repack",
]


def pack_width(x: jax.Array, f: int) -> jax.Array:
    """(N, H, W, C) -> (N, H, W/f, f*C), phase-major channels."""
    if f == 1:
        return x
    n, h, w, c = x.shape
    assert w % f == 0, (w, f)
    return x.reshape(n, h, w // f, f * c)


def unpack_width(x: jax.Array, f: int) -> jax.Array:
    """(N, H, Wp, f*C) -> (N, H, Wp*f, C)."""
    if f == 1:
        return x
    n, h, wp, fc = x.shape
    return x.reshape(n, h, wp * f, fc // f)


def repack(x: jax.Array, f_from: int, f_to: int) -> jax.Array:
    """Change the packing factor (both powers of two)."""
    if f_from == f_to:
        return x
    return pack_width(unpack_width(x, f_from), f_to)


def pack_conv3x3_weights(w: np.ndarray, b: np.ndarray, f: int):
    """(3,3,C,Co) HWIO + (Co,) -> packed (3,3,f*C,f*Co) + (f*Co,).

    Host-side, done once at load time.
    """
    w = np.asarray(w)
    b = np.asarray(b)
    kh, kw, c, co = w.shape
    assert kh == kw == 3
    if f == 1:
        return w, b
    wp = np.zeros((3, 3, f * c, f * co), w.dtype)
    for q in range(f):
        for dx in (-1, 0, 1):
            p = (q + dx) % f
            dj = (q + dx) // f if (q + dx) >= 0 else -1
            wp[:, dj + 1, p * c:(p + 1) * c, q * co:(q + 1) * co] = w[:, dx + 1]
    bp = np.tile(b, f)
    return wp, bp


def _reflect_pad_w_packed(x: jax.Array, f: int) -> jax.Array:
    """Packed-space equivalent of a 1-column reflect pad.

    Only one phase of each pad column is ever read by the packed kernel
    (phase f-1 on the left = original column -1 -> reflects to column 1 =
    packed col 0 phase 1; phase 0 on the right -> original column W -> W-2).
    We build full pad columns with those phases correct.
    """
    n, h, wp, fc = x.shape
    c = fc // f
    if f == 1:
        return jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
    left = jnp.zeros((n, h, 1, fc), x.dtype)
    # left pad col, phase f-1 <- packed col 0, phase 1 (original column 1)
    left = left.at[..., (f - 1) * c:].set(x[:, :, :1, c:2 * c])
    right = jnp.zeros((n, h, 1, fc), x.dtype)
    # right pad col, phase 0 <- packed col -1, phase f-2 (original col W-2)
    right = right.at[..., :c].set(x[:, :, -1:, (f - 2) * c:(f - 1) * c])
    return jnp.concatenate([left, x, right], axis=2)


def packed_conv1x1(x: jax.Array, w: jax.Array, b: jax.Array | None,
                   *, relu: bool = False) -> jax.Array:
    """1x1 conv + bias in packed space: the encoders' kron-packed ``conv0``
    preprocessing (models/packed_vgg.py:pack_stage_params).

    On TPU this routes to the Pallas per-pixel matmul kernel — XLA runs the
    1x1 as a convolution in its exotic {3,0,2,1} feature layout, which both
    costs ~20 ms at full UHD res and forces ~12 ms transpose copies against
    the Pallas 3x3 calls around it. Same channel-padding contract as
    :func:`packed_conv3x3`.
    """
    fc = x.shape[-1]
    fco = w.shape[-1]
    from .pallas.conv import try_conv1x1_pallas
    y = try_conv1x1_pallas(x, w.reshape(fc, fco), b, relu=relu)
    if y is not None:
        return y
    kwargs = ({"preferred_element_type": jnp.float32}
              if x.dtype == jnp.float32 else {})
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kwargs)
    if b is not None:
        y = y + b.astype(y.dtype)
    y = y.astype(x.dtype)
    if relu:
        y = jnp.maximum(y, 0)
    return y


def _pallas_conv_enabled() -> bool:
    """Back-compat alias for ops.pallas.conv.pallas_conv_enabled (the master
    gate now also honors CD_TPU_PALLAS and the engine's runtime kill
    switch)."""
    from .pallas.conv import pallas_conv_enabled
    return pallas_conv_enabled()


def packed_conv3x3(x: jax.Array, w_packed: jax.Array, b_packed: jax.Array | None,
                   f: int, *, relu: bool = True) -> jax.Array:
    """Reflect-pad + 3x3 conv + optional relu, in width-packed space.

    On TPU, single-image maps route to the Pallas direct-conv kernels
    (ops/pallas/conv.py), W-tiled kernel first, whole-row kernel as the
    fallback: direct convs in the native (H, W, C) layout measured 3-4x
    faster than the XLA conv lowering at every UHD cascade shape because
    they skip XLA's per-conv relayout copies AND the materialised reflect
    pads, and the tiled variant beat the whole-row one at every measured
    shape on top (full-cascade A/B 0.63 vs 0.68 s UHD f32). Everything
    else (batched training inputs, shapes both pickers decline) takes the
    XLA path below.

    ``x``: (N, H, Wp, f*C); H is reflect-padded normally, W via the packed
    pad-column construction. Uses default (bf16) MXU precision with f32
    accumulation — the conv path's speed mode.

    On the XLA path the pads are MATERIALISED on purpose. A "fused zero-pad
    conv + O(H+W) sliver corrections added into the output edges" variant
    was built and measured at UHD: 2.011 s vs 1.696 s for this version —
    the four edge ``.at[].add`` updates and sliver convs broke XLA's
    conv/elementwise fusion and cost far more than the two pad copies they
    removed (the pad concats fuse into the surrounding elementwise
    pipeline; they are not standalone full-map copies in the trace).
    """
    n, h, wp, fc = x.shape
    fco = w_packed.shape[-1]
    if (n == 1 and _pallas_conv_enabled()
            and jax.default_backend() == "tpu"):
        from .pallas.conv import (_LANES, conv3x3_lane128, kernel_compiles,
                                  make_pad_columns, supported,
                                  try_conv3x3_tiled)
        # Tiled-first: the W-tiled kernel beats the whole-row kernel at
        # EVERY measured cascade shape, including the lane128 shapes whose
        # staged whole-row plan fits VMEM (isolated 12.4 vs 14.0 ms at the
        # whole-row's home shape; full-cascade A/B 0.63 vs 0.68 s at UHD
        # f32) — its column blocks keep the working set small enough for
        # better DMA/compute overlap. The whole-row kernel stays below as
        # the fallback for shapes the tiled picker or its compile probe
        # declines.
        y = try_conv3x3_tiled(
            x, w_packed.reshape(3, 3, fc, fco), b_packed, relu=relu, f=f,
            pad_channels=True)
        if y is not None:
            return y
        plan = supported(h, wp, fc, fco, x.dtype.itemsize)
        if plan is not None:
            bh, staged = plan
            li = -(-fc // _LANES) * _LANES
            lo = -(-fco // _LANES) * _LANES
            if not kernel_compiles(
                    conv3x3_lane128,
                    (jax.ShapeDtypeStruct((h, wp, li), x.dtype),
                     jax.ShapeDtypeStruct((h + 2, 16, li), x.dtype),
                     jax.ShapeDtypeStruct((9, li, lo), x.dtype),
                     jax.ShapeDtypeStruct((lo,), x.dtype)),
                    relu=relu, block_h=bh, staged=staged):
                plan = None
        if plan is not None:
            # Mosaic requires sliced-DMA lane dims to be whole 128-lane
            # tiles, so sub-dense transition maps (12/24/64/96 channels)
            # are zero-padded to 128 around the kernel. The pad/slice
            # copies cost ~2 ms each at full UHD res vs the ~41 ms XLA
            # conv they displace; zero weight rows keep the math exact.
            ci_pad, co_pad = -fc % 128, -fco % 128
            xk = x[0]
            plr = make_pad_columns(xk, f)
            w9 = w_packed.reshape(9, fc, fco)
            bk = b_packed
            if ci_pad:
                xk = jnp.pad(xk, ((0, 0), (0, 0), (0, ci_pad)))
                plr = jnp.pad(plr, ((0, 0), (0, 0), (0, ci_pad)))
                w9 = jnp.pad(w9, ((0, 0), (0, ci_pad), (0, 0)))
            if co_pad:
                w9 = jnp.pad(w9, ((0, 0), (0, 0), (0, co_pad)))
                if bk is not None:
                    bk = jnp.pad(bk, (0, co_pad))
            y = conv3x3_lane128(xk, plr, w9, bk, relu=relu, block_h=bh,
                                staged=staged)
            if co_pad:
                y = y[..., :fco]
            return y[None]
    x = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="reflect")
    x = _reflect_pad_w_packed(x, f)
    # f32 accumulation is requested explicitly only for f32 inputs; for bf16
    # the MXU accumulates f32 natively and must EMIT bf16 — requesting an
    # f32 output materialises full f32 feature maps (the convert does not
    # fuse back into the conv on TPU), which was measured to erase the
    # entire bandwidth saving of the bf16 engine (same contract as conv2d).
    kwargs = ({"preferred_element_type": jnp.float32}
              if x.dtype == jnp.float32 else {})
    y = lax.conv_general_dilated(
        x, w_packed.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kwargs,
    )
    if b_packed is not None:
        y = y + b_packed.astype(y.dtype)
    y = y.astype(x.dtype)
    if relu:
        y = jnp.maximum(y, 0)
    return y


def packed_max_pool_2x2(x: jax.Array, f: int, out_f: int | None = None) -> jax.Array:
    """2x2/2 max pool in packed space: H via reduce_window, W via a
    phase-pair max (in-lane).

    Original columns (2m, 2m+1) are phases (2q, 2q+1) of the SAME packed
    column, so the pair max is an in-lane reduction that naturally halves
    the packing factor. ``out_f`` selects the output factor:

    * ``out_f == f`` (the default, backward-compatible contract): repack
      the f/2 result back up to f. Still beats the old cross-column
      regroup ((wp/2, 2f) reshape) by ~37% (9.2 -> 5.8 ms on an 805 MB
      map, fori-loop differenced): the regroup splits a major dim and
      forces an XLA layout copy of the whole map.
    * ``out_f == f//2``: return the natural f/2 result with NO repack at
      all — zero layout work. This is what :func:`plan_packing` arranges:
      in the VGG ladder channels double right after every pool, so f/2 is
      exactly the next conv's factor and the repack (and its layout copy)
      vanishes from the program.
    """
    n, h, wp, fc = x.shape
    c = fc // f
    if out_f is None:
        out_f = f
    # fused single-pass Pallas pool in the conv kernels' native (H, W, C)
    # layout: the XLA chain below (reduce_window + minor reshape + max)
    # prefers W-minor layouts and forces a full-map relayout copy on both
    # sides of every pool against the C-minor Pallas convs around it
    # (r4 trace: ~8 ms per transition at the full-res UHD shape)
    from .pallas.pool import try_packed_pool_pallas
    y = try_packed_pool_pallas(x, f, out_f)
    if y is not None:
        return y
    x = x[:, : (h // 2) * 2]
    # H pooling
    x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 1, 1), (1, 2, 1, 1), "VALID")
    if f == 1:
        assert out_f == 1, (f, out_f)
        return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2, 1), (1, 1, 2, 1), "VALID")
    assert out_f in (f, f // 2), (f, out_f)
    x = x.reshape(n, h // 2, wp, f // 2, 2, c).max(axis=4)
    x = x.reshape(n, h // 2, wp, (f // 2) * c)
    return x if out_f == f // 2 else repack(x, f // 2, f)


def packed_upsample_nearest_2x(x: jax.Array, f: int, out_f: int | None = None) -> jax.Array:
    """Nearest 2x upsample in packed space (phases duplicate pairwise).

    ``out_f`` selects the output factor:

    * ``out_f == f`` (default): duplicated phases regroup into twice the
      packed columns — the backward-compatible contract.
    * ``out_f == 2*f``: phases duplicate IN-LANE (a pure minor-dim
      broadcast, no column regroup, no layout copy) and the packed column
      count stays put. :func:`plan_packing` arranges this: in the VGG
      ladder channels halve right before every unpool, so 2f is exactly
      the next conv's factor.
    """
    n, h, wp, fc = x.shape
    c = fc // f
    if out_f is None:
        out_f = f
    if out_f == 2 * f:
        # fused single-pass Pallas upsample in the conv kernels' native
        # layout (mirror of the pool: the XLA repeat/broadcast chain seeds
        # W-minor layout preferences around the C-minor Pallas convs)
        from .pallas.pool import try_packed_upsample_pallas
        y = try_packed_upsample_pallas(x, f, out_f)
        if y is not None:
            return y
    x = jnp.repeat(x, 2, axis=1)
    if out_f == 2 * f:
        x = x.reshape(n, 2 * h, wp, f, 1, c)
        x = jnp.broadcast_to(x, (n, 2 * h, wp, f, 2, c))
        return x.reshape(n, 2 * h, wp, 2 * f * c)
    assert out_f == f, (f, out_f)
    if f == 1:
        return jnp.repeat(x, 2, axis=2)
    x = x.reshape(n, 2 * h, wp, f, 1, c)
    x = jnp.broadcast_to(x, (n, 2 * h, wp, f, 2, c))
    return x.reshape(n, 2 * h, wp * 2, f * c)
