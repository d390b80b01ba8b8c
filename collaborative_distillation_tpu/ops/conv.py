"""Core image-network ops for TPU (NHWC layout).

These are the TPU-native equivalents of the reference's framework-provided
primitives (reference: model/model_original.py:434-450 uses
nn.ReflectionPad2d + nn.Conv2d + nn.ReLU, nn.MaxPool2d(2,2),
nn.UpsamplingNearest2d(scale_factor=2)).

Design notes
------------
* NHWC activations / HWIO weights: the natural TPU layout — the channel
  dimension lands on the 128-wide lane axis so 3x3 convs tile onto the MXU.
* All functions are pure and shape-polymorphic; jit at the call site.
* ``conv2d`` uses ``preferred_element_type=float32`` so bf16 inputs still
  accumulate in f32 on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "reflect_pad",
    "conv2d",
    "conv3x3",
    "conv1x1",
    "max_pool_2x2",
    "max_pool_2x2_with_argmax",
    "max_unpool_2x2",
    "upsample_nearest_2x",
]


def reflect_pad(x: jax.Array, pad: int = 1) -> jax.Array:
    """Reflection-pad H and W of an NHWC tensor (torch ReflectionPad2d((p,p,p,p)))."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def conv2d(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """VALID conv, NHWC x HWIO -> NHWC, f32 accumulation on the MXU.

    For f32 inputs the f32 accumulation is requested explicitly; for bf16
    the MXU accumulates in f32 natively and rounds at the output, and we
    must NOT request an f32 output — jax's conv transpose rule cannot pair
    the resulting f32 cotangent with bf16 operands, which would break
    mixed-precision training (jax 0.9 TypeError in the backward pass).
    """
    kwargs = ({"preferred_element_type": jnp.float32}
              if x.dtype == jnp.float32 else {})
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        **kwargs,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def conv3x3(x: jax.Array, w: jax.Array, b: jax.Array | None = None, *,
            relu: bool = True, pallas: bool = False) -> jax.Array:
    """Reflect-pad(1) + 3x3 VALID conv (+ optional ReLU): the reference's
    universal conv block (e.g. model_original.py:494 ``relu(conv(pad(x)))``).

    ``pallas=True`` (inference paths only — pallas_call has no autodiff
    rule) tries the tiled direct kernel first for single-image teacher-width
    maps (ops/pallas/conv.py:conv3x3_tiled); every out-of-scope shape falls
    back to this XLA lowering."""
    if pallas:
        from .pallas.conv import try_conv3x3_tiled
        y = try_conv3x3_tiled(x, w, b, relu=relu)
        if y is not None:
            return y
    y = conv2d(reflect_pad(x, 1), w, b)
    if relu:
        y = jnp.maximum(y, 0)
    return y


def conv1x1(x: jax.Array, w: jax.Array, b: jax.Array | None = None, *, relu: bool = False) -> jax.Array:
    """1x1 conv, no padding — used for ``conv0`` preprocessing and aux adapters."""
    y = conv2d(x, w, b)
    if relu:
        y = jnp.maximum(y, 0)
    return y


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2/stride-2 max pool with floor semantics (torch MaxPool2d(2,2) default).

    Odd trailing rows/cols are dropped, matching ceil_mode=False.
    """
    n, h, w, c = x.shape
    x = x[:, : (h // 2) * 2, : (w // 2) * 2, :]
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def max_pool_2x2_with_argmax(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Max pool that also returns the in-window argmax (0..3), for the
    photo-WCT ``forward_pwct`` paths (model_cd.py:443-449).

    The index encodes (dy*2 + dx) of the winning element in each 2x2 window.
    """
    n, h, w, c = x.shape
    x = x[:, : (h // 2) * 2, : (w // 2) * 2, :]
    h2, w2 = x.shape[1] // 2, x.shape[2] // 2
    # (N, h2, 2, w2, 2, C) -> windows on axes 2, 4
    xw = x.reshape(n, h2, 2, w2, 2, x.shape[3]).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(n, h2, w2, 4, x.shape[3])
    idx = jnp.argmax(xw, axis=3).astype(jnp.int32)
    pooled = jnp.max(xw, axis=3)
    return pooled, idx


def max_unpool_2x2(x: jax.Array, idx: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Inverse of :func:`max_pool_2x2_with_argmax`: scatter each pooled value
    back to its argmax position, zeros elsewhere (torch MaxUnpool2d(2,2))."""
    n, h2, w2, c = x.shape
    oh, ow = out_hw
    onehot = jax.nn.one_hot(idx, 4, dtype=x.dtype, axis=3)  # (N,h2,w2,4,C)
    y = onehot * x[:, :, :, None, :]
    y = y.reshape(n, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(n, h2 * 2, w2 * 2, c)
    if (h2 * 2, w2 * 2) != (oh, ow):
        y = jnp.pad(y, ((0, 0), (0, oh - h2 * 2), (0, ow - w2 * 2), (0, 0)))
    return y


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsample (torch UpsamplingNearest2d(scale_factor=2))."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)
