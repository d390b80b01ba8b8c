"""JPEG-native YCbCr 4:2:0 transport for the host<->device boundary.

The stylization pipeline's endpoints are JPEGs (content decoded from one,
output saved as one), and JPEG's native representation is YCbCr with 2x2
chroma subsampling — 1.5 bytes/pixel. Transporting RGB uint8 to the chip
inflates the link traffic 2x relative to the information the endpoints
carry. Over this container's relay (13.9 MB/s single-stream, collapsing to
<1 MB/s under load) that's seconds per UHD image in each direction.

Conversions use the JFIF full-range BT.601 matrices (what libjpeg uses), so
a JPEG-decoded image round-trips with only chroma-box-filter + rounding
error — invisible relative to the q95 JPEG encode that follows. Device-side
converters are jitted jnp; host-side mirrors are vectorized numpy. Opt-in
(`WCTEngine(transport="yuv420")`): RGB stays the default contract.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "rgb_to_yuv420_host",
    "yuv420_to_rgb_host",
    "yuv420_to_rgbf_device",
    "rgbf_to_yuv420_device",
]


def rgb_to_yuv420_host(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N, H, W, 3) uint8 RGB -> (Y (N,H,W) u8, CbCr (N,H/2,W/2,2) u8).
    H and W must be even (pad with edge rows first).

    Prefers the native fixed-point loop (native/imgcodec.cpp, +-1 LSB of this
    numpy math, ~30x faster on one core — 42 MPix costs ~20 s in numpy)."""
    n, h, w, _ = rgb.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    if rgb.dtype == np.uint8:
        from ..data import native_codec
        outs = [native_codec.rgb_to_yuv420(rgb[i]) for i in range(n)]
        if all(o is not None for o in outs):
            if n == 1:  # view, not a 60 MB stack copy
                return outs[0][0][None], outs[0][1][None]
            return (np.stack([o[0] for o in outs]),
                    np.stack([o[1] for o in outs]))
    x = rgb.astype(np.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    cbcr = np.stack([cb, cr], axis=-1).reshape(n, h // 2, 2, w // 2, 2, 2)
    cbcr = cbcr.mean(axis=(2, 4))  # 2x2 box filter (JPEG-style subsampling)
    y8 = np.clip(y + 0.5, 0, 255).astype(np.uint8)
    c8 = np.clip(cbcr + 0.5, 0, 255).astype(np.uint8)
    return y8, c8


def yuv420_to_rgb_host(y: np.ndarray, cbcr: np.ndarray) -> np.ndarray:
    """Inverse of :func:`rgb_to_yuv420_host` (nearest chroma upsample)."""
    n, h, w = y.shape
    if y.dtype == np.uint8 and cbcr.dtype == np.uint8:
        from ..data import native_codec
        outs = [native_codec.yuv420_to_rgb(y[i], cbcr[i]) for i in range(n)]
        if all(o is not None for o in outs):
            return outs[0][None] if n == 1 else np.stack(outs)
    c = cbcr.astype(np.float32).repeat(2, axis=1).repeat(2, axis=2)
    yf = y.astype(np.float32)
    cb = c[..., 0] - 128.0
    cr = c[..., 1] - 128.0
    r = yf + 1.402 * cr
    g = yf - 0.344136 * cb - 0.714136 * cr
    b = yf + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def yuv420_to_rgbf_device(y, cbcr):
    """Device-side: (N,H,W) u8 + (N,H/2,W/2,2) u8 -> (N,H,W,3) f32 in [0,1]."""
    import jax.numpy as jnp

    yf = y.astype(jnp.float32)
    c = cbcr.astype(jnp.float32)
    c = jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)
    cb = c[..., 0] - 128.0
    cr = c[..., 1] - 128.0
    r = yf + 1.402 * cr
    g = yf - 0.344136 * cb - 0.714136 * cr
    b = yf + 1.772 * cb
    return jnp.clip(jnp.stack([r, g, b], axis=-1) / 255.0, 0.0, 1.0)


def rgbf_to_yuv420_device(img):
    """Device-side: (N,H,W,3) f32 [0,1] -> (Y u8, CbCr u8). H, W even."""
    import jax.numpy as jnp

    x = jnp.clip(img.astype(jnp.float32), 0.0, 1.0) * 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    n, h, w = y.shape
    cbcr = jnp.stack([cb, cr], axis=-1).reshape(n, h // 2, 2, w // 2, 2, 2)
    cbcr = cbcr.mean(axis=(2, 4))
    y8 = jnp.clip(y + 0.5, 0, 255).astype(jnp.uint8)
    c8 = jnp.clip(cbcr + 0.5, 0, 255).astype(jnp.uint8)
    return y8, c8
