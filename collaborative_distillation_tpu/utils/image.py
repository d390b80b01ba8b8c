"""Image IO helpers (replaces torchvision.utils.save_image usage)."""

from __future__ import annotations

import numpy as np
from PIL import Image

__all__ = ["save_image", "save_image_grid", "load_image_array"]


def _to_uint8(arr: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(arr, np.float32), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_image(arr: np.ndarray, path: str, *, quality: int = 95) -> None:
    """(H, W, 3) float [0,1] or uint8 -> file. JPEG targets go through the
    native libjpeg encoder when available (GIL-released, ~3x PIL; a UHD
    stylized output is 126 MB of raw pixels), PIL otherwise."""
    u8 = arr if (isinstance(arr, np.ndarray) and arr.dtype == np.uint8) else _to_uint8(arr)
    if path.lower().endswith((".jpg", ".jpeg")):
        from ..data.native_codec import encode_jpeg

        data = encode_jpeg(np.ascontiguousarray(u8), quality=quality)
        if data is not None:
            with open(path, "wb") as fh:
                fh.write(data)
            return
    Image.fromarray(u8).save(path)


def save_image_grid(batch: np.ndarray, path: str, *, nrow: int = 8, pad: int = 2) -> None:
    """(N, H, W, 3) -> tiled grid image (torchvision make_grid semantics:
    ``nrow`` images per row), used for the [content; reconstruction] training
    dumps (main.py:121-126)."""
    batch = _to_uint8(batch)
    n, h, w, c = batch.shape
    ncol = min(nrow, n)
    nrows = -(-n // ncol)
    grid = np.zeros((nrows * (h + pad) + pad, ncol * (w + pad) + pad, c), np.uint8)
    for i in range(n):
        r, col = divmod(i, ncol)
        y, x = r * (h + pad) + pad, col * (w + pad) + pad
        grid[y: y + h, x: x + w] = batch[i]
    Image.fromarray(grid).save(path)


def load_image_array(path: str, *, resize_shorter: int = 0) -> np.ndarray:
    img = Image.open(path).convert("RGB")
    if resize_shorter:
        w, h = img.size
        if w < h:
            img = img.resize((resize_shorter, int(h * resize_shorter / w)))
        else:
            img = img.resize((int(w * resize_shorter / h), resize_shorter))
    return np.asarray(img, np.float32) / 255.0
