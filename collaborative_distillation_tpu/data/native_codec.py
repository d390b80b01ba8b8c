"""ctypes binding for the native C++ image codec (native/imgcodec.cpp).

Builds the shared object on first use (g++ + libjpeg, both baked into the
image) and caches it next to the source. Falls back to PIL transparently if
the toolchain or libjpeg is unavailable, so the pipeline never hard-depends
on it. The C calls release the GIL, so the Loader's decode thread pool gets
real CPU parallelism, and shorter-side resizes ride libjpeg's DCT-domain
1/2,1/4,1/8 scaling instead of decoding at full resolution.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "jpeg_dims", "decode_jpeg", "decode_jpeg_shorter_side", "encode_jpeg",
           "decode_jpeg_yuv420", "encode_jpeg_yuv420", "jpeg_yuv420_writer",
           "jpeg_yuv420_reader", "rgb_to_yuv420", "yuv420_to_rgb"]

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "imgcodec.cpp")
_SO = os.path.join(_REPO, "native", "libimgcodec.so")
# decompression-bomb guard for untrusted inputs (serve request bodies): a
# few-KB JPEG can claim 65500x65500 dims (~4.3 GB Y plane). The cap equals
# PIL's MAX_IMAGE_PIXELS *warn* threshold, i.e. the native path is
# intentionally stricter than the PIL fallback (which only hard-fails at 2x
# that); 178-358 MPix inputs deliberately fall through to the slower PIL
# decode rather than widening the fast path's attack surface.
MAX_DECODE_PIXELS = int(os.environ.get("CD_TPU_MAX_DECODE_PIXELS",
                                       str(178956970)))


_lock = threading.Lock()
_lib = None
_failed = False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-shared", "-o", _SO, _SRC, "-ljpeg"],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            lib.cd_jpeg_dims.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.cd_jpeg_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
            lib.cd_resize_rgb.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
            lib.cd_jpeg_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_long]
            lib.cd_jpeg_encode.restype = ctypes.c_long
            lib.cd_rgb_to_yuv420.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p]
            lib.cd_yuv420_to_rgb.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p]
            lib.cd_jpeg_decode_yuv420.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
            lib.cd_jpeg_encode_yuv420.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_long]
            lib.cd_jpeg_encode_yuv420.restype = ctypes.c_long
            lib.cd_jpeg_enc_begin.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int]
            lib.cd_jpeg_enc_begin.restype = ctypes.c_void_p
            lib.cd_jpeg_enc_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
            lib.cd_jpeg_enc_rows.restype = ctypes.c_long
            lib.cd_jpeg_enc_finish.argtypes = [ctypes.c_void_p]
            lib.cd_jpeg_enc_finish.restype = ctypes.c_long
            lib.cd_jpeg_enc_read_free.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
            lib.cd_jpeg_enc_read_free.restype = ctypes.c_long
            lib.cd_jpeg_enc_abort.argtypes = [ctypes.c_void_p]
            lib.cd_jpeg_enc_abort.restype = None
            lib.cd_jpeg_dec_begin.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.cd_jpeg_dec_begin.restype = ctypes.c_void_p
            lib.cd_jpeg_dec_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
            lib.cd_jpeg_dec_rows.restype = ctypes.c_long
            lib.cd_jpeg_dec_abort.argtypes = [ctypes.c_void_p]
            lib.cd_jpeg_dec_abort.restype = None
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def jpeg_dims(data: bytes) -> tuple[int, int] | None:
    """JPEG bytes -> (width, height) from the header alone (no pixel decode).
    Returns None if the native codec is unavailable or the header is bad."""
    lib = _load()
    if lib is None:
        return None
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.cd_jpeg_dims(data, len(data), 1, ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    return w.value, h.value


def decode_jpeg(data: bytes, scale_denom: int = 1) -> np.ndarray | None:
    """JPEG bytes -> (H, W, 3) uint8, optionally DCT-scaled by 1/scale_denom.
    Returns None if the native path is unavailable or decode fails."""
    lib = _load()
    if lib is None:
        return None
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.cd_jpeg_dims(data, len(data), scale_denom,
                        ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    if w.value * h.value > MAX_DECODE_PIXELS:  # decompression-bomb guard
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.cd_jpeg_decode(data, len(data), scale_denom,
                          out.ctypes.data_as(ctypes.c_void_p),
                          w.value, h.value) != 0:
        return None
    return out



def _encode_with_retry(call, w: int, h: int) -> bytes | None:
    """Shared buffer-capacity contract for the cd_jpeg_encode* entry points:
    worst-case w*h*3 buffer, one 2x retry when libjpeg had to realloc (-2),
    None on failure."""
    cap = w * h * 3 + (1 << 16)
    n = -2
    for _ in range(2):
        out = np.empty(cap, np.uint8)
        n = call(out.ctypes.data_as(ctypes.c_void_p), cap)
        if n != -2:  # -2 = buffer too small (pathological content)
            break
        cap *= 2
    if n <= 0:
        return None
    return out[:n].tobytes()


def encode_jpeg(arr: np.ndarray, quality: int = 95) -> bytes | None:
    """(H, W, 3) uint8 -> JPEG bytes via libjpeg with the GIL released
    (server threads encode big stylized outputs concurrently; PIL holds the
    GIL for the whole compress). Returns None if unavailable — callers fall
    back to PIL."""
    lib = _load()
    if lib is None:
        return None
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        return None
    arr = np.ascontiguousarray(arr)
    h, w = arr.shape[:2]
    return _encode_with_retry(
        lambda buf, cap: lib.cd_jpeg_encode(
            arr.ctypes.data_as(ctypes.c_void_p), w, h, quality, buf, cap),
        w, h)


def decode_jpeg_yuv420(data: bytes, *,
                       max_pixels: int | None = None
                       ) -> tuple[np.ndarray, np.ndarray] | None:
    """JPEG bytes -> (Y (H,W) u8, CbCr (H/2,W/2,2) u8) with NO color
    conversion anywhere: ordinary photo JPEGs already store YCbCr 4:2:0, so
    this reads the planes straight out (jpeg_read_raw_data). Returns None
    when unavailable, the file is not even-dimensioned baseline 4:2:0, or
    its claimed dims exceed ``max_pixels`` (default MAX_DECODE_PIXELS) —
    callers fall back to decode_jpeg + rgb_to_yuv420 (or PIL, which applies
    its own decompression-bomb limit)."""
    lib = _load()
    if lib is None:
        return None
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.cd_jpeg_dims(data, len(data), 1, ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    limit = MAX_DECODE_PIXELS if max_pixels is None else max_pixels
    if w.value % 2 or h.value % 2 or w.value * h.value > limit:
        return None
    y = np.empty((h.value, w.value), np.uint8)
    cbcr = np.empty((h.value // 2, w.value // 2, 2), np.uint8)
    if lib.cd_jpeg_decode_yuv420(data, len(data),
                                 y.ctypes.data_as(ctypes.c_void_p),
                                 cbcr.ctypes.data_as(ctypes.c_void_p),
                                 w.value, h.value) != 0:
        return None
    return y, cbcr


def encode_jpeg_yuv420(y: np.ndarray, cbcr: np.ndarray,
                       quality: int = 95) -> bytes | None:
    """(Y, CbCr) 4:2:0 planes -> JPEG bytes via jpeg_write_raw_data (no
    color conversion; the planes are what the file stores)."""
    lib = _load()
    if lib is None or y.dtype != np.uint8 or cbcr.dtype != np.uint8:
        return None
    if y.ndim != 2:
        return None
    h, w = y.shape
    if h % 2 or w % 2 or cbcr.shape != (h // 2, w // 2, 2):
        return None
    y = np.ascontiguousarray(y)
    cbcr = np.ascontiguousarray(cbcr)
    return _encode_with_retry(
        lambda buf, cap: lib.cd_jpeg_encode_yuv420(
            y.ctypes.data_as(ctypes.c_void_p),
            cbcr.ctypes.data_as(ctypes.c_void_p), w, h, quality, buf, cap),
        w, h)


class _JpegYuv420Writer:
    """Incremental 4:2:0-plane JPEG encoder (see jpeg_yuv420_writer).

    Feed row bands in order with :meth:`write`, then :meth:`finish` for the
    bytes. Band heights must be even and multiples of 16 except the final
    band. After any failure the writer is dead (``finish`` returns None).
    The C calls release the GIL, so encoding one band overlaps the fetch of
    the next from a different thread.
    """

    def __init__(self, lib, w: int, h: int, quality: int):
        self._lib = lib
        self._h = h
        self._w = w
        self._written = 0
        self._handle = lib.cd_jpeg_enc_begin(w, h, quality)
        if not self._handle:
            raise RuntimeError(f"jpeg encoder rejected {w}x{h} q{quality}")

    def write(self, y: np.ndarray, cbcr: np.ndarray) -> bool:
        """Append one band; returns False (and kills the writer) on error."""
        if not self._handle:
            return False
        rows = y.shape[0]
        if (y.dtype != np.uint8 or cbcr.dtype != np.uint8 or y.ndim != 2
                or y.shape[1] != self._w
                or cbcr.shape != (rows // 2, self._w // 2, 2)):
            self.close()
            return False
        y = np.ascontiguousarray(y)
        cbcr = np.ascontiguousarray(cbcr)
        rc = self._lib.cd_jpeg_enc_rows(
            self._handle, y.ctypes.data_as(ctypes.c_void_p),
            cbcr.ctypes.data_as(ctypes.c_void_p), rows)
        if rc != 0:
            self._handle = None  # the C side freed it
            return False
        self._written += rows
        return True

    def finish(self) -> bytes | None:
        if not self._handle or self._written != self._h:
            self.close()
            return None
        n = self._lib.cd_jpeg_enc_finish(self._handle)
        if n <= 0:
            self._handle = None
            return None
        out = np.empty(n, np.uint8)
        rc = self._lib.cd_jpeg_enc_read_free(
            self._handle, out.ctypes.data_as(ctypes.c_void_p), int(n))
        self._handle = None
        return out[:rc].tobytes() if rc > 0 else None

    def close(self) -> None:
        if self._handle:
            self._lib.cd_jpeg_enc_abort(self._handle)
            self._handle = None

    def __del__(self):  # belt and braces — close() is the real contract
        self.close()


class _JpegYuv420Reader:
    """Incremental 4:2:0-plane JPEG decoder (see jpeg_yuv420_reader).

    :meth:`read` returns the next band's ``(y, cbcr)`` planes, or None on
    error (the reader is then dead). ``done`` flips True after the final
    band. Band heights must be even and multiples of 16 except the last.
    The C call releases the GIL, so decoding a band overlaps an upload of
    the previous one from another thread.
    """

    def __init__(self, lib, data: bytes, handle, w: int, h: int):
        self._lib = lib
        self._data = data  # the handle reads from this buffer; keep it alive
        self._handle = handle
        self.w = w
        self.h = h
        self._row = 0
        self.done = False

    def read(self, rows: int) -> tuple[np.ndarray, np.ndarray] | None:
        if not self._handle or self.done:
            return None
        rows = min(rows, self.h - self._row)
        y = np.empty((rows, self.w), np.uint8)
        cbcr = np.empty((rows // 2, self.w // 2, 2), np.uint8)
        rc = self._lib.cd_jpeg_dec_rows(
            self._handle, y.ctypes.data_as(ctypes.c_void_p),
            cbcr.ctypes.data_as(ctypes.c_void_p), rows)
        if rc < 0:
            self._handle = None  # the C side freed it
            return None
        self._row += rows
        if rc == 1:
            self._handle = None  # complete: freed by the C side
            self.done = True
        return y, cbcr

    def close(self) -> None:
        if self._handle:
            self._lib.cd_jpeg_dec_abort(self._handle)
            self._handle = None

    def __del__(self):
        self.close()


def jpeg_yuv420_reader(data: bytes, *, max_pixels: int | None = None
                       ) -> _JpegYuv420Reader | None:
    """Incremental decoder factory: None unless ``data`` is a baseline
    even-dimensioned 4:2:0 JPEG within the decompression-bomb limit —
    callers fall back to :func:`decode_jpeg_yuv420` / PIL."""
    lib = _load()
    if lib is None:
        return None
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.cd_jpeg_dims(data, len(data), 1, ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    limit = MAX_DECODE_PIXELS if max_pixels is None else max_pixels
    if w.value * h.value > limit:
        return None
    handle = lib.cd_jpeg_dec_begin(data, len(data),
                                   ctypes.byref(w), ctypes.byref(h))
    if not handle:
        return None
    return _JpegYuv420Reader(lib, data, handle, w.value, h.value)


def jpeg_yuv420_writer(w: int, h: int,
                       quality: int = 95) -> _JpegYuv420Writer | None:
    """Incremental encoder factory; None when the native codec (or this
    geometry: even dims required) is unavailable — callers fall back to
    assembling whole planes + :func:`encode_jpeg_yuv420`."""
    lib = _load()
    if lib is None or w <= 0 or h <= 0 or w % 2 or h % 2:
        return None
    try:
        return _JpegYuv420Writer(lib, w, h, quality)
    except RuntimeError:
        return None


def rgb_to_yuv420(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """(H, W, 3) u8 (even H, W) -> (Y (H,W) u8, CbCr (H/2,W/2,2) u8), JFIF
    full-range BT.601 with 2x2 box chroma. ~30x the numpy mirror on this
    container's single core (the GIL is released). None if unavailable."""
    lib = _load()
    if lib is None or rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        return None
    h, w = rgb.shape[:2]
    if h % 2 or w % 2:
        return None
    rgb = np.ascontiguousarray(rgb)
    y = np.empty((h, w), np.uint8)
    cbcr = np.empty((h // 2, w // 2, 2), np.uint8)
    if lib.cd_rgb_to_yuv420(rgb.ctypes.data_as(ctypes.c_void_p), h, w,
                            y.ctypes.data_as(ctypes.c_void_p),
                            cbcr.ctypes.data_as(ctypes.c_void_p)) != 0:
        return None
    return y, cbcr


def yuv420_to_rgb(y: np.ndarray, cbcr: np.ndarray) -> np.ndarray | None:
    """Inverse of :func:`rgb_to_yuv420` (nearest chroma upsample)."""
    lib = _load()
    if lib is None or y.dtype != np.uint8 or cbcr.dtype != np.uint8:
        return None
    h, w = y.shape[-2:] if y.ndim == 2 else (0, 0)
    if y.ndim != 2 or h % 2 or w % 2 or cbcr.shape != (h // 2, w // 2, 2):
        return None
    y = np.ascontiguousarray(y)
    cbcr = np.ascontiguousarray(cbcr)
    rgb = np.empty((h, w, 3), np.uint8)
    if lib.cd_yuv420_to_rgb(y.ctypes.data_as(ctypes.c_void_p),
                            cbcr.ctypes.data_as(ctypes.c_void_p), h, w,
                            rgb.ctypes.data_as(ctypes.c_void_p)) != 0:
        return None
    return rgb


def decode_jpeg_shorter_side(data: bytes, shorter_side: int) -> np.ndarray | None:
    """Decode + resize so min(H, W) == shorter_side, using the coarsest DCT
    scale that still over-resolves the target, then a box-filter resize."""
    lib = _load()
    if lib is None:
        return None
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.cd_jpeg_dims(data, len(data), 1, ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    short = min(w.value, h.value)
    denom = 1
    while denom < 8 and short // (denom * 2) >= shorter_side:
        denom *= 2
    arr = decode_jpeg(data, denom)
    if arr is None:
        return None
    sh, sw = arr.shape[:2]
    if sw < sh:
        dw, dh = shorter_side, max(1, round(sh * shorter_side / sw))
    else:
        dh, dw = shorter_side, max(1, round(sw * shorter_side / sh))
    if (dw, dh) == (sw, sh):
        return arr
    dst = np.empty((dh, dw, 3), np.uint8)
    if lib.cd_resize_rgb(arr.ctypes.data_as(ctypes.c_void_p), sw, sh,
                         dst.ctypes.data_as(ctypes.c_void_p), dw, dh) != 0:
        return None
    return dst
