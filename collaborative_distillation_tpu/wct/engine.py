"""The 5-level WCT stylization cascade engine.

TPU rework of the reference inference path (PytorchWCT/WCT.py:99-125 +
util_wct.py:210-223). Differences, all deliberate:

* Everything runs on-device under one jit per (stage, shapes) — no
  GPU->CPU->GPU feature round-trip (WCT.py:102-103 ships features to the host
  for float64 SVD; we use eigh/Newton–Schulz in f32 on the MXU).
* Style statistics (per-stage mean + covariance) are computed once per style
  image and cached — the reference re-encodes the style image and re-runs the
  SVD at every stage of every run (WCT.py:100).
* Inputs are reflect-padded up to a multiple of 16 before the cascade and
  cropped afterwards, so pool/upsample round-trips are exact at any
  resolution. (The reference silently shrinks non-multiple-of-16 images
  because floor-pool + fixed 2x upsample drop rows.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vgg import apply_decoder, apply_decoder_pwct, apply_encoder
from ..models.zoo import load_pyramid
from ..ops.wct_transform import feature_stats, wct_transform
from ..utils.colorspace import rgbf_to_yuv420_device, yuv420_to_rgbf_device
from ..utils.transfer import fetch, push

# module-level jit singletons (a fresh jax.jit wrapper per call would
# recompile every time)
_yuv420_to_rgbf = jax.jit(yuv420_to_rgbf_device)
_rgbf_to_yuv420 = jax.jit(rgbf_to_yuv420_device)

__all__ = ["WCTEngine", "stylize_cascade_fn"]

# compiler/runtime failures worth degrading on (NOT programming errors):
# jaxlib's XlaRuntimeError covers both remote-compile failures and runtime
# OOM on current jax versions.
try:  # pragma: no cover - version-dependent import
    from jax.errors import JaxRuntimeError as _JaxRuntimeError
    _XLA_ERRORS: tuple = (_JaxRuntimeError,)
except ImportError:  # pragma: no cover
    try:
        from jaxlib.xla_extension import XlaRuntimeError as _XlaRuntimeError
        _XLA_ERRORS = (_XlaRuntimeError,)
    except ImportError:
        _XLA_ERRORS = ()

# style-statistics cache bound: (stage, key, shape) -> (mean, cov) entries
# are small (C<=512: <= 1 MB each), but a long-lived server registering
# styles forever must not grow device memory without bound.
STYLE_CACHE_MAX = int(__import__("os").environ.get("CD_TPU_STYLE_CACHE", "64"))
# transport="auto": uint8 images at or above this many pixels ride the link
# as YCbCr 4:2:0 planes (1.5 B/px). Below it, the per-shape compile of the
# device converters and the host conversion outweigh the link savings.
# 2 MPix: at that size the native conversion costs ~60 ms against a link
# saving of ~70 ms on a GOOD relay day and ~0.5 s on a congested one
# (measured; the relay swings 0.5-50 MB/s), so the halved bytes win or
# break even everywhere above it.
_YUV_AUTO_PIX = int(__import__("os").environ.get("CD_TPU_YUV_AUTO_PIX",
                                                 str(2 * 1024 * 1024)))
# guard for the per-conv-halo spatial path (space>0 WITHOUT slab_rows),
# which keeps full per-shard feature pyramids resident: beyond this many
# pixels per shard it would OOM like the monolithic single-chip graph does
# at UHD (the slab-in-shard cascade exists precisely for that regime).
# 16 MPix/shard ~= a 4K image per chip at 16x student widths — comfortably
# inside HBM; the 42 MPix monolithic UHD graph is known NOT to fit.
_TILED_MAX_SHARD_PIX = int(__import__("os").environ.get(
    "CD_TPU_TILED_MAX_SHARD_PIX", str(16 * 1024 * 1024)))


class _CorruptJpeg(Exception):
    """Internal: the incremental decoder failed mid-stream (truncated or
    malformed entropy data past the header)."""


def _pad_to_multiple(x: jax.Array, mult_h: int = 16,
                     mult_w: int | None = None) -> tuple[jax.Array, tuple[int, int]]:
    """Reflect-pad H to a multiple of ``mult_h`` and W to ``mult_w`` (defaults
    to ``mult_h``). H and W are independent: spatial tiling shards only H, so
    W never needs the extra `16*space` rows of wasted conv work."""
    n, h, w, c = x.shape
    if mult_w is None:
        mult_w = mult_h
    ph = (-h) % mult_h
    pw = (-w) % mult_w
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    return x, (h, w)


def stage_style_stats(enc_params, enc_spec, style: jax.Array):
    """Per-stage (mean, cov) of the style image's relu{k}_1 features.

    Batched styles (N > 1) get per-image statistics ((N,C), (N,C,C)) so each
    batch element pairs with its own style."""
    feats = apply_encoder(enc_params, style, enc_spec, pallas_conv=True)["out"]
    if feats.shape[0] > 1:
        return jax.vmap(feature_stats)(feats)
    return feature_stats(feats)


def stylize_stage(enc_params, dec_params, enc_spec, dec_spec, img, s_mean, s_cov,
                  alpha, method: str, newton_iters: int = 24):
    """encode -> WCT -> decode for one pyramid level (WCT.py styleTransfer)."""
    cf = apply_encoder(enc_params, img, enc_spec, pallas_conv=True)["out"]
    csf = wct_transform(cf, s_mean, s_cov, alpha, method=method,
                        newton_iters=newton_iters)
    return apply_decoder(dec_params, csf, dec_spec, pallas_conv=True)["out"]


def stylize_stage_pwct(enc_params, dec_params, enc_spec, dec_spec, img, s_mean,
                       s_cov, alpha, method: str, newton_iters: int = 24):
    """Photo-WCT variant: max-pool argmax indices from the encoder drive
    max-unpooling in the decoder (structure-preserving; the reference's
    forward_pwct paths, model_cd.py:443-449/621-635)."""
    feats = apply_encoder(enc_params, img, enc_spec, with_pool_argmax=True)
    csf = wct_transform(feats["out"], s_mean, s_cov, alpha, method=method,
                        newton_iters=newton_iters)
    return apply_decoder_pwct(dec_params, csf, dec_spec, feats)


def stylize_cascade_fn(pyramid, *, stages=(5, 4, 3, 2, 1), method="eigh",
                       newton_iters=24):
    """Build the jittable full-cascade function.

    Returns ``f(params, content, style, alpha) -> stylized`` where ``params``
    is the pyramid's parameter pytree — passing params as an argument keeps
    them donate-able/shardable and lets one compiled executable serve updated
    weights.
    """
    specs = {k: (pyramid[k]["enc_spec"], pyramid[k]["dec_spec"]) for k in stages}

    def f(params, content, style, alpha):
        img = content
        for k in stages:
            enc_spec, dec_spec = specs[k]
            s_mean, s_cov = stage_style_stats(params[k]["enc"], enc_spec, style)
            img = stylize_stage(params[k]["enc"], params[k]["dec"], enc_spec,
                                dec_spec, img, s_mean, s_cov, alpha, method,
                                newton_iters)
        return img

    return f


class WCTEngine:
    """User-facing stylization engine (the ``wct = WCT(args)`` equivalent).

    >>> eng = WCTEngine(mode="16x")
    >>> out = eng.stylize(content_hw3, style_hw3, alpha=1.0)

    Handles padding, numpy<->device transfer, per-shape jit caching, style-stat
    caching, and multi-run cascades (``num_run``, WCT.py:120).
    """

    def __init__(self, mode: str = "16x", weights_root: str | None = None, *,
                 method: str = "eigh", newton_iters: int = 24,
                 dtype=jnp.float32, stages=(5, 4, 3, 2, 1), space: int = 0,
                 slab_rows: int = 0, packed: bool | None = None, fused: bool = True,
                 pyramid=None, transport: str = "auto",
                 stream_min_pix: int | None = None, halo: str = "ppermute"):
        if transport not in ("auto", "rgb", "yuv420"):
            raise ValueError(
                f"transport must be 'auto', 'rgb' or 'yuv420', got {transport!r}")
        if halo not in ("ppermute", "pallas"):
            raise ValueError(
                f"halo must be 'ppermute' or 'pallas', got {halo!r}")
        self.last_timings: dict = {}  # filled by stylize(timed=True)
        if halo == "pallas" and not (space and space > 1 and slab_rows):
            import warnings
            warnings.warn(
                "halo='pallas' only affects the multi-chip slab cascade "
                "(space > 1 AND slab_rows); this engine configuration uses "
                "no halo exchange — the flag is ignored", RuntimeWarning,
                stacklevel=2)
        # persistent XLA compilation cache: every process after the first
        # replays the cascade compiles from disk instead of repaying the
        # 40-140 s remote-compile cost (see utils/jaxconfig.py)
        from ..utils.jaxconfig import enable_persistent_cache
        enable_persistent_cache()
        self.mode = mode
        self.method = method
        # host<->device transport for uint8 images: "yuv420" moves JPEG-native
        # YCbCr 4:2:0 planes (1.5 B/px, half the link traffic of RGB; the
        # endpoints are JPEGs, already 4:2:0, so the end artifact is
        # unchanged up to chroma-box rounding; conversions run in the native
        # codec at ~30 ms/MPix). "auto" (default) picks yuv420 for uint8
        # images of >= _YUV_AUTO_PIX pixels (2 MPix default; env
        # CD_TPU_YUV_AUTO_PIX, in PIXELS) — where the link savings dwarf the
        # conversion cost — and rgb below that (and always for float I/O).
        self.transport = transport
        # streamed final stage (fused path, uint8 output): below this many
        # pixels the single monolithic program wins (one compile unit, no
        # per-band dispatch); above it, overlapping the readback with the
        # last stage's compute pays. Same scale as the yuv420 auto cutoff.
        self.stream_min_pix = (stream_min_pix if stream_min_pix is not None
                               else int(__import__("os").environ.get(
                                   "CD_TPU_STREAM_MIN_PIX", str(8 * 1024 * 1024))))
        self.newton_iters = newton_iters
        self.dtype = dtype
        self.stages = tuple(stages)
        if pyramid is not None:
            # an externally-built pyramid (e.g. random-init teacher specs)
            # carries whatever dtype its params were created in; the cascade
            # requires params == activation dtype (lax.conv rejects mixed)
            self.pyramid = {
                k: {**v, "enc": jax.tree.map(lambda a: a.astype(dtype), v["enc"]),
                    "dec": jax.tree.map(lambda a: a.astype(dtype), v["dec"])}
                for k, v in pyramid.items()}
        else:
            self.pyramid = load_pyramid(
                mode, weights_root, stages=self.stages, dtype=dtype)
        self.params = {k: {"enc": v["enc"], "dec": v["dec"]} for k, v in self.pyramid.items()}
        from collections import OrderedDict
        self._stage_fns: dict[int, callable] = {}
        self._style_stats_fns: dict[int, callable] = {}
        self._style_cache: OrderedDict = OrderedDict()  # LRU, STYLE_CACHE_MAX
        # guards _style_cache only (NOT device work): the serve layer touches
        # the cache from registration threads (invalidate_style) while
        # stylize threads insert/evict under the separate engine lock —
        # unsynchronized OrderedDict mutation corrupts it
        import threading
        self._cache_lock = threading.Lock()
        # spatial tiling over a 'space' mesh axis (UHD path)
        if packed is None:
            # Width packing pays everywhere now: the 16x students pack to
            # lane density (their whole point), and the teacher packs f=2 at
            # full res so its C=64 maps run lane-dense through the Pallas
            # kernels too. Unpacked teacher maps let XLA pick W-minor
            # layouts that force a full-map relayout around every Pallas
            # call (r4 teacher trace: 4.3 s of "elementwise fusions" that
            # were really layout conversions). The historical blocker — the
            # XLA wide packed-conv lowering crashing the remote TPU
            # compiler at W >= 5120 — no longer applies: those shapes route
            # to the W-tiled Pallas kernel (ops/pallas/conv.py:
            # conv3x3_tiled), never the XLA wide conv. CD_TPU_PACKED=0
            # forces unpacked for A/B or as an escape hatch.
            import os as _os
            packed = _os.environ.get("CD_TPU_PACKED", "1").strip().lower() \
                not in ("0", "off", "false")
            if packed:
                # ... but that routing only holds while the Pallas conv
                # routes are live. If they are killed (CD_TPU_PALLAS=0 or a
                # prior degradation), wide packed shapes would fall back to
                # the very XLA lowering the packing decision assumes away —
                # default unpacked then.
                from ..ops.pallas.conv import pallas_conv_enabled
                packed = pallas_conv_enabled()
        # shingled slab streaming for single-chip ultra-resolution inputs
        self.slab = None
        self._fused_slab = None
        self.space = space if space and space > 1 else 0
        self._tiled_fn = None
        self._tiled_params = None
        self._tiled_slab = 0
        if slab_rows and not self.space:
            from .slab import SlabCascade, build_fused_slab_cascade
            self.slab = SlabCascade(self.pyramid, stages=self.stages,
                                    slab_rows=slab_rows, method=method,
                                    newton_iters=newton_iters, packed=packed)
            if fused:
                # style stats are computed (and cached per style_key) outside
                # the fused program — re-encoding the style every run costs
                # ~0.4 s at UHD for nothing
                self._fused_slab = build_fused_slab_cascade(
                    self.pyramid, stages=self.stages, slab_rows=slab_rows,
                    method=method, newton_iters=newton_iters, packed=packed,
                    external_style_stats=True,
                    params=self.slab.packed_params if packed else None)
        if self.space:
            from ..parallel.mesh import make_mesh
            self.mesh = make_mesh(space=self.space)
            if slab_rows:
                # HBM-bounded multi-chip path: slab streaming inside each
                # row shard, stats psum'd over the mesh
                from ..parallel.spatial import build_tiled_slab_cascade
                self._tiled_fn, self._tiled_params = build_tiled_slab_cascade(
                    self.pyramid, self.mesh, stages=self.stages,
                    slab_rows=slab_rows, method=method,
                    newton_iters=newton_iters, packed=packed,
                    external_style_stats=True, halo=halo)
                # effective slab size (the builder rounds up to pyramid
                # granularity AND to 2*margin)
                self._tiled_slab = self._tiled_fn.slab_rows
            else:
                from ..parallel.spatial import build_tiled_stylize_fn
                self._tiled_fn = build_tiled_stylize_fn(
                    self.pyramid, self.mesh, stages=self.stages, method=method,
                    newton_iters=newton_iters)
                self._tiled_params = self.params

    # -- jitted building blocks (cached per stage; XLA caches per shape) --

    def _stage_fn(self, k, pwct: bool = False):
        key = (k, pwct)
        if key not in self._stage_fns:
            enc_spec = self.pyramid[k]["enc_spec"]
            dec_spec = self.pyramid[k]["dec_spec"]
            base = stylize_stage_pwct if pwct else stylize_stage
            f = partial(base, enc_spec=enc_spec, dec_spec=dec_spec,
                        method=self.method, newton_iters=self.newton_iters)
            self._stage_fns[key] = jax.jit(
                lambda ep, dp, img, sm, sc, a, _f=f: _f(ep, dp, img=img, s_mean=sm, s_cov=sc, alpha=a))
        return self._stage_fns[key]

    def invalidate_style(self, style_key) -> None:
        """Drop cached statistics for a style key (call when re-registering a
        different image under the same name). Thread-safe."""
        with self._cache_lock:
            for key in [k for k in self._style_cache if k[1] == style_key]:
                del self._style_cache[key]

    def _style_stats(self, k, style: jax.Array, cache_key=None):
        key = (k, cache_key, style.shape) if cache_key is not None else None
        if key is not None:
            with self._cache_lock:
                if key in self._style_cache:
                    self._style_cache.move_to_end(key)
                    return self._style_cache[key]
        if k not in self._style_stats_fns:
            enc_spec = self.pyramid[k]["enc_spec"]
            self._style_stats_fns[k] = jax.jit(
                lambda p, s: stage_style_stats(p, enc_spec, s))
        stats = self._style_stats_fns[k](self.params[k]["enc"], style)
        if key is not None:
            with self._cache_lock:
                self._style_cache[key] = stats
                while len(self._style_cache) > STYLE_CACHE_MAX:
                    self._style_cache.popitem(last=False)
        return stats

    def _fused_style_stats(self, style: jax.Array, style_key=None):
        """Per-stage {k: (mean, cov)} for the fused slab cascade (computed by
        the SlabCascade's per-stage programs, packed-aware), LRU-cached."""
        key = ("fused", style_key, style.shape) if style_key is not None else None
        if key is not None:
            with self._cache_lock:
                if key in self._style_cache:
                    self._style_cache.move_to_end(key)
                    return self._style_cache[key]
        stats = {k: self.slab._style_stats(k, style) for k in self.stages}
        if key is not None:
            with self._cache_lock:
                self._style_cache[key] = stats
                while len(self._style_cache) > STYLE_CACHE_MAX:
                    self._style_cache.popitem(last=False)
        return stats

    def blend_styles(self, styles, weights=None, *, style_keys=None):
        """Precompute statistics for a weighted blend of styles.

        Returns ``(style_key, proxy_style)``: pass them to :meth:`stylize`
        (or any serve path) as the style image + key — the proxy is a tiny
        black image whose encode is skipped because the blended statistics
        are already cached under the returned key.

        Blending is *statistics interpolation*: per stage, the target mean
        and covariance are the weighted sums of the per-style statistics
        (a convex combination of PSD matrices is PSD). This is the
        O(1)-extra-cost analog of the WCT paper's style-interpolation
        (which blends the transformed features, paying one full transform
        per style); with cached per-style stats a blend costs a few C x C
        adds. Beyond-reference capability — the reference has no
        multi-style story.

        Per-style statistics are cached under ``style_keys`` entries when
        given (so serve blends reuse registered styles' stats), and the
        blended entries under a deterministic combo key when all inputs
        are keyed.
        """
        import uuid

        n = len(styles)
        if n == 0:
            raise ValueError("blend_styles needs at least one style")
        w = (np.full(n, 1.0 / n) if weights is None
             else np.asarray(weights, np.float64))
        if len(w) != n or (w < 0).any() or w.sum() <= 0:
            raise ValueError(f"bad blend weights {weights!r}")
        w = w / w.sum()
        if style_keys is None:
            style_keys = [None] * n
        if self.slab is not None and self._fused_slab is None:
            raise ValueError(
                "style blending needs the fused slab path (fused=True) — "
                "the non-fused slab cascade re-encodes the raw style")
        if all(k is not None for k in style_keys):
            blend_key = "blend:" + "+".join(
                f"{k}:{wi:.4f}" for k, wi in zip(style_keys, w))
        else:
            blend_key = "blend:" + uuid.uuid4().hex

        mult_h = 16 * self.space if self.space else 16
        proxy = np.zeros((mult_h, 16, 3), np.float32)
        proxy_shape = (1, mult_h, 16, 3)

        def prep(s):
            sty = jnp.asarray(s)
            if sty.ndim == 3:
                sty = sty[None]
            sty = (self._u8_to_float(sty) if sty.dtype == jnp.uint8
                   else sty).astype(self.dtype)
            return _pad_to_multiple(sty, mult_h, 16)[0]

        dev = [prep(s) for s in styles]

        def blend(pairs):  # [(mean, cov)] weighted sum
            m = sum(wi * p[0].astype(jnp.float32) for wi, p in zip(w, pairs))
            c = sum(wi * p[1].astype(jnp.float32) for wi, p in zip(w, pairs))
            return m, c

        with_fused = self._fused_slab is not None
        if with_fused:
            per = [self._fused_style_stats(d, style_key=k)
                   for d, k in zip(dev, style_keys)]
            fused_blend = {k: blend([p[k] for p in per]) for k in self.stages}
            with self._cache_lock:
                self._style_cache[("fused", blend_key, proxy_shape)] = fused_blend
        for k in self.stages:
            per_k = [self._style_stats(k, d, cache_key=sk)
                     for d, sk in zip(dev, style_keys)]
            with self._cache_lock:
                self._style_cache[(k, blend_key, proxy_shape)] = blend(per_k)
        with self._cache_lock:
            while len(self._style_cache) > STYLE_CACHE_MAX:
                self._style_cache.popitem(last=False)
        return blend_key, proxy

    def stylize_multi(self, content, styles, weights=None, alpha: float = 1.0,
                      *, style_keys=None, **kw):
        """Stylize with a weighted blend of styles (see :meth:`blend_styles`)."""
        key, proxy = self.blend_styles(styles, weights, style_keys=style_keys)
        return self.stylize(content, proxy, alpha, style_key=key, **kw)

    # -- the three pipeline phases: upload/convert/pad -> cascade -> fetch --

    def _to_device(self, content: np.ndarray, style: np.ndarray,
                   transport: str | None = None):
        """Upload one pair; returns (img, sty, squeeze, orig_hw, transport)
        with ``transport`` RESOLVED ("auto" decided here, from the input's
        dtype/size, and reused verbatim for the output leg — the two sides
        must agree so lossless float/rgb input never gets lossy 4:2:0
        output)."""
        transport = transport or self.transport
        if transport == "auto":
            big = (isinstance(content, np.ndarray) and content.dtype == np.uint8
                   and content.shape[-3] * content.shape[-2] >= _YUV_AUTO_PIX)
            transport = "yuv420" if big else "rgb"
        squeeze = content.ndim == 3
        if squeeze:
            content = content[None]
        if style.ndim == 3:
            style = style[None]
        orig = (content.shape[1], content.shape[2])
        if (transport == "yuv420" and isinstance(content, np.ndarray)
                and content.dtype == np.uint8):
            # JPEG-native 4:2:0 planes across the link (1.5 B/px); the style
            # is small and stays RGB
            ph, pw = (-orig[0]) % 2, (-orig[1]) % 2
            if ph or pw:
                content = np.pad(content, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                 mode="edge")
            img = _yuv420_to_rgbf(*self._upload_yuv420(content))
        else:
            if transport == "yuv420":
                # explicit yuv420 with float (or device-resident) content:
                # the input leg can't take the 4:2:0 path, and the two legs
                # must agree — downgrade so lossless input never gets a
                # chroma-lossy output
                transport = "rgb"
            img = push(content)
            img = (self._u8_to_float(img) if img.dtype == jnp.uint8 else img)
        img = img.astype(self.dtype)
        sty = jnp.asarray(style)
        sty = (self._u8_to_float(sty) if sty.dtype == jnp.uint8 else sty).astype(self.dtype)
        mult_h = 16 * self.space if self.space else 16
        img, _ = _pad_to_multiple(img, mult_h, 16)
        sty, _ = _pad_to_multiple(sty, mult_h, 16)
        return img, sty, squeeze, orig, transport

    @staticmethod
    def _upload_yuv420(content: np.ndarray, *, bands: int | None = None):
        """RGB uint8 (N, H, W, 3), H and W even -> device (Y, CbCr) planes.

        For one big image the conversion is banded: the native RGB->4:2:0
        loop converts band i while bands < i ride the link (two uploads in
        flight — the relay's h2d sweet spot), so the ~0.45 s/UHD host
        conversion hides under the ~1.4 s upload instead of preceding it.
        Bands are even-height, so the chroma boxes — and hence the planes —
        are identical to the whole-image conversion.
        """
        from ..utils.colorspace import rgb_to_yuv420_host

        n, h, w, _ = content.shape
        if bands is None:
            bands = 4 if (n == 1 and h >= 1024 and h * w >= _YUV_AUTO_PIX) else 1
        if bands <= 1:
            y, cbcr = rgb_to_yuv420_host(content)
            return push(y), jnp.asarray(cbcr)
        rows = -(-h // bands)
        rows += rows % 2  # even band heights keep chroma boxes band-local
        bounds = [(a, min(a + rows, h)) for a in range(0, h, rows)]
        return WCTEngine._upload_plane_bands(
            rgb_to_yuv420_host(content[:, a:b]) for a, b in bounds)

    @staticmethod
    def _upload_plane_bands(bands):
        """Upload an in-order iterable of host ``(y, cbcr)`` plane bands with
        two uploads in flight (the relay's h2d sweet spot) while the producer
        keeps generating; returns the concatenated device planes."""
        from concurrent.futures import ThreadPoolExecutor
        dev = []
        with ThreadPoolExecutor(2) as up:
            for yb, cb in bands:
                if len(dev) >= 2:
                    # backpressure: when the producer (native decode) outruns
                    # the relay, waiting on band i-2 before pulling band i
                    # caps the host working set at ~3 bands instead of
                    # accumulating every decoded band in RAM
                    dev[-2][0].result()
                    dev[-2][1].result()
                dev.append((up.submit(jnp.asarray, yb),
                            up.submit(jnp.asarray, cb)))
            y = jnp.concatenate([fy.result() for fy, _ in dev], axis=1)
            c = jnp.concatenate([fc.result() for _, fc in dev], axis=1)
        return y, c

    def _from_device(self, img, orig_hw, squeeze: bool, as_uint8: bool,
                     transport: str | None = None) -> np.ndarray:
        transport = transport or self.transport
        if transport == "auto":  # internal callers pass the input-side
            transport = "rgb"    # resolution; direct callers get lossless
        if (transport == "yuv420" and as_uint8
                and not isinstance(img, np.ndarray)):
            # fetch 4:2:0 planes from the (even-dim, padded) device image,
            # reassemble RGB on the host, then crop
            from ..utils.colorspace import yuv420_to_rgb_host
            y, cbcr = _rgbf_to_yuv420(img)
            img = yuv420_to_rgb_host(fetch(y), fetch(cbcr))
        img = img[:, : orig_hw[0], : orig_hw[1], :]
        if not isinstance(img, np.ndarray):  # np = already streamed as uint8
            if as_uint8:
                img = fetch(self._float_to_u8(img))
            else:
                img = fetch(jnp.clip(img.astype(jnp.float32), 0.0, 1.0))
        return img[0] if squeeze else img

    def stylize(self, content: np.ndarray, style: np.ndarray, alpha: float = 1.0,
                *, num_run: int = 1, style_key=None, as_uint8: bool = False,
                pwct: bool = False, transport: str | None = None,
                timed: bool = False) -> np.ndarray:
        """Stylize one content/style pair. Inputs: (H, W, 3) or (N, H, W, 3),
        float in [0, 1] or uint8 in [0, 255]; returns the same rank, clipped.

        uint8 inputs/outputs are converted on-device: only 3 bytes/pixel cross
        the host<->device link, which matters at UHD scale (the device cascade
        is ~2 s for 42 MPix; an f32 image is 0.5 GB of transfer).
        ``transport="yuv420"`` halves that again by moving JPEG-native 4:2:0
        planes (uint8 path only; overrides the engine default per call).
        The default ("auto") does this automatically for uint8 images >=
        2 MPix — the pipeline endpoints are JPEGs, themselves 4:2:0, so the
        saved artifact only changes by chroma-box rounding; pass
        ``transport="rgb"`` for bit-exact RGB transport.

        ``timed=True`` inserts a ``block_until_ready`` barrier after the
        upload and compute legs and records their wall times in
        ``self.last_timings`` (keys upload_s/compute_s/readback_s/total_s).
        The barriers serialize legs that normally overlap (banded upload,
        async dispatch), so a timed run is a *breakdown* of where the time
        goes, not the fastest total — benches report the un-timed total and
        one timed breakdown separately.
        """
        import time as _time
        t0 = _time.perf_counter() if timed else 0.0
        img, sty, squeeze, orig_hw, transport = self._to_device(
            content, style, transport)
        if timed:
            jax.block_until_ready((img, sty))
            t1 = _time.perf_counter()
        img = self._run_device(img, sty, alpha, num_run=num_run,
                               style_key=style_key, as_uint8=as_uint8,
                               pwct=pwct, orig_hw=orig_hw, transport=transport)
        if timed:
            jax.block_until_ready(img)
            t2 = _time.perf_counter()
        out = self._from_device(img, orig_hw, squeeze, as_uint8, transport)
        if timed:
            t3 = _time.perf_counter()
            self.last_timings = {
                "upload_s": round(t1 - t0, 3), "compute_s": round(t2 - t1, 3),
                "readback_s": round(t3 - t2, 3), "total_s": round(t3 - t0, 3)}
        return out

    def stylize_device(self, content, style, alpha: float = 1.0, *,
                       num_run: int = 1, style_key=None,
                       pwct: bool = False):
        """Device-resident stylization: (N, H, W, 3) float arrays already on
        the chip in, device array out — no host transfer on either leg.

        The public API for pipelines (benchmarks, serving fan-in) that keep
        pixels resident: it routes through the exact same dispatch as
        :meth:`stylize` — fused-slab / per-stage-slab / tiled / plain
        cascade selection, style-statistics caching via ``style_key``, and
        the full compile-failure degradation ladder — rather than poking a
        private program handle. Inputs are reflect-padded to the cascade's
        granularity and the output is cropped back to the input H, W."""
        img = jnp.asarray(content, self.dtype)
        sty = jnp.asarray(style, self.dtype)
        if img.ndim == 3:
            img = img[None]
        if sty.ndim == 3:
            sty = sty[None]
        orig_hw = (img.shape[1], img.shape[2])
        mult_h = 16 * self.space if self.space else 16
        img, _ = _pad_to_multiple(img, mult_h, 16)
        sty, _ = _pad_to_multiple(sty, mult_h, 16)
        out = self._run_device(img, sty, alpha, num_run=num_run,
                               style_key=style_key, as_uint8=False, pwct=pwct,
                               orig_hw=orig_hw, stream_ok=False)
        if out.shape[1] != orig_hw[0] or out.shape[2] != orig_hw[1]:
            out = out[:, :orig_hw[0], :orig_hw[1]]
        # same output contract as the host path (_from_device): float image
        # clipped to [0, 1] — the clip fuses into the cascade's last stage
        return jnp.clip(out, 0.0, 1.0).astype(self.dtype)

    def stylize_planes(self, y: np.ndarray, cbcr: np.ndarray, style,
                       alpha: float = 1.0, *, num_run: int = 1,
                       style_key=None) -> tuple[np.ndarray, np.ndarray]:
        """JPEG-native endpoint: content given as YCbCr 4:2:0 planes
        (Y (H, W) u8, CbCr (H/2, W/2, 2) u8 — exactly what
        ``native_codec.decode_jpeg_yuv420`` reads straight out of a JPEG
        file), stylized planes returned (feed ``encode_jpeg_yuv420``).

        End to end the host performs NO pixel math: libjpeg entropy-decodes
        to planes, the device converts/stylizes/converts, libjpeg
        entropy-encodes the result. H and W must be even.
        """
        assert y.ndim == 2 and y.shape[0] % 2 == 0 and y.shape[1] % 2 == 0, y.shape
        orig_hw = y.shape
        img = _yuv420_to_rgbf(push(y[None]), jnp.asarray(cbcr[None]))
        mult_h = 16 * self.space if self.space else 16
        img, _ = _pad_to_multiple(img.astype(self.dtype), mult_h, 16)
        sty = jnp.asarray(style)
        if sty.ndim == 3:
            sty = sty[None]
        sty = (self._u8_to_float(sty) if sty.dtype == jnp.uint8 else sty).astype(self.dtype)
        sty, _ = _pad_to_multiple(sty, mult_h, 16)
        out = self._run_device(img, sty, alpha, num_run=num_run,
                               style_key=style_key, as_uint8=False,
                               pwct=False, orig_hw=orig_hw, emit_planes=True)
        if isinstance(out, tuple):  # streamed: host planes already
            yo, co = out
            return (yo[0, : orig_hw[0], : orig_hw[1]],
                    co[0, : orig_hw[0] // 2, : orig_hw[1] // 2])
        out = out[:, : orig_hw[0], : orig_hw[1], :]
        yo, co = _rgbf_to_yuv420(out)
        return fetch(yo)[0], fetch(co)[0]

    def stylize_planes_jpeg(self, y: np.ndarray, cbcr: np.ndarray, style,
                            alpha: float = 1.0, *, style_key=None,
                            quality: int = 95) -> bytes | None:
        """JPEG-native endpoint with a streamed encode: stylize 4:2:0 planes
        and return the encoded JPEG bytes, entropy-encoding each streamed
        band (native incremental encoder, GIL released) while later bands
        are still being fetched from the device.

        Returns None when this engine/input can't stream (no fused slab
        path, below ``stream_min_pix``, native codec unavailable) — callers
        fall back to :meth:`stylize_planes` + ``encode_jpeg_yuv420``. The
        bytes are identical to that fallback (the incremental encoder is
        bit-equal to the whole-plane encode).
        """
        assert y.ndim == 2 and y.shape[0] % 2 == 0 and y.shape[1] % 2 == 0, y.shape
        orig_h, orig_w = y.shape
        if (self._fused_slab is None or self.space
                or orig_h * orig_w < self.stream_min_pix):
            return None
        img = _yuv420_to_rgbf(push(y[None]), jnp.asarray(cbcr[None]))
        return self._run_to_jpeg(img, style, alpha, style_key=style_key,
                                 quality=quality, orig_hw=(orig_h, orig_w))

    def stylize_jpeg(self, data: bytes, style, alpha: float = 1.0, *,
                     style_key=None, quality: int = 95) -> bytes | None:
        """Fully streamed JPEG-in/JPEG-out: entropy-decode the content in
        row bands (native incremental decoder, GIL released) while earlier
        bands already ride the h2d link, stylize, then entropy-encode the
        streamed output bands while later ones fetch. The host never touches
        pixel math and never holds the whole image in either direction.

        Returns None when the input is not a baseline 4:2:0 JPEG or this
        engine/input can't stream — callers fall back to
        ``decode_jpeg_yuv420`` + :meth:`stylize_planes` (+ encode).
        """
        from ..data.native_codec import jpeg_yuv420_reader

        if not self.supports_streamed_jpeg():
            return None  # before opening a decoder for nothing
        reader = jpeg_yuv420_reader(data)
        if reader is None:
            return None
        h, w = reader.h, reader.w
        if h * w < self.stream_min_pix:
            reader.close()
            return None
        # banded decode -> upload: band i decodes (C, GIL released) while
        # bands < i push from a two-worker pool
        band = max(16, (-(-h // 4) // 16) * 16)

        def bands():
            a = 0
            while a < h:
                r = min(band, h - a)
                planes = reader.read(r)
                if planes is None:
                    raise _CorruptJpeg  # decode error mid-stream
                yield planes[0][None], planes[1][None]
                a += r

        try:
            y_dev, c_dev = self._upload_plane_bands(bands())
        except _CorruptJpeg:
            return None  # caller falls back to the whole path
        img = _yuv420_to_rgbf(y_dev, c_dev)
        return self._run_to_jpeg(img, style, alpha, style_key=style_key,
                                 quality=quality, orig_hw=(h, w))

    def supports_streamed_jpeg(self) -> bool:
        """Cheap predicate: can :meth:`stylize_jpeg` possibly stream on this
        engine? Servers use it to skip the engine lock + decoder open for
        engines that would always fall back."""
        return self._fused_slab is not None and not self.space

    def _run_to_jpeg(self, img, style, alpha, *, style_key, quality,
                     orig_hw) -> bytes | None:
        """Shared tail of the JPEG endpoints: pad, cascade with a streamed
        plane sink feeding the incremental encoder, fall back to assembling
        planes when streaming didn't engage."""
        from ..data.native_codec import encode_jpeg_yuv420, jpeg_yuv420_writer

        orig_h, orig_w = orig_hw
        writer = jpeg_yuv420_writer(orig_w, orig_h, quality)
        if writer is None:
            return None
        state = {"row": 0, "ok": True, "buf": None, "written": 0}

        def sink(band):
            if not state["ok"]:
                return
            yb, cb = band  # padded-width band planes, rows even
            r0 = state["row"]
            state["row"] += yb.shape[1]
            take = min(yb.shape[1], orig_h - r0)  # drop pad rows past orig H
            if take <= 0:
                return
            yb = yb[0, :take, :orig_w]
            cb = cb[0, : take // 2, : orig_w // 2]
            if state["buf"] is not None:  # carry from a non-MCU-aligned band
                py, pc = state["buf"]
                yb = np.concatenate([py, yb])
                cb = np.concatenate([pc, cb])
                state["buf"] = None
            # intermediate writes must be 16-row (MCU) aligned; the final
            # write (reaching orig_h) may be any even height
            if state["written"] + yb.shape[0] == orig_h:
                n = yb.shape[0]
            else:
                n = (yb.shape[0] // 16) * 16
            if n:
                if not writer.write(yb[:n], cb[: n // 2]):
                    state["ok"] = False
                    return
                state["written"] += n
            if yb.shape[0] > n:
                state["buf"] = (yb[n:], cb[n // 2:])

        img = _pad_to_multiple(img.astype(self.dtype), 16, 16)[0]
        sty = self._prep_style(style)
        out = self._run_device(img, sty, alpha, num_run=1,
                               style_key=style_key, as_uint8=False,
                               pwct=False, orig_hw=(orig_h, orig_w),
                               emit_planes=True, band_sink=sink)
        if (out is None and state["ok"] and state["buf"] is None
                and state["written"] == orig_h):
            return writer.finish()
        writer.close()
        if out is None:
            return None  # streamed but a band failed: caller falls back
        # non-streamed outcome (small-image bypass, XLA fallback): the
        # cascade returned the device image — encode from assembled planes
        out = out[:, :orig_h, :orig_w, :]
        yd, cd = _rgbf_to_yuv420(out)
        yo, co = fetch(yd)[0], fetch(cd)[0]
        return encode_jpeg_yuv420(yo, co, quality=quality)

    def _prep_style(self, style) -> jax.Array:
        """Style image -> padded device float batch (shared by the plane
        endpoints; _to_device handles the content-paired variant)."""
        sty = jnp.asarray(style)
        if sty.ndim == 3:
            sty = sty[None]
        sty = (self._u8_to_float(sty) if sty.dtype == jnp.uint8 else sty).astype(self.dtype)
        return _pad_to_multiple(sty, 16, 16)[0]

    def stylize_pairs(self, pairs, alpha: float = 1.0, *, num_run: int = 1,
                      style_keys=None, as_uint8: bool = True):
        """Pipelined stylization of many (content, style) pairs.

        Three overlapping phases per pair — upload/convert, cascade, chunked
        readback — so pair i+1's upload and pair i-1's readback ride the
        host<->device link while pair i computes (the link and the chip are
        independent resources; serially they'd add up). Dispatch is async, so
        the driving thread never blocks on the device.

        ``pairs`` may be any (lazy) iterable — at most one pair is being
        decoded/uploaded ahead, so a huge grid never materializes in host
        RAM. ``style_keys``: optional per-pair statistics-cache keys
        (iterable). Yields results in order.
        """
        import itertools
        from concurrent.futures import ThreadPoolExecutor

        if style_keys is not None:
            # strict: a keys iterable shorter than pairs would otherwise
            # silently truncate the stream (zip stops at the shorter side)
            stream = iter(zip(pairs, style_keys, strict=True))
        else:
            stream = iter(zip(pairs, itertools.repeat(None)))

        def prep():
            item = next(stream, None)
            if item is None:
                return None
            (c, s), key = item
            return (*self._to_device(c, s), key)

        with ThreadPoolExecutor(2) as pool:  # one uploader + one fetcher
            nxt = pool.submit(prep)
            fetches = []
            while True:
                r = nxt.result()
                if r is None:
                    break
                img, sty, squeeze, orig_hw, transport, key = r
                nxt = pool.submit(prep)
                out = self._run_device(img, sty, alpha, num_run=num_run,
                                       style_key=key, as_uint8=as_uint8,
                                       pwct=False, orig_hw=orig_hw,
                                       transport=transport, stream_ok=False)
                fetches.append(pool.submit(
                    self._from_device, out, orig_hw, squeeze, as_uint8,
                    transport))
                # bound in-flight device images (HBM) to 2; results stream
                # out in order as their readbacks land
                if len(fetches) >= 2:
                    yield fetches.pop(0).result()
            for f in fetches:
                yield f.result()

    def _run_device(self, img, sty, alpha, *, num_run: int, style_key,
                    as_uint8: bool, pwct: bool, orig_hw, transport=None,
                    stream_ok: bool = True, emit_planes: bool = False,
                    band_sink=None):
        """Run the cascade on device-resident inputs; returns the (padded)
        device image, or a host uint8 array if a streaming path fetched it.
        ``transport`` (resolved) picks the streamed tail's wire format;
        ``stream_ok=False`` forces the monolithic program (stylize_pairs
        overlaps readback across pairs itself — an in-call streamed fetch
        would block its driving thread instead of computing the next pair)."""
        if pwct and (self.slab is not None or self._tiled_fn is not None
                     or self._fused_slab is not None):
            raise ValueError(
                "pwct=True is only supported on the plain per-stage path; "
                "construct the engine without slab_rows/space for photo-WCT")
        alpha = jnp.asarray(alpha, jnp.float32)
        if ((self._fused_slab is not None or self.slab is not None
             or self._tiled_fn is not None)
                and (img.shape[0] > 1 or sty.shape[0] > 1)):
            # their statistics passes flatten the batch into one (mean, cov),
            # whitening each image with the others' statistics — silently
            # wrong. The plain path vmaps per image; the UHD paths are
            # per-image by design.
            raise ValueError(
                "the slab/tiled ultra-resolution paths are per-image (WCT "
                "statistics would pool the batch); stylize pairs one at a "
                "time or use stylize_pairs for cross-pair pipelining")
        # an image smaller than one slab gains nothing from the slab
        # structure but would pay 2*margin-plus rows of reflect padding
        # (e.g. thumbnails hitting a --slab_rows server): use the plain
        # per-stage cascade below
        small = self.slab is not None and img.shape[1] < 2 * self.slab.margin
        if self._fused_slab is not None and not small:
            fn, fparams = self._fused_slab
            # pad H to slab granularity (one program shape per padded H)
            slab = self.slab.slab_rows
            hp = -(-img.shape[1] // slab) * slab
            if hp - img.shape[1] > slab // 4:
                # awkward height: rebuild with an evenly-dividing slab size
                from .slab import SlabCascade, build_fused_slab_cascade
                better = SlabCascade.pick_slab_rows(
                    img.shape[1], slab, self.slab.margin, self.slab.down_max)
                if better != slab:
                    key = ("fused", better)
                    if key not in self._stage_fns:
                        self._stage_fns[key] = build_fused_slab_cascade(
                            self.pyramid, stages=self.stages, slab_rows=better,
                            method=self.method, newton_iters=self.newton_iters,
                            packed=self.slab.packed, external_style_stats=True,
                            params=fparams)
                    fn, fparams = self._stage_fns[key]
                    slab = better
                    hp = -(-img.shape[1] // slab) * slab
            if hp != img.shape[1]:
                img = jnp.pad(img, ((0, 0), (0, hp - img.shape[1]), (0, 0), (0, 0)),
                              mode="reflect")
            sstats = self._fused_style_stats(sty, style_key)
            # streamed tail: for big uint8 outputs, stop the fused program
            # before the last stage's apply and stream that stage back in
            # fine bands — the d2h readback (the UHD bottleneck on this
            # link) overlaps the remaining bands' compute and the host-side
            # 4:2:0 reassembly instead of starting after everything else
            stream = (stream_ok and (as_uint8 or emit_planes)
                      and num_run == 1
                      and img.shape[1] * img.shape[2] >= self.stream_min_pix)
            completed = 0
            try:
                if stream:
                    key = ("fused_head", slab)
                    if key not in self._stage_fns:
                        from .slab import build_fused_slab_cascade
                        self._stage_fns[key] = build_fused_slab_cascade(
                            self.pyramid, stages=self.stages, slab_rows=slab,
                            method=self.method, newton_iters=self.newton_iters,
                            packed=self.slab.packed, external_style_stats=True,
                            tail_stats=True, params=fparams)
                    head, hparams = self._stage_fns[key]
                    h_img, t, cm, sm = head(hparams, img, sstats, alpha)
                    emit = ("planes" if emit_planes
                            else "yuv420" if transport == "yuv420" else "u8")
                    return self.slab.stream_last_stage(h_img, t, cm, sm, alpha,
                                                       emit=emit,
                                                       on_band=band_sink)
                while completed < num_run:
                    img = fn(fparams, img, sstats, alpha)
                    completed += 1
            except _XLA_ERRORS as e:
                # very large fused programs can fail to compile/execute (seen
                # with teacher widths at UHD through the remote compiler);
                # degrade to per-stage slab programs for this engine. Only
                # compiler/runtime errors are caught — a TypeError/ValueError
                # from a real bug still surfaces. The rebuilt programs must
                # not be able to contain whatever kernel just failed, so the
                # Pallas conv routes are force-disabled first (r3 postmortem:
                # the old ladder re-traced the same failing conv1x1 kernel
                # inside the per-stage programs and crashed identically) and
                # the cached per-stage programs are dropped so they re-trace
                # under the disabled gate.
                import warnings
                from ..ops.pallas.conv import disable_pallas_conv
                warnings.warn(
                    f"fused cascade failed ({type(e).__name__}: {e}); falling "
                    f"back to per-stage slab programs", RuntimeWarning)
                disable_pallas_conv(f"fused cascade {type(e).__name__}")
                self._stage_fns.clear()
                self._fused_slab = None
                if self.slab.packed:
                    # With Pallas disabled, packed convs route to the XLA
                    # wide packed-conv lowering that historically crashed
                    # the remote TPU compiler at teacher widths (packed
                    # W >= 5120 at UHD). The degraded path must not be able
                    # to contain that kernel class either — rebuild the
                    # slab unpacked (slower, but this path only exists to
                    # finish the request).
                    from .slab import SlabCascade
                    self.slab = SlabCascade(
                        self.pyramid, stages=self.stages,
                        slab_rows=self.slab.slab_rows, method=self.method,
                        newton_iters=self.newton_iters, packed=False)
                for i in range(completed, num_run):
                    stream = as_uint8 and i == num_run - 1
                    img = self.slab.stylize(img, sty, alpha, to_host_uint8=stream)
        elif self.slab is not None and not small:
            for i in range(num_run):
                stream = as_uint8 and i == num_run - 1
                img = self.slab.stylize(img, sty, alpha, to_host_uint8=stream)
        elif self._tiled_fn is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sharding = NamedSharding(self.mesh, P(None, "space", None, None))
            if self._tiled_slab:
                # slab-in-shard path: pad H to slab granularity per shard;
                # style statistics are precomputed once (and cached per
                # style_key) instead of re-encoding the style through every
                # encoder on every shard on every run
                mult = self._tiled_slab * self.space
                hp = -(-img.shape[1] // mult) * mult
                if hp != img.shape[1]:
                    img = jnp.pad(img, ((0, 0), (0, hp - img.shape[1]), (0, 0), (0, 0)),
                                  mode="reflect")
                sstats = {k: self._style_stats(k, sty, cache_key=style_key)
                          for k in self.stages}
                sty = jax.device_put(sstats, NamedSharding(self.mesh, P()))
            else:
                # the per-conv-halo path (space>0 without slab_rows) holds
                # FULL per-shard feature maps: at stage 1 that is
                # 24ch x 4B x H/space x W per chip plus the pyramid's
                # intermediates — the same O(H*W) footprint whose avoidance
                # is the whole point of the slab cascade. Refuse ultra-
                # resolution inputs with a pointer instead of an opaque
                # device OOM minutes into a compile.
                per_shard_pix = img.shape[1] * img.shape[2] / max(self.space, 1)
                if per_shard_pix > _TILED_MAX_SHARD_PIX:
                    raise ValueError(
                        f"{img.shape[1]}x{img.shape[2]} over space={self.space} "
                        f"leaves {per_shard_pix / 1e6:.0f} MPix of full-height "
                        f"feature maps per chip on the per-conv-halo path; "
                        f"construct the engine with slab_rows (HBM-bounded "
                        f"slab-in-shard cascade) for images this large, or "
                        f"raise CD_TPU_TILED_MAX_SHARD_PIX explicitly")
                sty = jax.device_put(sty, sharding)
            img = jax.device_put(img, sharding)
            for _ in range(num_run):
                img = self._tiled_fn(self._tiled_params, img, sty, alpha)
        else:
            for _ in range(num_run):
                for k in self.stages:
                    s_mean, s_cov = self._style_stats(k, sty, cache_key=style_key)
                    img = self._stage_fn(k, pwct)(self.params[k]["enc"], self.params[k]["dec"],
                                                  img, s_mean, s_cov, alpha)
        return img

    @staticmethod
    @jax.jit
    def _u8_to_float(x):
        return x.astype(jnp.float32) / 255.0

    @staticmethod
    @jax.jit
    def _float_to_u8(x):
        return (jnp.clip(x.astype(jnp.float32), 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
