"""Single-chip ultra-resolution path: shingled row-slab processing.

A 10240x4096 (42 MPix) image cannot hold its stage-1/2 feature maps in one
piece in 16 GB of HBM — XLA pads the 16/24-channel features 8x onto the
128-wide lane axis, so the naive full-image cascade wants ~20 GB (measured).
The reference hits the same wall on a 12 GB GPU and works around it with CPU
float64 SVD + empty_cache + 16x compression (WCT.py:100-105). The TPU-native
answer on a *single* chip is to stream the image through the pyramid in
overlapping row slabs:

* every slab is extended by ``margin`` rows on each side — at least the
  combined encoder+decoder receptive-field radius (70 + 70 input pixels for
  the stage-5 autoencoder) — so the slab's *interior* rows are bit-equal to
  the full-image computation;
* WCT statistics are exact: pass 1 accumulates per-slab partial sums over
  interior feature rows only (the same psum-free decomposition as
  parallel/spatial.py's ``feature_stats_psum``);
* pass 2 re-encodes each slab, applies the precomputed coloring transform,
  decodes, and writes back interior rows. Peak HBM is bounded by the slab
  size, independent of image height.

Global top/bottom edges are exact: edge slabs start/end at the true image
boundary, so the per-conv reflection the encoder applies there IS the
reference's global-edge semantics; contamination from the arithmetically
wrong reflection at interior slab-array edges dies within the receptive
radius and is cropped.

:class:`SlabCascade` compiles two programs per pyramid level (reused across
slabs); :func:`build_fused_slab_cascade` compiles the WHOLE cascade into one
program (scan over slabs) and is the production path — see docs/DESIGN.md for
the measured difference. ``packed=True`` runs the width-packed lane-dense
pipeline (models/packed_vgg.py) — same math, ~F x less HBM traffic on the
skinny stages.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models.specs import StageSpec
from ..models.vgg import apply_decoder, apply_encoder
from ..models.packed_vgg import (
    apply_decoder_packed,
    apply_encoder_packed,
    pack_stage_params,
    packed_feature_stats,
    packed_wct_apply,
    plan_packing,
)
from ..ops.wct_transform import coloring_matrix

__all__ = ["receptive_radius", "SlabCascade", "build_fused_slab_cascade"]

_HIGH = lax.Precision.HIGHEST


def _to_u8(x):
    """The one float->uint8 output conversion (round-half-up); every output
    path must use this so streamed and monolithic results stay comparable."""
    return (jnp.clip(x.astype(jnp.float32), 0.0, 1.0) * 255.0
            + 0.5).astype(jnp.uint8)


# ---- shared fused-cascade building blocks (also used by the multi-chip
#      build_tiled_slab_cascade in parallel/spatial.py — one implementation,
#      so a stats/packing fix can't silently drift between the paths) ----

def _encode_any(pk, sl, spec: StageSpec, packed: bool):
    """(features, packing factor) for one (extended) slab."""
    if packed:
        return apply_encoder_packed(pk, sl, spec)
    return apply_encoder(pk, sl, spec, pallas_conv=True)["out"], 1


def _stats_from_feats(feats, f, c, offset_f, interior_f):
    """(sum(C), gram(C,C), n_pixels) over the interior feature rows of a
    (possibly width-packed) feature slab. On TPU with lane-dense widths the
    single-pass fused Pallas sum+gram kernel applies (measured 1.58x the XLA
    two-reduction at P=10.5M, C=128; HIGHEST-precision gram either way).
    Sub-dense widths (e.g. stage-1's 96 lanes) use it too: in-graph, XLA
    lowers the (P,C)^T(P,C) gram as a convolution whose two operand layouts
    disagree, paying a full-map relayout copy before the reduction (r3
    trace: 33+14 ms at stage-1 UHD vs ~18 ms for the Pallas pass)."""
    inner = lax.dynamic_slice_in_dim(feats, offset_f, interior_f, axis=1)
    n_px = inner.shape[0] * inner.shape[1] * inner.shape[2] * f
    x = inner.reshape(-1, inner.shape[-1]).astype(jnp.float32)
    if jax.default_backend() == "tpu" and x.shape[-1] % 8 == 0:
        from ..ops.pallas.stats import fused_sum_gram
        s, gram = fused_sum_gram(x)
    else:
        s = jnp.sum(x, axis=0)
        gram = lax.dot_general(x, x, (((0,), (0,)), ((), ())), precision=_HIGH,
                               preferred_element_type=jnp.float32)
    s1 = s.reshape(f, c).sum(axis=0)
    if f > 1:
        gram = jnp.einsum("icid->cd", gram.reshape(f, c, f, c), precision=_HIGH)
    return s1, gram, n_px


def _color_decode_feats(feats, f, dk, spec_d: StageSpec, t, c_mean, s_mean,
                        alpha, offset, interior: int, packed: bool):
    """WCT-color + decode one feature slab, slice ``interior`` output rows
    starting at ``offset`` (image scale)."""
    c = t.shape[0]
    csf = packed_wct_apply(feats, f, c, t, c_mean, s_mean, alpha)
    if packed:
        dec = apply_decoder_packed(dk, csf, f, spec_d)
    else:
        dec = apply_decoder(dk, csf, spec_d, pallas_conv=True)["out"]
    return lax.dynamic_slice_in_dim(dec, offset, interior, axis=1)


def _style_stats_whole(pk, style, spec: StageSpec, c, packed: bool):
    """(mean, cov) of a whole (small) style image's stage features."""
    s_feats, sf = _encode_any(pk, style, spec, packed)
    if packed:
        return packed_feature_stats(s_feats, sf, c)
    x2 = s_feats.reshape(-1, c).astype(jnp.float32)
    s_mean = jnp.mean(x2, axis=0)
    xc = x2 - s_mean
    s_cov = lax.dot_general(xc, xc, (((0,), (0,)), ((), ())), precision=_HIGH,
                            preferred_element_type=jnp.float32) / (x2.shape[0] - 1)
    return s_mean, s_cov


def receptive_radius(spec: StageSpec) -> int:
    """Receptive-field radius in input pixels of a stage spec (each 3x3 conv
    adds its current downsample factor; pools double it; decoder mirrors)."""
    r, d = 0, 1
    if spec.kind == "encoder":
        for layer in spec.layers:
            r += d
            if layer.pool_after:
                d *= 2
        return r
    # decoder: walk output->input (reversed spec order); a conv that is
    # followed by an unpool runs at the coarser scale, so double first.
    for layer in reversed(spec.layers):
        if layer.unpool_after:
            d *= 2
        r += d
    return r


def _slab_stats(enc_params, slab_ext, offset_f, spec: StageSpec, interior_f: int):
    """(sum(C), gram(C,C)) over the slab's interior feature rows.

    ``offset_f`` (traced) is where the exact interior starts at feature scale:
    0 for the top edge slab (whose top boundary is the real image boundary and
    therefore per-conv-reflect-exact), ``margin_f`` otherwise.
    """
    feats = apply_encoder(enc_params, slab_ext, spec, pallas_conv=True)["out"]
    inner = lax.dynamic_slice_in_dim(feats, offset_f, interior_f, axis=1)
    c = inner.shape[-1]
    x = inner.reshape(-1, c).astype(jnp.float32)
    s1 = jnp.sum(x, axis=0)
    s2 = lax.dot_general(x, x, (((0,), (0,)), ((), ())), precision=_HIGH,
                         preferred_element_type=jnp.float32)
    return s1, s2


def _slab_apply(enc_params, dec_params, slab_ext, offset, t, c_mean, s_mean, alpha,
                enc_spec: StageSpec, dec_spec: StageSpec, interior: int):
    """Encode -> color -> decode one extended slab; return interior rows."""
    feats = apply_encoder(enc_params, slab_ext, enc_spec, pallas_conv=True)["out"]
    csf = packed_wct_apply(feats, 1, feats.shape[-1], t, c_mean, s_mean, alpha)
    dec = apply_decoder(dec_params, csf, dec_spec, pallas_conv=True)["out"]
    return lax.dynamic_slice_in_dim(dec, offset, interior, axis=1)


def _slab_stats_packed(enc_packed, slab_ext, offset_f, spec: StageSpec,
                       interior_f: int, c: int):
    """Packed-pipeline version of :func:`_slab_stats` (H slicing is unchanged
    by width packing)."""
    feats, f = apply_encoder_packed(enc_packed, slab_ext, spec)
    inner = lax.dynamic_slice_in_dim(feats, offset_f, interior_f, axis=1)
    p_eff = inner.shape[0] * inner.shape[1] * inner.shape[2] * f
    x = inner.reshape(-1, inner.shape[-1]).astype(jnp.float32)
    if jax.default_backend() == "tpu" and x.shape[-1] % 8 == 0:
        # single-pass fused sum+gram Pallas kernel (1.4x XLA, measured)
        from ..ops.pallas.stats import fused_sum_gram
        s, gram = fused_sum_gram(x)
    else:
        s = jnp.sum(x, axis=0)
        gram = lax.dot_general(x, x, (((0,), (0,)), ((), ())), precision=_HIGH,
                               preferred_element_type=jnp.float32)
    s1 = s.reshape(f, c).sum(axis=0)
    if f > 1:
        diag = jnp.einsum("icid->cd", gram.reshape(f, c, f, c), precision=_HIGH)
    else:
        diag = gram
    return s1, diag, p_eff


def _slab_apply_packed(enc_packed, dec_packed, slab_ext, offset, t, c_mean,
                       s_mean, alpha, enc_spec: StageSpec, dec_spec: StageSpec,
                       interior: int):
    feats, f = apply_encoder_packed(enc_packed, slab_ext, enc_spec)
    c = t.shape[0]
    csf = packed_wct_apply(feats, f, c, t, c_mean, s_mean, alpha)
    dec = apply_decoder_packed(dec_packed, csf, f, dec_spec)
    return lax.dynamic_slice_in_dim(dec, offset, interior, axis=1)


class SlabCascade:
    """Streaming 5-level WCT cascade with bounded HBM (single chip).

    ``slab_rows`` interior rows per slab; ``margin`` >= enc+dec receptive
    radius (auto-computed). All rows quantities are multiples of the deepest
    stage's downsample factor so feature-space slicing is integral.
    """

    def __init__(self, pyramid, *, stages=(5, 4, 3, 2, 1), slab_rows: int = 1024,
                 method: str = "eigh", newton_iters: int = 24, eps: float = 1e-8,
                 packed: bool = False, packed_params=None):
        self.pyramid = pyramid
        self.packed = packed
        if packed:
            # ``packed_params``: share an existing packed tree (the engine
            # builds several cascade variants over the same weights — a
            # fresh pack per variant would duplicate every stage's params
            # in HBM)
            self.packed_params = packed_params if packed_params is not None else {
                k: {"enc": pack_stage_params(pyramid[k]["enc"], pyramid[k]["enc_spec"]),
                    "dec": pack_stage_params(pyramid[k]["dec"], pyramid[k]["dec_spec"])}
                for k in stages}
        self.stages = tuple(stages)
        self.method = method
        self.newton_iters = newton_iters
        self.eps = eps
        self.down_max = 2 ** (max(stages) - 1)
        # Per-stage margins: each stage only needs ITS OWN enc+dec receptive
        # radius of ghost rows (144/64/32/16/16 for the 16x pyramid) — using
        # the deepest stage's margin everywhere would re-encode ~13% extra
        # rows at the shallow stages for nothing.
        self.margins = {
            k: -(-(receptive_radius(pyramid[k]["enc_spec"])
                   + receptive_radius(pyramid[k]["dec_spec"]))
                 // self.down_max) * self.down_max
            for k in stages}
        self.margin = max(self.margins.values())
        self.slab_rows = -(-slab_rows // self.down_max) * self.down_max
        self._stats_fns = {}
        self._apply_fns = {}
        self._style_fns = {}

    @staticmethod
    def pick_slab_rows(h: int, target: int, margin: int, gran: int) -> int:
        """Slab size that divides the padded height as evenly as possible:
        largest slab <= target (multiple of ``gran``, >= 2*margin) minimizing
        the pad waste of rounding ``h`` up to a slab multiple."""
        floor_slab = max(2 * margin, gran)
        best, best_waste = None, None
        cand = floor_slab
        while cand <= max(target, floor_slab):
            waste = (-h) % cand
            if best is None or waste < best_waste or (waste == best_waste and cand > best):
                best, best_waste = cand, waste
            cand += gran
        return best

    # ---- jitted per-stage programs (shape-cached by XLA; two shapes per
    #      stage: edge slabs carry one margin, mid slabs two) ----

    def _coloring_fn(self):
        if "color" not in self._apply_fns:
            self._apply_fns["color"] = jax.jit(partial(
                coloring_matrix, method=self.method, eps=self.eps,
                newton_iters=self.newton_iters))
        return self._apply_fns["color"]

    def _stats_fn(self, k):
        if k not in self._stats_fns:
            spec = self.pyramid[k]["enc_spec"]
            down = 2 ** (k - 1)
            if self.packed:
                self._stats_fns[k] = jax.jit(partial(
                    _slab_stats_packed, spec=spec,
                    interior_f=self.slab_rows // down, c=spec.out_channels))
            else:
                self._stats_fns[k] = jax.jit(partial(
                    _slab_stats, spec=spec, interior_f=self.slab_rows // down))
        return self._stats_fns[k]

    def _apply_fn(self, k):
        if k not in self._apply_fns:
            enc_spec = self.pyramid[k]["enc_spec"]
            dec_spec = self.pyramid[k]["dec_spec"]
            fn = _slab_apply_packed if self.packed else _slab_apply
            self._apply_fns[k] = jax.jit(partial(
                fn, enc_spec=enc_spec, dec_spec=dec_spec,
                interior=self.slab_rows))
        return self._apply_fns[k]

    def _style_stats(self, k, style):
        if k not in self._style_fns:
            spec = self.pyramid[k]["enc_spec"]

            if self.packed:
                def fp(p, s):
                    feats, f_ = apply_encoder_packed(p, s, spec)
                    return packed_feature_stats(feats, f_, spec.out_channels)
                self._style_fns[k] = jax.jit(fp)
            else:
                def f(p, s):
                    feats = apply_encoder(p, s, spec, pallas_conv=True)["out"]
                    c = feats.shape[-1]
                    x = feats.reshape(-1, c).astype(jnp.float32)
                    mean = jnp.mean(x, axis=0)
                    xc = x - mean
                    cov = lax.dot_general(xc, xc, (((0,), (0,)), ((), ())),
                                          precision=_HIGH,
                                          preferred_element_type=jnp.float32) / (x.shape[0] - 1)
                    return mean, cov

                self._style_fns[k] = jax.jit(f)
        enc = self.packed_params[k]["enc"] if self.packed else self.pyramid[k]["enc"]
        return self._style_fns[k](enc, style)

    # ---- driver ----

    def _slabs(self, h: int, stage: int | None = None, slab: int | None = None):
        """Yield (input_start, input_rows, interior_offset) per slab.

        Edge slabs start/end at the true image boundary, so the per-conv
        reflection the encoder applies there IS the reference's global-edge
        semantics; mid slabs carry a margin on both sides. Contamination from
        the arithmetically-wrong reflection at interior slab-array edges dies
        within the receptive radius and is cropped by the interior offset.

        ``stage``: use that stage's own (smaller) margin; None = the max.
        ``slab``: override the slab size (must divide ``h``); None = the
        cascade's configured ``slab_rows``.
        """
        slab = slab if slab is not None else self.slab_rows
        m = self.margins[stage] if stage is not None else self.margin
        n_slabs = h // slab
        if n_slabs == 1:
            yield 0, h, 0
            return
        assert slab >= 2 * m, (
            f"slab_rows ({slab}) must be >= 2*margin ({2 * m}) so edge slabs "
            f"share the mid-slab shape")
        for i in range(n_slabs):
            if i == 0:
                yield 0, slab + 2 * m, 0
            elif i == n_slabs - 1:
                yield h - slab - 2 * m, slab + 2 * m, 2 * m
            else:
                yield i * slab - m, slab + 2 * m, m

    def stylize(self, content: jax.Array, style: jax.Array, alpha=1.0,
                *, to_host_uint8: bool = False):
        """content (1, H, W, 3); style (1, Hs, Ws, 3) small enough to encode
        whole. H is padded to slab granularity internally.

        ``to_host_uint8``: stream the *final* stage's slabs back to the host
        as uint8 while the next slab computes — overlaps the (slow) d2h link
        with device work; returns a numpy (1, H, W, 3) uint8 array.
        """
        n, h, w, _ = content.shape
        assert n == 1, "slab path is per-image"
        slab = self.slab_rows
        n_slabs = -(-h // slab)
        pad_h = n_slabs * slab - h
        img = content
        if pad_h:
            img = jnp.pad(img, ((0, 0), (0, pad_h), (0, 0), (0, 0)), mode="reflect")
        hp = img.shape[1]
        alpha = jnp.asarray(alpha, jnp.float32)

        for k in self.stages:
            enc = self.pyramid[k]["enc"]
            dec = self.pyramid[k]["dec"]
            down = 2 ** (k - 1)
            s_mean, s_cov = self._style_stats(k, style)
            enc_in = self.packed_params[k]["enc"] if self.packed else enc
            dec_in = self.packed_params[k]["dec"] if self.packed else dec
            # pass 1: exact global content stats from interior feature rows.
            # The packed path's pixel count stays a device scalar — int()ing
            # it here would force a host sync per slab, serializing dispatch
            # (every launch is an RPC on the remote relay)
            s1 = s2 = count = None
            stats = self._stats_fn(k)
            for start, rows, off in self._slabs(hp, k):
                r = stats(enc_in,
                          lax.dynamic_slice_in_dim(img, start, rows, axis=1),
                          jnp.int32(off // down))
                a, b = r[0], r[1]
                c = r[2] if len(r) > 2 else None
                s1 = a if s1 is None else s1 + a
                s2 = b if s2 is None else s2 + b
                if c is not None:
                    count = c if count is None else count + c
            if count is None:
                count = n_slabs * (slab // down) * (img.shape[2] // down)
            c_mean = s1 / count
            c_cov = (s2 - count * jnp.outer(c_mean, c_mean)) / (count - 1)
            t = self._coloring_fn()(c_cov, s_cov)
            # pass 2: transform + decode slab interiors
            apply = self._apply_fn(k)
            last_stage = k == self.stages[-1]
            if last_stage and to_host_uint8:
                if "u8" not in self._apply_fns:
                    self._apply_fns["u8"] = jax.jit(_to_u8)
                u8 = self._apply_fns["u8"]
                from ..utils.transfer import fetch
                host: list[np.ndarray] = []
                pending = None
                for start, rows, off in self._slabs(hp, k):
                    cur = u8(apply(enc_in, dec_in,
                                   lax.dynamic_slice_in_dim(img, start, rows, axis=1),
                                   jnp.int32(off), t, c_mean, s_mean, alpha))
                    if pending is not None:
                        # threaded chunked readback, overlapping cur's compute
                        host.append(fetch(pending))
                    pending = cur
                host.append(fetch(pending))
                return np.concatenate(host, axis=1)[:, :h]
            outs = []
            for start, rows, off in self._slabs(hp, k):
                outs.append(apply(enc_in, dec_in,
                                  lax.dynamic_slice_in_dim(img, start, rows, axis=1),
                                  jnp.int32(off), t, c_mean, s_mean, alpha))
            img = jnp.concatenate(outs, axis=1)
        return img[:, :h]

    # ---- streamed final stage (overlap d2h readback with device work) ----

    def _tail_fn(self, k, emit: str, interior: int):
        """Jitted: one extended slab -> last-stage apply -> interior rows ->
        device-side uint8 RGB (emit='u8') or 4:2:0 planes (emit='yuv420',
        reassembled to RGB on the host, or 'planes', returned as planes)."""
        key = ("tail", k, emit, interior)
        if key not in self._apply_fns:
            enc_spec = self.pyramid[k]["enc_spec"]
            dec_spec = self.pyramid[k]["dec_spec"]
            base = _slab_apply_packed if self.packed else _slab_apply

            def f(ek, dk, sl, off, t, cm, sm, alpha):
                dec = base(ek, dk, sl, off, t, cm, sm, alpha,
                           enc_spec=enc_spec, dec_spec=dec_spec,
                           interior=interior)
                if emit in ("yuv420", "planes"):
                    from ..utils.colorspace import rgbf_to_yuv420_device
                    return rgbf_to_yuv420_device(dec)
                return _to_u8(dec)

            self._apply_fns[key] = jax.jit(f)
        return self._apply_fns[key]

    def stream_last_stage(self, img, t, c_mean, s_mean, alpha, *,
                          emit: str = "u8", rows: int | None = None,
                          on_band=None) -> np.ndarray | None:
        """Apply the cascade's LAST stage in fine row bands, streaming each
        band to the host while the next one computes.

        ``img``: (1, H, W, 3) device image *entering* the last stage (e.g.
        the ``tail_stats=True`` fused program's output); ``t, c_mean,
        s_mean``: that stage's precomputed coloring ingredients. The bands
        use the stage's own margin (e.g. 16 rows for stage 1), so the band
        layout is independent of — and much finer than — ``slab_rows``; the
        interiors are the same rows the monolithic apply produces. Readback
        (the UHD bottleneck on a slow link: 126 MB RGB / 63 MB 4:2:0) and
        the host-side 4:2:0->RGB reassembly overlap the remaining bands'
        device compute. Returns host uint8 RGB (1, H, W, 3) — or, with
        ``emit='planes'``, host 4:2:0 planes ``(Y (1,H,W), CbCr
        (1,H/2,W/2,2))`` for JPEG-native serving (no RGB reassembly at all).

        ``on_band``: optional consumer called with each band's host result
        IN ORDER (for ``'planes'``: that band's ``(y, cbcr)``) while later
        bands are still fetching — e.g. an incremental JPEG encoder. When
        set, nothing is assembled and the method returns None.
        """
        k = self.stages[-1]
        m = self.margins[k]
        hp = img.shape[1]
        # 4:2:0 planes need even band heights (chroma boxes must not
        # straddle bands); an odd-granularity pyramid (stage-1-only with an
        # odd slab size) may have no even banding at all — emit plain uint8
        # RGB then (the caller's output contract is host RGB either way,
        # only the wire format changes)
        gran = self.down_max
        if emit == "yuv420":
            if hp % 2:
                emit = "u8"
            else:
                gran = max(gran, 2) if gran % 2 else gran
        elif emit == "planes":
            # plane output has no RGB fallback; the caller guarantees even
            # padded dims (stylize_planes pads to 16)
            assert hp % 2 == 0 and img.shape[2] % 2 == 0, img.shape
            gran = max(gran, 2) if gran % 2 else gran
        if rows is None:
            # ~8 bands, multiple of the pyramid granularity, dividing H
            target = max(2 * m, -(-hp // 8 // gran) * gran)
            rows = next((r for r in range(target, hp + 1, gran)
                         if hp % r == 0 and r % gran == 0), hp)
        if hp % rows or rows % gran:
            rows = hp  # single band: always valid (hp is gran-granular or
            #            the emit was already downgraded above)
        assert hp % rows == 0, (hp, rows)
        n = hp // rows
        enc = self.packed_params[k]["enc"] if self.packed else self.pyramid[k]["enc"]
        dec = self.packed_params[k]["dec"] if self.packed else self.pyramid[k]["dec"]
        alpha = jnp.asarray(alpha, jnp.float32)
        slabs = list(self._slabs(hp, k, slab=rows))
        interior = rows if n > 1 else hp
        fn = self._tail_fn(k, emit, interior)
        # dispatch every band up front (async; the device queue serializes),
        # then collect concurrently: fetch of band i rides the link while
        # bands i+1.. compute, and the native 4:2:0->RGB reassembly of band
        # i overlaps the fetch of band i+1 (ctypes releases the GIL)
        devs = [fn(enc, dec,
                   lax.dynamic_slice_in_dim(img, start, rws, axis=1),
                   jnp.int32(off), t, c_mean, s_mean, alpha)
                for start, rws, off in slabs]
        from ..utils.transfer import fetch

        def collect(d):
            if emit == "planes":
                return (fetch(d[0], min_bytes=1 << 20, chunks=8),
                        fetch(d[1], min_bytes=1 << 20, chunks=4))
            if emit == "yuv420":
                from ..utils.colorspace import yuv420_to_rgb_host
                y = fetch(d[0], min_bytes=1 << 20, chunks=8)
                cb = fetch(d[1], min_bytes=1 << 20, chunks=4)
                return yuv420_to_rgb_host(y, cb)
            return fetch(d, min_bytes=1 << 20, chunks=16)

        if n == 1:
            results = iter([collect(devs[0])])
            if on_band is not None:
                on_band(next(results))
                return None
            outs = list(results)
        elif on_band is not None:
            # feed bands in order as they land; the consumer runs on this
            # thread while the pool keeps fetching ahead (a native consumer
            # releases the GIL, so encode overlaps fetch for real)
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(3) as ex:
                for out in ex.map(collect, devs):
                    on_band(out)
            return None
        else:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(3) as ex:
                outs = list(ex.map(collect, devs))
        if emit == "planes":
            return (np.concatenate([o[0] for o in outs], axis=1),
                    np.concatenate([o[1] for o in outs], axis=1))
        return outs[0] if len(outs) == 1 else np.concatenate(outs, axis=1)


def build_fused_slab_cascade(pyramid, *, stages=(5, 4, 3, 2, 1), slab_rows: int = 1024,
                             method: str = "eigh", newton_iters: int = 24,
                             eps: float = 1e-8, packed: bool = False,
                             feature_cache_bytes: int = 6_500_000_000,
                             external_style_stats: bool = False,
                             tail_stats: bool = False, params=None):
    """One compiled program for the whole slab cascade.

    The per-slab python loops of :class:`SlabCascade` become ``lax.scan``s
    *inside* a single jit: pass 1 scans slabs accumulating (sum, gram), pass 2
    scans slabs writing decoded interiors into the output image via
    ``dynamic_update_slice``. One dispatch and one compile unit for the whole
    5-level pyramid instead of ~50 program launches — matters when every
    launch is an RPC (remote TPU) and compile time is tunnel-bound.

    Stages whose full per-image encoder features fit in ``feature_cache_bytes``
    carry them out of the stats scan as stacked scan outputs, so pass 2 skips
    the re-encode (measured ~0.8 s of the 2.8 s UHD cascade). At UHD every
    16x stage fits (stage 1 is the largest at ~4.1 GB), and the 6.5 GB
    default also catches the packed teacher's stage 2 (5.4 GB; measured
    3.77 -> 3.59 s at UHD slab 1024 with HBM to spare) — only teacher
    stage 1 (10.7 GB) stays recompute-only.

    Returns ``(fn, params)`` where ``fn(params, img, style, alpha) -> img``
    expects H == a multiple of slab_rows (>= 2*margin) and W a multiple of 16
    (and of 8 when packed).

    ``external_style_stats``: the cascade re-encodes the style image at every
    run; with per-style caching (the engine's ``style_key``) that encode is
    pure waste (~0.4 s of the 2.1 s UHD cascade). When True, ``fn`` takes
    ``{stage: (mean, cov)}`` precomputed statistics instead of the raw style
    image (compute them once via :meth:`SlabCascade._style_stats`).

    ``tail_stats``: stop before the LAST stage's apply scan — run its stats
    pass only and return ``(img, t, c_mean, s_mean)`` (the image entering
    the last stage plus that stage's coloring ingredients). Feed these to
    :meth:`SlabCascade.stream_last_stage`, which applies the final stage in
    fine bands streamed to the host while the device is still working —
    overlapping the slow d2h readback with compute instead of serializing
    them after a monolithic program.
    """
    # ``params``: pass an existing (packed) param tree to avoid re-packing a
    # second device-resident copy — the engine shares one tree between its
    # mono program, head program, and SlabCascade
    helper = SlabCascade(pyramid, stages=stages, slab_rows=slab_rows,
                         method=method, newton_iters=newton_iters, eps=eps,
                         packed=packed, packed_params=params if packed else None)
    slab, m = helper.slab_rows, helper.margin
    if params is None:
        params = helper.packed_params if packed else {
            k: {"enc": pyramid[k]["enc"], "dec": pyramid[k]["dec"]} for k in stages}
    # CD_TPU_SLAB_UNROLL > 1 unrolls the per-slab scans up to that factor:
    # with few slabs (UHD at slab 2048 has 2) the slab indices become
    # constants, turning dynamic_slice/dynamic_update_slice into static ops
    # XLA can fuse away (profile attribution: ~8% of the cascade in scan
    # output writes + part of the 21% copy/relayout time). On-device A/B at
    # UHD (r3): 1.903 s rolled vs 1.854 s fully unrolled (+2.6%), +5 s cold
    # compile, outputs equal within eigh rounding — so the DEFAULT fully
    # unrolls 2-slab scans (the UHD shape) and keeps larger counts rolled
    # (compile cost grows with the factor; gain unmeasured there).
    # Correctness is pinned by the unrolled variant of the fused==per-stage
    # test.
    _unroll_env = os.environ.get("CD_TPU_SLAB_UNROLL")
    unroll_cap = None if _unroll_env is None else int(_unroll_env)

    def _encode(pk, sl, spec):
        return _encode_any(pk, sl, spec, packed)

    def fn(p, img, style, alpha):
        h = img.shape[1]
        if h < slab or h % slab:
            # direct callers (the engine pads/bypasses before calling): fail
            # loudly instead of scanning over zero slabs or dropping rows
            raise ValueError(
                f"image height {h} must be a positive multiple of slab_rows="
                f"{slab}; pad the image or pick a smaller slab "
                f"(WCTEngine.stylize does both automatically)")
        n_slabs = h // slab
        unroll = (min(unroll_cap, n_slabs) if unroll_cap is not None
                  else (n_slabs if n_slabs <= 2 else 1))
        for k in stages:
            mk = helper.margins[k]  # per-stage ghost rows (144..16)
            slabs_py = list(helper._slabs(h, k))
            starts = jnp.asarray([s for s, _, _ in slabs_py], jnp.int32)
            offs = jnp.asarray([o for _, _, o in slabs_py], jnp.int32)
            rows = slab + (2 * mk if n_slabs > 1 else 0)
            spec_e = pyramid[k]["enc_spec"]
            spec_d = pyramid[k]["dec_spec"]
            down = 2 ** (k - 1)
            c = spec_e.out_channels
            if external_style_stats:
                s_mean, s_cov = style[k]
                s_mean = s_mean.astype(jnp.float32)
                s_cov = s_cov.astype(jnp.float32)
            else:
                # style statistics (style is small; encoded whole)
                s_mean, s_cov = _style_stats_whole(p[k]["enc"], style, spec_e,
                                                   c, packed)

            last_is_tail = tail_stats and k == stages[-1]
            interior_f = slab // down
            # decide feature caching from the stacked-feature byte size
            # (probe one slab's feature shape cheaply via eval_shape); the
            # tail stage never caches — its apply happens outside this
            # program, so stacking its features would only burn HBM
            probe = jax.eval_shape(
                lambda s_, _pk=p[k]["enc"]: _encode(_pk, s_, spec_e)[0],
                jax.ShapeDtypeStruct((img.shape[0], rows, img.shape[2], 3),
                                     img.dtype))
            feat_bytes = n_slabs * int(np.prod(probe.shape)) * 4
            cache = feat_bytes <= feature_cache_bytes and not last_is_tail

            def stat_body(carry, i, _img=img, _pk=p[k]["enc"], _down=down,
                          _interior=interior_f, _c=c, _cache=cache):
                s1, s2, cnt = carry
                sl = lax.dynamic_slice_in_dim(_img, starts[i], rows, axis=1)
                feats, f = _encode(_pk, sl, spec_e)
                a, b, n_px = _stats_from_feats(feats, f, _c, offs[i] // _down,
                                               _interior)
                out = feats if _cache else None
                return (s1 + a, s2 + b, cnt + jnp.float32(n_px)), out

            init = (jnp.zeros((c,), jnp.float32), jnp.zeros((c, c), jnp.float32),
                    jnp.zeros((), jnp.float32))
            (s1, s2, cnt), cached = lax.scan(
                stat_body, init, jnp.arange(n_slabs), unroll=unroll)
            c_mean = s1 / cnt
            c_cov = (s2 - cnt * jnp.outer(c_mean, c_mean)) / (cnt - 1)
            t = coloring_matrix(c_cov, s_cov, method=method, eps=eps,
                                newton_iters=newton_iters)
            if last_is_tail:
                return img, t, c_mean, s_mean

            def apply_body(out_img, xs, _img=img, _ek=p[k]["enc"], _dk=p[k]["dec"],
                           _t=t, _cm=c_mean, _sm=s_mean, _cache=cache, _down=down):
                if _cache:
                    i, feats = xs
                    f = plan_packing(spec_e)[-1][2] if packed else 1
                else:
                    i = xs
                    sl = lax.dynamic_slice_in_dim(_img, starts[i], rows, axis=1)
                    feats, f = _encode(_ek, sl, spec_e)
                dec = _color_decode_feats(feats, f, _dk, spec_d, _t, _cm, _sm,
                                          alpha, offs[i], slab, packed)
                return lax.dynamic_update_slice(
                    out_img, dec.astype(out_img.dtype), (0, i * slab, 0, 0)), None

            xs = (jnp.arange(n_slabs), cached) if cache else jnp.arange(n_slabs)
            img, _ = lax.scan(apply_body, jnp.zeros_like(img), xs,
                              unroll=unroll)
        return img

    return jax.jit(fn), params
