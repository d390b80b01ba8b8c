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

Global top/bottom edges use ``margin`` rows of input-level reflection. This
differs from the reference's per-conv reflection only within the receptive
field of the outermost rows (quantified in tests; visually nil). Interior
seams are exact.

Two compiled programs per pyramid level, reused across all slabs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models.specs import StageSpec
from ..models.vgg import apply_decoder, apply_encoder
from ..ops.wct_transform import _mm, coloring_matrix

__all__ = ["receptive_radius", "SlabCascade"]

_HIGH = lax.Precision.HIGHEST


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
    feats = apply_encoder(enc_params, slab_ext, spec)["out"]
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
    feats = apply_encoder(enc_params, slab_ext, enc_spec)["out"]
    shape, dtype = feats.shape, feats.dtype
    c = shape[-1]
    x = feats.reshape(-1, c).astype(jnp.float32)
    target = _mm(x - c_mean, t.T) + s_mean
    alpha = jnp.asarray(alpha, jnp.float32)
    csf = (alpha * target + (1.0 - alpha) * x).reshape(shape).astype(dtype)
    dec = apply_decoder(dec_params, csf, dec_spec)["out"]
    return lax.dynamic_slice_in_dim(dec, offset, interior, axis=1)


class SlabCascade:
    """Streaming 5-level WCT cascade with bounded HBM (single chip).

    ``slab_rows`` interior rows per slab; ``margin`` >= enc+dec receptive
    radius (auto-computed). All rows quantities are multiples of the deepest
    stage's downsample factor so feature-space slicing is integral.
    """

    def __init__(self, pyramid, *, stages=(5, 4, 3, 2, 1), slab_rows: int = 1024,
                 method: str = "eigh", newton_iters: int = 24, eps: float = 1e-8):
        self.pyramid = pyramid
        self.stages = tuple(stages)
        self.method = method
        self.newton_iters = newton_iters
        self.eps = eps
        self.down_max = 2 ** (max(stages) - 1)
        radius = max(
            receptive_radius(pyramid[k]["enc_spec"]) + receptive_radius(pyramid[k]["dec_spec"])
            for k in stages)
        self.margin = -(-radius // self.down_max) * self.down_max  # round up
        self.slab_rows = -(-slab_rows // self.down_max) * self.down_max
        self._stats_fns = {}
        self._apply_fns = {}
        self._style_fns = {}

    # ---- jitted per-stage programs (shape-cached by XLA; two shapes per
    #      stage: edge slabs carry one margin, mid slabs two) ----

    def _stats_fn(self, k):
        if k not in self._stats_fns:
            spec = self.pyramid[k]["enc_spec"]
            down = 2 ** (k - 1)
            self._stats_fns[k] = jax.jit(partial(
                _slab_stats, spec=spec, interior_f=self.slab_rows // down))
        return self._stats_fns[k]

    def _apply_fn(self, k):
        if k not in self._apply_fns:
            enc_spec = self.pyramid[k]["enc_spec"]
            dec_spec = self.pyramid[k]["dec_spec"]
            self._apply_fns[k] = jax.jit(partial(
                _slab_apply, enc_spec=enc_spec, dec_spec=dec_spec,
                interior=self.slab_rows))
        return self._apply_fns[k]

    def _style_stats(self, k, style):
        if k not in self._style_fns:
            spec = self.pyramid[k]["enc_spec"]

            def f(p, s):
                feats = apply_encoder(p, s, spec)["out"]
                c = feats.shape[-1]
                x = feats.reshape(-1, c).astype(jnp.float32)
                mean = jnp.mean(x, axis=0)
                xc = x - mean
                cov = lax.dot_general(xc, xc, (((0,), (0,)), ((), ())),
                                      precision=_HIGH,
                                      preferred_element_type=jnp.float32) / (x.shape[0] - 1)
                return mean, cov

            self._style_fns[k] = jax.jit(f)
        return self._style_fns[k](self.pyramid[k]["enc"], style)

    # ---- driver ----

    def _slabs(self, h: int):
        """Yield (input_start, input_rows, interior_offset) per slab.

        Edge slabs start/end at the true image boundary, so the per-conv
        reflection the encoder applies there IS the reference's global-edge
        semantics; mid slabs carry a margin on both sides. Contamination from
        the arithmetically-wrong reflection at interior slab-array edges dies
        within the receptive radius and is cropped by the interior offset.
        """
        slab, m = self.slab_rows, self.margin
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

    def stylize(self, content: jax.Array, style: jax.Array, alpha=1.0) -> jax.Array:
        """content (1, H, W, 3); style (1, Hs, Ws, 3) small enough to encode
        whole. H is padded to slab granularity internally."""
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
            # pass 1: exact global content stats from interior feature rows
            s1 = s2 = None
            stats = self._stats_fn(k)
            for start, rows, off in self._slabs(hp):
                a, b = stats(enc,
                             lax.dynamic_slice_in_dim(img, start, rows, axis=1),
                             jnp.int32(off // down))
                s1 = a if s1 is None else s1 + a
                s2 = b if s2 is None else s2 + b
            count = n_slabs * (slab // down) * (img.shape[2] // down)
            c_mean = s1 / count
            c_cov = (s2 - count * jnp.outer(c_mean, c_mean)) / (count - 1)
            t = jax.jit(partial(coloring_matrix, method=self.method,
                                eps=self.eps, newton_iters=self.newton_iters))(
                c_cov, s_cov)
            # pass 2: transform + decode slab interiors
            apply = self._apply_fn(k)
            outs = []
            for start, rows, off in self._slabs(hp):
                outs.append(apply(enc, dec,
                                  lax.dynamic_slice_in_dim(img, start, rows, axis=1),
                                  jnp.int32(off), t, c_mean, s_mean, alpha))
            img = jnp.concatenate(outs, axis=1)
        return img[:, :h]
