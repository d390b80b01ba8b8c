"""Whitening & Coloring Transform (WCT), TPU-native.

Replaces the reference's CPU-float64 ``torch.svd`` path
(PytorchWCT/util_wct.py:62-131 ``whiten_and_color_torch`` and the numpy mirror
at 134-202) with on-device math:

* the channel covariance is one MXU GEMM over the flattened pixels
  (reference: ``torch.mm(cF, cF.t()).div(HW-1)``, util_wct.py:70);
* the matrix inverse-square-root / square-root are computed either by
  ``jnp.linalg.eigh`` (covariance is symmetric PSD, so eigh is the right
  decomposition — torch.svd-of-covariance is equivalent up to column signs)
  or by a coupled Newton–Schulz iteration that is pure matmuls and therefore
  dramatically faster on the MXU;
* whiten+color collapse into a single C x C ``coloring matrix``
  ``T = Cs^{1/2} Cc^{-1/2}`` applied as one (P,C)x(C,C) GEMM, instead of the
  reference's chain of six C x C and two C x HW products (util_wct.py:117-126).

Everything stays in HBM; nothing is shipped to the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "feature_stats",
    "matrix_isqrt_sqrt_eigh",
    "matrix_isqrt_sqrt_newton",
    "coloring_matrix",
    "wct_transform",
]

_HIGH = lax.Precision.HIGHEST


def feature_stats(feat: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Channel mean and covariance of a feature map.

    ``feat``: (..., C); all leading axes are treated as pixels. Returns
    ``(mean (C,), cov (C, C))`` with the reference's ``/(P-1)`` normalization
    (util_wct.py:70). Accumulates in f32 at HIGHEST MXU precision.
    """
    c = feat.shape[-1]
    x = feat.reshape(-1, c).astype(jnp.float32)
    p = x.shape[0]
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    cov = lax.dot_general(
        xc, xc, (((0,), (0,)), ((), ())), precision=_HIGH,
        preferred_element_type=jnp.float32,
    ) / (p - 1)
    return mean, cov


def matrix_isqrt_sqrt_eigh(
    cov: jax.Array, *, eps: float = 1e-8, truncate: float = 1e-8
) -> tuple[jax.Array, jax.Array]:
    """(cov^-1/2, cov^1/2) via symmetric eigendecomposition.

    Mirrors util_wct.py:74-126: eigenvalues below a threshold are *truncated*
    (their contribution dropped, matching the reference's ``k_c`` rank cutoff
    at EigenValueThre, util_wct.py:25/82-89) rather than inverted. The
    threshold is relative to the largest eigenvalue for f32 robustness.
    """
    c = cov.shape[0]
    cov = cov + eps * jnp.eye(c, dtype=cov.dtype)
    lam, v = jnp.linalg.eigh(cov)
    lam_max = jnp.maximum(lam[-1], eps)
    keep = lam > truncate * lam_max
    inv_s = jnp.where(keep, lax.rsqrt(jnp.maximum(lam, 1e-30)), 0.0)
    sq_s = jnp.where(keep, jnp.sqrt(jnp.maximum(lam, 0.0)), 0.0)
    vs = v * inv_s[None, :]
    isqrt = lax.dot_general(vs, v, (((1,), (1,)), ((), ())), precision=_HIGH)
    vq = v * sq_s[None, :]
    sqrt = lax.dot_general(vq, v, (((1,), (1,)), ((), ())), precision=_HIGH)
    return isqrt, sqrt


def _lambda_max_estimate(a: jax.Array, iters: int = 8) -> jax.Array:
    """Power-iteration lower bound on the largest eigenvalue of SPD ``a``
    (a handful of C x C matvecs — negligible next to the C^3 iteration)."""
    c = a.shape[0]
    v = jnp.ones((c,), jnp.float32) / jnp.sqrt(jnp.float32(c))

    def body(_, v):
        w = a @ v
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = lax.fori_loop(0, iters, body, v)
    # Rayleigh quotient <= lambda_max; floor by trace/c (mean eigenvalue)
    return jnp.maximum(v @ (a @ v), jnp.trace(a) / c)


def matrix_isqrt_sqrt_newton(
    cov: jax.Array, *, eps: float = 1e-8, iters: int = 24,
    rel_floor: float = 1e-6
) -> tuple[jax.Array, jax.Array]:
    """(cov^-1/2, cov^1/2) via coupled Newton–Schulz iteration.

    Y_{k+1} = Y_k (3I - Z_k Y_k)/2,  Z_{k+1} = (3I - Z_k Y_k)/2 Z_k with
    A normalized by its Frobenius norm; converges quadratically for SPD A.
    Pure matmuls -> runs entirely on the MXU; no eigendecomposition.

    Conditioning: A is floored by ``delta = max(rel_floor * lambda_max_est,
    eps)`` before iterating, which caps the condition number at roughly
    ``1/rel_floor`` (exactly, when the power-iteration estimate is tight).
    Newton–Schulz needs about ``log2(cond) + 10`` iterations; the default
    rel_floor of 1e-6 (cond <= ~1e6 -> ~30 iterations for full convergence)
    keeps directions above 1e-6 * lambda_max numerically faithful while the
    default ``iters=24`` resolves the dominant 1e4 of that spectrum to f32
    accuracy — raise ``iters`` to ~30 if the tail matters. This is the
    iterative analog of the eigh path's relative-eigenvalue truncation
    (reference EigenValueThre rank cutoff, util_wct.py:25/82-89): directions
    with eigenvalue << delta get a bounded ~delta^{-1/2} whitening gain,
    i.e. near-zero contribution after coloring, where the eigh path zeroes
    them exactly.
    """
    c = cov.shape[0]
    eye = jnp.eye(c, dtype=jnp.float32)
    a = cov.astype(jnp.float32)
    delta = jnp.maximum(rel_floor * _lambda_max_estimate(a), eps)
    a = a + delta * eye
    norm = jnp.sqrt(jnp.sum(a * a))
    y0 = a / norm
    z0 = eye

    def body(_, yz):
        y, z = yz
        t = 0.5 * (3.0 * eye - _mm(z, y))
        return _mm(y, t), _mm(t, z)

    y, z = lax.fori_loop(0, iters, body, (y0, z0))
    sqrt = y * jnp.sqrt(norm)
    isqrt = z * lax.rsqrt(norm)
    return isqrt, sqrt


def _mm(a: jax.Array, b: jax.Array) -> jax.Array:
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())), precision=_HIGH,
                           preferred_element_type=jnp.float32)


def coloring_matrix(
    c_cov: jax.Array,
    s_cov: jax.Array,
    *,
    method: str = "eigh",
    eps: float = 1e-8,
    newton_iters: int = 24,
) -> jax.Array:
    """T = Cs^{1/2} @ Cc^{-1/2}: whitening and coloring fused into one C x C map."""
    if method == "eigh":
        c_isqrt, _ = matrix_isqrt_sqrt_eigh(c_cov, eps=eps)
        _, s_sqrt = matrix_isqrt_sqrt_eigh(s_cov, eps=eps)
    elif method == "newton":
        c_isqrt, _ = matrix_isqrt_sqrt_newton(c_cov, eps=eps, iters=newton_iters)
        _, s_sqrt = matrix_isqrt_sqrt_newton(s_cov, eps=eps, iters=newton_iters)
    else:
        raise ValueError(f"unknown WCT method {method!r}")
    return _mm(s_sqrt, c_isqrt)


def _wct_single(content_feat, style_mean, style_cov, alpha, *, method, eps,
                newton_iters):
    shape, dtype = content_feat.shape, content_feat.dtype
    c = shape[-1]
    x = content_feat.reshape(-1, c).astype(jnp.float32)
    c_mean, c_cov = feature_stats(x)
    t = coloring_matrix(c_cov, style_cov.astype(jnp.float32), method=method,
                        eps=eps, newton_iters=newton_iters)
    # target = T @ (x - c_mean) + s_mean, applied row-wise: (P,C) @ T^T
    target = _mm(x - c_mean, t.T) + style_mean.astype(jnp.float32)
    alpha = jnp.asarray(alpha, jnp.float32)
    out = alpha * target + (1.0 - alpha) * x
    return out.reshape(shape).astype(dtype)


@partial(jax.jit, static_argnames=("method", "newton_iters"))
def wct_transform(
    content_feat: jax.Array,
    style_mean: jax.Array,
    style_cov: jax.Array,
    alpha: jax.Array | float = 1.0,
    *,
    method: str = "eigh",
    eps: float = 1e-8,
    newton_iters: int = 24,
) -> jax.Array:
    """Stylize content features with precomputed style statistics.

    Equivalent to util_wct.py ``transform`` (210-223): whiten the content
    feature, color with the style covariance, add the style mean, then
    alpha-blend with the original content feature. ``content_feat`` is
    (..., C); returns the same shape/dtype.

    A rank-4 (N, H, W, C) input with N > 1 is treated as a *batch of
    independent images*: per-image content statistics (the reference computes
    per-image stats; pooling across a batch would whiten each image with the
    others' statistics). Style stats may be shared ((C,), (C,C)) or per-image
    ((N,C), (N,C,C)).

    Taking (style_mean, style_cov) instead of raw style features lets the
    cascade reuse per-style statistics across stages/runs — the reference
    re-encodes and re-decomposes the style image at every stage (WCT.py:99-101).
    """
    kw = dict(method=method, eps=eps, newton_iters=newton_iters)
    if content_feat.ndim == 4 and content_feat.shape[0] > 1:
        s_axis = 0 if style_mean.ndim == 2 else None
        return jax.vmap(
            lambda cf, sm, sc: _wct_single(cf, sm, sc, alpha, **kw),
            in_axes=(0, s_axis, s_axis))(content_feat, style_mean, style_cov)
    if style_mean.ndim == 2:  # per-image style stats with a single image
        style_mean, style_cov = style_mean[0], style_cov[0]
    return _wct_single(content_feat, style_mean, style_cov, alpha, **kw)
