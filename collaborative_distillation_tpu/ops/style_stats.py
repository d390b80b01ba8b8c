"""Style-statistic helpers: Gram matrices and AdaIN.

Ports of the feature-stat utilities bundled with the reference's student
models (model/model_cd.py:14-47: ``gram_matrix``, ``gram_matrix_ave``,
``calc_mean_std``, ``adaptive_instance_normalization``) — used for
style-loss experiments and AdaIN-style transfer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["gram_matrix", "gram_matrix_ave", "calc_mean_std", "adain"]

_HIGH = lax.Precision.HIGHEST


def gram_matrix(feat: jax.Array, *, normalize_hw_only: bool = False) -> jax.Array:
    """Per-sample Gram matrix of an NHWC feature map -> (N, C, C).

    Default normalization divides by C*H*W (model_cd.py:14-19);
    ``normalize_hw_only`` divides by H*W (``gram_matrix_ave``, 43-47).
    """
    n, h, w, c = feat.shape
    x = feat.reshape(n, h * w, c).astype(jnp.float32)
    g = lax.dot_general(x, x, (((1,), (1,)), ((0,), (0,))), precision=_HIGH,
                        preferred_element_type=jnp.float32)
    denom = h * w if normalize_hw_only else c * h * w
    return g / denom


def gram_matrix_ave(feat: jax.Array) -> jax.Array:
    return gram_matrix(feat, normalize_hw_only=True)


def calc_mean_std(feat: jax.Array, eps: float = 1e-5) -> tuple[jax.Array, jax.Array]:
    """Per-sample, per-channel spatial mean and std -> ((N,1,1,C), (N,1,1,C))."""
    mean = jnp.mean(feat, axis=(1, 2), keepdims=True)
    var = jnp.var(feat, axis=(1, 2), keepdims=True)
    return mean, jnp.sqrt(var + eps)


def adain(content_feat: jax.Array, style_feat: jax.Array) -> jax.Array:
    """Adaptive instance normalization: re-scale content features to the
    style features' channel statistics (model_cd.py:31-40)."""
    c_mean, c_std = calc_mean_std(content_feat)
    s_mean, s_std = calc_mean_std(style_feat)
    return (content_feat - c_mean) / c_std * s_std + s_mean
