"""Primitive op parity vs torch (reflect pad, conv, pool, unpool, upsample)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from collaborative_distillation_tpu.ops import (
    conv3x3,
    max_pool_2x2,
    max_pool_2x2_with_argmax,
    max_unpool_2x2,
    reflect_pad,
    upsample_nearest_2x,
)

pytestmark = pytest.mark.quick  # fast regression tier (pytest -m quick)


def _nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def _nhwc(t):
    return t.numpy().transpose(0, 2, 3, 1)


def test_reflect_pad_matches_torch(rng):
    x = rng.standard_normal((2, 7, 9, 3), dtype=np.float32)
    ours = np.asarray(reflect_pad(jnp.asarray(x), 1))
    ref = _nhwc(F.pad(_nchw(x), (1, 1, 1, 1), mode="reflect"))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


@pytest.mark.parametrize("relu", [True, False])
def test_conv3x3_matches_torch(rng, relu):
    x = rng.standard_normal((2, 10, 12, 5), dtype=np.float32)
    w = rng.standard_normal((3, 3, 5, 7), dtype=np.float32) * 0.1
    b = rng.standard_normal(7, dtype=np.float32)
    ours = np.asarray(conv3x3(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), relu=relu))
    xt = F.pad(_nchw(x), (1, 1, 1, 1), mode="reflect")
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1).copy())
    yt = F.conv2d(xt, wt, torch.from_numpy(b))
    if relu:
        yt = F.relu(yt)
    np.testing.assert_allclose(ours, _nhwc(yt), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hw", [(8, 8), (9, 11), (7, 7)])
def test_max_pool_floor_semantics(rng, hw):
    x = rng.standard_normal((1, *hw, 4), dtype=np.float32)
    ours = np.asarray(max_pool_2x2(jnp.asarray(x)))
    ref = _nhwc(F.max_pool2d(_nchw(x), 2, 2))
    np.testing.assert_allclose(ours, ref)


def test_pool_argmax_unpool_roundtrip(rng):
    x = rng.standard_normal((1, 8, 6, 4), dtype=np.float32)
    pooled, idx = max_pool_2x2_with_argmax(jnp.asarray(x))
    ref_pooled, ref_idx = F.max_pool2d(_nchw(x), 2, 2, return_indices=True)
    np.testing.assert_allclose(np.asarray(pooled), _nhwc(ref_pooled))
    un = np.asarray(max_unpool_2x2(pooled, idx, (8, 6)))
    ref_un = _nhwc(F.max_unpool2d(ref_pooled, ref_idx, 2, 2, output_size=(8, 6)))
    np.testing.assert_allclose(un, ref_un)


def test_unpool_to_odd_output(rng):
    x = rng.standard_normal((1, 9, 7, 2), dtype=np.float32)
    pooled, idx = max_pool_2x2_with_argmax(jnp.asarray(x))
    un = np.asarray(max_unpool_2x2(pooled, idx, (9, 7)))
    ref_pooled, ref_idx = F.max_pool2d(_nchw(x), 2, 2, return_indices=True)
    ref_un = _nhwc(F.max_unpool2d(ref_pooled, ref_idx, 2, 2, output_size=(9, 7)))
    np.testing.assert_allclose(un, ref_un)


def test_upsample_nearest_matches_torch(rng):
    x = rng.standard_normal((2, 5, 6, 3), dtype=np.float32)
    ours = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    ref = _nhwc(F.interpolate(_nchw(x), scale_factor=2, mode="nearest"))
    np.testing.assert_allclose(ours, ref)
