"""Pallas fused-stats kernel vs the plain XLA statistics (interpret mode on
the CPU test platform; the compiled path is exercised on real TPU by bench)."""

import numpy as np
import pytest

import jax.numpy as jnp

from collaborative_distillation_tpu.ops import feature_stats
from collaborative_distillation_tpu.ops.pallas.stats import (
    fused_sum_gram,
    pallas_feature_stats,
)


@pytest.mark.parametrize("p,c,blk", [
    (1000, 128, 256), (4096, 128, 4096), (300, 256, 128),
    # sub-dense (non-128-multiple) widths the slab cascade actually feeds
    # here (wct/slab.py:_stats_from_feats gates on C % 8): stage-1's 96
    # lanes (width 24 packed x4), the 24/64 transition widths
    (1000, 96, 256), (512, 24, 128), (300, 64, 64)])
def test_fused_sum_gram_matches(rng, p, c, blk):
    x = jnp.asarray(rng.standard_normal((p, c)).astype(np.float32))
    s, g = fused_sum_gram(x, block_rows=blk, interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(jnp.sum(x, 0)), rtol=1e-4, atol=1e-3)
    ref_g = np.asarray(x).T @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(g), ref_g, rtol=1e-4, atol=1e-3)


def test_pallas_feature_stats_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((1, 40, 40, 128)).astype(np.float32))
    m1, c1 = feature_stats(x)
    m2, c2 = pallas_feature_stats(x, block_rows=512, interpret=True)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), rtol=1e-3, atol=1e-4)


def test_zero_padding_invariance(rng):
    """Rows padded to the block size must not change the statistics."""
    x = jnp.asarray(rng.standard_normal((100, 128)).astype(np.float32))
    s1, g1 = fused_sum_gram(x, block_rows=64, interpret=True)   # pads 100 -> 128
    s2, g2 = fused_sum_gram(x, block_rows=50, interpret=True)   # exact fit
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-3)
