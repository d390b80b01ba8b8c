"""WCT transform: mathematical invariants + parity with the f64 oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from collaborative_distillation_tpu.ops import (
    coloring_matrix,
    feature_stats,
    matrix_isqrt_sqrt_eigh,
    matrix_isqrt_sqrt_newton,
    wct_transform,
)

import torch_oracle

pytestmark = pytest.mark.quick  # fast regression tier (pytest -m quick)


def _rand_feat(rng, p, c, scale=1.0):
    # correlated features so covariance is interesting
    mix = rng.standard_normal((c, c)).astype(np.float32)
    x = rng.standard_normal((p, c)).astype(np.float32) @ mix * scale
    return x + rng.standard_normal(c).astype(np.float32) * 2


def test_feature_stats_matches_numpy(rng):
    x = _rand_feat(rng, 500, 32)
    mean, cov = feature_stats(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mean), x.mean(0), rtol=1e-5, atol=1e-5)
    xc = x - x.mean(0)
    ref_cov = xc.T @ xc / (x.shape[0] - 1)
    np.testing.assert_allclose(np.asarray(cov), ref_cov, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("fn", [matrix_isqrt_sqrt_eigh, matrix_isqrt_sqrt_newton])
def test_matrix_sqrt_identities(rng, fn):
    c = 48
    a = rng.standard_normal((c, c)).astype(np.float32)
    cov = a @ a.T / c + 0.1 * np.eye(c, dtype=np.float32)
    isq, sq = fn(jnp.asarray(cov))
    isq, sq = np.asarray(isq), np.asarray(sq)
    np.testing.assert_allclose(sq @ sq, cov, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(isq @ cov @ isq, np.eye(c), rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(sq @ isq, np.eye(c), rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("method", ["eigh", "newton"])
def test_whitening_gives_identity_covariance(rng, method):
    """Whitened content features must have ~identity covariance."""
    c = 32
    x = _rand_feat(rng, 2000, c)
    mean, cov = feature_stats(jnp.asarray(x))
    t = coloring_matrix(cov, jnp.eye(c), method=method)  # style=I => pure whitening
    w = (np.asarray(x) - np.asarray(mean)) @ np.asarray(t).T
    wcov = w.T @ w / (w.shape[0] - 1)
    np.testing.assert_allclose(wcov, np.eye(c), atol=5e-2)


@pytest.mark.parametrize("method", ["eigh", "newton"])
def test_colored_matches_style_covariance(rng, method):
    c = 24
    content = _rand_feat(rng, 3000, c)
    style = _rand_feat(rng, 3000, c, scale=2.0)
    s_mean, s_cov = feature_stats(jnp.asarray(style))
    out = wct_transform(jnp.asarray(content), s_mean, s_cov, 1.0, method=method)
    o_mean, o_cov = feature_stats(out)
    np.testing.assert_allclose(np.asarray(o_mean), np.asarray(s_mean), rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(o_cov), np.asarray(s_cov), rtol=2e-1, atol=np.abs(np.asarray(s_cov)).max() * 5e-2)


@pytest.mark.parametrize("method", ["eigh", "newton"])
def test_rank_deficient_covariance(rng, method):
    """Genuinely rank-deficient content covariance (the reference's
    EigenValueThre cutoff case, util_wct.py:25): rank 6 in a 32-dim channel
    space. Both decompositions must stay finite, whiten the ROW space to
    ~identity, and keep the null space's whitening gain bounded (eigh
    truncates it to exactly 0; Newton's relative floor caps it near 0)."""
    c, r, p = 32, 6, 4000
    basis = np.linalg.qr(rng.standard_normal((c, r)))[0].astype(np.float32)
    x = (rng.standard_normal((p, r)).astype(np.float32) * 5.0) @ basis.T
    mean, cov = feature_stats(jnp.asarray(x))
    assert np.linalg.matrix_rank(np.asarray(cov), tol=1e-4) == r
    t = coloring_matrix(cov, jnp.eye(c), method=method)
    t = np.asarray(t)
    assert np.isfinite(t).all()
    w = (x - np.asarray(mean)) @ t.T
    wcov = w.T @ w / (p - 1)
    # row space: the r nonzero eigenvalues of the whitened covariance ~ 1
    lam = np.sort(np.linalg.eigvalsh(wcov))
    np.testing.assert_allclose(lam[-r:], 1.0, atol=0.1)
    # null space: no explosive gain (bounded by the floor semantics)
    assert lam[:-r].max() < 0.15
    # and the transform maps actual data to finite, bounded outputs
    assert np.abs(w).max() < 1e3


@pytest.mark.parametrize("cond", [1e2, 1e4])
def test_newton_matches_eigh_on_ill_conditioned(rng, cond):
    """Newton–Schulz vs eigh across condition numbers up to the documented
    ~1/rel_floor bound: isqrt/sqrt agree on the well-determined subspace."""
    c = 48
    q = np.linalg.qr(rng.standard_normal((c, c)))[0].astype(np.float32)
    lam = np.geomspace(1.0, 1.0 / cond, c).astype(np.float32)
    cov = (q * lam) @ q.T
    isq_e, sq_e = (np.asarray(m) for m in matrix_isqrt_sqrt_eigh(jnp.asarray(cov)))
    isq_n, sq_n = (np.asarray(m) for m in matrix_isqrt_sqrt_newton(jnp.asarray(cov)))
    np.testing.assert_allclose(sq_n, sq_e, atol=5e-3 * np.abs(sq_e).max())
    # compare isqrt through its action on the dominant subspace (small
    # eigenvalues near the floor legitimately differ: truncate-to-0 vs cap)
    k = (lam > 1e-3).sum()
    proj = q[:, :k]
    np.testing.assert_allclose(isq_n @ proj, isq_e @ proj,
                               atol=2e-2 * np.abs(isq_e @ proj).max())


def test_alpha_zero_is_identity(rng):
    x = _rand_feat(rng, 400, 16).reshape(1, 20, 20, 16)
    s = _rand_feat(rng, 400, 16)
    s_mean, s_cov = feature_stats(jnp.asarray(s))
    out = wct_transform(jnp.asarray(x), s_mean, s_cov, 0.0)
    np.testing.assert_allclose(np.asarray(out), x, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("method", ["eigh", "newton"])
def test_parity_with_f64_oracle(method):
    """Full transform vs the float64 numpy oracle (reference util_wct.py math).

    Uses a fixed seed with benign conditioning: near-singular covariances are
    resolved differently by f32 truncation (eigh) / regularized Newton vs the
    f64 oracle by design — that regime is covered by the statistics tests.
    """
    rng = np.random.default_rng(0)
    c, h, w = 32, 24, 24
    cf = _rand_feat(rng, h * w, c).reshape(1, h, w, c)
    sf = _rand_feat(rng, h * w, c, scale=1.5).reshape(h * w, c)
    s_mean, s_cov = feature_stats(jnp.asarray(sf))
    alpha = 0.7
    ours = np.asarray(wct_transform(jnp.asarray(cf), s_mean, s_cov, alpha, method=method))
    ref = torch_oracle.wct_oracle(
        cf[0].transpose(2, 0, 1), sf.T.reshape(c, h, w), alpha
    ).reshape(c, h, w).transpose(1, 2, 0)[None]
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=2e-3 * scale)


def test_transform_preserves_shape_and_dtype(rng):
    x = jnp.asarray(_rand_feat(rng, 64, 8).reshape(2, 4, 8, 8), jnp.bfloat16)
    s_mean, s_cov = feature_stats(x)
    out = wct_transform(x, s_mean, s_cov, 1.0)
    assert out.shape == x.shape and out.dtype == x.dtype


def test_gram_matrix_matches_torch(rng):
    import torch
    from collaborative_distillation_tpu.ops.style_stats import gram_matrix

    x = rng.standard_normal((2, 6, 5, 8)).astype(np.float32)
    ours = np.asarray(gram_matrix(jnp.asarray(x)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    feat = xt.reshape(2, 8, -1)
    ref = (feat @ feat.transpose(1, 2) / (8 * 6 * 5)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_adain_transfers_channel_stats(rng):
    from collaborative_distillation_tpu.ops.style_stats import adain, calc_mean_std

    c = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32) * 3 + 1)
    s = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32) * 0.5 - 2)
    out = adain(c, s)
    o_mean, o_std = calc_mean_std(out)
    s_mean, s_std = calc_mean_std(s)
    np.testing.assert_allclose(np.asarray(o_mean), np.asarray(s_mean), atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_std), np.asarray(s_std), rtol=1e-3)


def test_batched_transform_is_per_image(rng):
    """N>1 inputs get per-image content statistics (the reference computes
    per-image stats; pooling across the batch is wrong)."""
    c = 16
    a = _rand_feat(rng, 256, c).reshape(1, 16, 16, c)
    b = (_rand_feat(rng, 256, c) * 3 + 5).reshape(1, 16, 16, c)
    batch = np.concatenate([a, b], axis=0)
    s = _rand_feat(rng, 400, c)
    s_mean, s_cov = feature_stats(jnp.asarray(s))
    both = np.asarray(wct_transform(jnp.asarray(batch), s_mean, s_cov, 1.0))
    solo_a = np.asarray(wct_transform(jnp.asarray(a), s_mean, s_cov, 1.0))
    solo_b = np.asarray(wct_transform(jnp.asarray(b), s_mean, s_cov, 1.0))
    np.testing.assert_allclose(both[0], solo_a[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(both[1], solo_b[0], rtol=1e-4, atol=1e-4)


def test_batched_styles_pair_elementwise(rng):
    """(N,C)/(N,C,C) style stats pair element i with content i."""
    c = 8
    content = jnp.asarray(np.stack([
        _rand_feat(rng, 64, c).reshape(8, 8, c) for _ in range(2)]))
    s1 = _rand_feat(rng, 300, c)
    s2 = _rand_feat(rng, 300, c, scale=3.0)
    m1, c1 = feature_stats(jnp.asarray(s1))
    m2, c2 = feature_stats(jnp.asarray(s2))
    sm = jnp.stack([m1, m2]); sc = jnp.stack([c1, c2])
    both = np.asarray(wct_transform(content, sm, sc, 1.0))
    solo0 = np.asarray(wct_transform(content[:1], m1, c1, 1.0))
    np.testing.assert_allclose(both[0], solo0[0], rtol=1e-4, atol=1e-4)
