"""Fused + HBM-bounded multi-chip cascade: slab streaming inside row shards.

Exactness oracle: the single-chip fused slab cascade (itself pinned against
the plain per-stage path in test_slab.py). With the same slab size the global
slab boundaries coincide, so outputs agree up to f32 reassociation and the
psum reduction-order difference in the statistics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from collaborative_distillation_tpu.models.specs import decoder_spec, encoder_spec
from collaborative_distillation_tpu.models.vgg import init_params
from collaborative_distillation_tpu.parallel.mesh import make_mesh
from collaborative_distillation_tpu.parallel.spatial import build_tiled_slab_cascade
from collaborative_distillation_tpu.wct.slab import SlabCascade, build_fused_slab_cascade

STAGES = (3, 2, 1)


@pytest.fixture(scope="module")
def pyramid():
    key = jax.random.key(7)
    pyr = {}
    for s in STAGES:
        key, k1, k2 = jax.random.split(key, 3)
        espec = encoder_spec("16x", s, aux=True)
        dspec = decoder_spec("16x", s)
        pyr[s] = {"enc_spec": espec, "dec_spec": dspec,
                  "enc": init_params(espec, k1), "dec": init_params(dspec, k2)}
    return pyr


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    c = rng.random((1, 192, 48, 3), np.float32)
    s = rng.random((1, 64, 48, 3), np.float32)
    return jnp.asarray(c), jnp.asarray(s)


def _slab_for(pyramid, target):
    helper = SlabCascade(pyramid, stages=STAGES, slab_rows=target)
    return helper.slab_rows, helper.margin


def test_tiled_slab_matches_single_chip_fused(pyramid, imgs):
    c, s = imgs
    slab, m = _slab_for(pyramid, 48)
    assert c.shape[1] % (slab * 4) == 0, (slab, c.shape)
    ref_fn, ref_params = build_fused_slab_cascade(
        pyramid, stages=STAGES, slab_rows=slab)
    ref = np.asarray(ref_fn(ref_params, c, s, 0.8))

    mesh = make_mesh(space=4)
    fn, params = build_tiled_slab_cascade(pyramid, mesh, stages=STAGES,
                                          slab_rows=slab)
    out = np.asarray(fn(params, c, s, 0.8))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=3e-3, rtol=0)


def test_tiled_slab_packed_matches_unpacked(pyramid, imgs):
    c, s = imgs
    slab, _ = _slab_for(pyramid, 48)
    mesh = make_mesh(space=4)
    fn, params = build_tiled_slab_cascade(pyramid, mesh, stages=STAGES,
                                          slab_rows=slab)
    ref = np.asarray(fn(params, c, s, 1.0))
    pfn, pparams = build_tiled_slab_cascade(pyramid, mesh, stages=STAGES,
                                            slab_rows=slab, packed=True)
    out = np.asarray(pfn(pparams, c, s, 1.0))
    # the two pipelines reach eigh through different (equally valid) f32
    # summation orders; on the toy pyramid's near-degenerate covariances a
    # stray pixel can amplify past a fixed atol — bound the distribution
    diff = np.abs(out - ref)
    assert (diff > 3e-3).mean() <= 1e-3, (diff.max(), (diff > 3e-3).mean())
    assert diff.max() <= 2e-2, diff.max()


def test_tiled_slab_two_shards_with_single_slab_each(pyramid, imgs):
    """The tightest geometry: one slab per shard — every slab is an edge or
    near-edge case and the 2*margin inward-extension logic is fully used."""
    c, s = imgs
    slab, m = _slab_for(pyramid, 96)
    h = slab * 2
    c2 = c[:, :h]
    ref_fn, ref_params = build_fused_slab_cascade(
        pyramid, stages=STAGES, slab_rows=slab)
    ref = np.asarray(ref_fn(ref_params, c2, s, 1.0))
    mesh = make_mesh(space=2)
    fn, params = build_tiled_slab_cascade(pyramid, mesh, stages=STAGES,
                                          slab_rows=slab)
    out = np.asarray(fn(params, c2, s, 1.0))
    np.testing.assert_allclose(out, ref, atol=3e-3, rtol=0)


def test_combined_data_space_mesh(pyramid, imgs, rng):
    """(data=2, space=4) serving mesh: each data shard stylizes its own image
    with statistics psum'd only over space — results equal two independent
    space-only runs."""
    c, s = imgs
    slab, _ = _slab_for(pyramid, 48)
    c2 = jnp.concatenate([c, jnp.asarray(rng.random(c.shape, np.float32))], axis=0)
    s2 = jnp.concatenate([s, jnp.asarray(rng.random(s.shape, np.float32))], axis=0)
    mesh = make_mesh(data=2, space=4)
    fn, params = build_tiled_slab_cascade(pyramid, mesh, stages=STAGES,
                                          slab_rows=slab, data_axis="data")
    out = np.asarray(fn(params, c2, s2, 1.0))

    sfn, sparams = build_tiled_slab_cascade(pyramid, make_mesh(space=4),
                                            stages=STAGES, slab_rows=slab)
    for i in range(2):
        ref = np.asarray(sfn(sparams, c2[i:i + 1], s2[i:i + 1], 1.0))
        np.testing.assert_allclose(out[i:i + 1], ref, atol=3e-3, rtol=0)


def test_engine_space_plus_slab_rows(pyramid, imgs):
    """WCTEngine(space=4, slab_rows=...) routes to the tiled slab cascade and
    still crops back to the exact input size (internal pad to slab*space)."""
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    c, s = imgs
    eng = WCTEngine(mode="16x", pyramid=pyramid, stages=STAGES, space=4,
                    slab_rows=48, packed=False)
    assert eng._tiled_slab > 0
    cn = np.asarray(c[0])[: 150]  # awkward height -> internal pad + crop
    sn = np.asarray(s[0])
    out = eng.stylize(cn, sn, alpha=0.9)
    assert out.shape == cn.shape
    assert np.isfinite(out).all()


def test_engine_space_slab_external_stats_matches_plain(pyramid, imgs):
    """The engine's tiled-slab path (external per-style statistics, cached
    by style_key) matches the plain single-device engine within spatial
    reassociation tolerance — and caching doesn't change the result."""
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    c, s = imgs
    cn, sn = np.asarray(c[0]), np.asarray(s[0])
    eng = WCTEngine(mode="16x", pyramid=pyramid, stages=STAGES, space=4,
                    slab_rows=48, packed=False)
    # oracle: single-chip slab engine with the SAME slab size, so the global
    # slab boundaries coincide (differences are f32 reassociation + the
    # psum'd statistics order + unpacked-vs-internal style stats)
    ref = WCTEngine(mode="16x", pyramid=pyramid, stages=STAGES,
                    slab_rows=eng._tiled_slab, packed=False,
                    fused=True).stylize(cn, sn, alpha=0.8, style_key="k")
    out1 = eng.stylize(cn, sn, alpha=0.8, style_key="k")
    out2 = eng.stylize(cn, sn, alpha=0.8, style_key="k")  # cached stats
    np.testing.assert_allclose(out1, out2, atol=1e-6)
    np.testing.assert_allclose(out1, ref, atol=3e-3, rtol=0)


def test_tiny_slab_request_rounds_up(pyramid, imgs):
    """slab_rows below 2*margin rounds up instead of crashing; the
    effective size is readable from fn.slab_rows."""
    c, s = imgs
    mesh = make_mesh(space=4)
    fn, params = build_tiled_slab_cascade(pyramid, mesh, stages=STAGES,
                                          slab_rows=4)
    helper = SlabCascade(pyramid, stages=STAGES, slab_rows=4)
    assert fn.slab_rows >= 2 * helper.margin
    # a properly padded input runs
    mult = fn.slab_rows * 4
    hp = -(-c.shape[1] // mult) * mult
    cp = jnp.pad(c, ((0, 0), (0, hp - c.shape[1]), (0, 0), (0, 0)), mode="reflect")
    out = fn(params, cp, s, 1.0)
    assert out.shape == cp.shape


def test_engine_space_slab_rejects_batched_styles(pyramid, imgs):
    """The tiled path pools WCT statistics over the batch, so batched styles
    cannot get per-image coloring — the engine must say so instead of
    tracing a shape error (regression guard for the external-stats change)."""
    import pytest
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    c, s = imgs
    cb = np.concatenate([np.asarray(c), np.asarray(c)], axis=0)
    sb = np.concatenate([np.asarray(s), np.asarray(s)], axis=0)
    eng = WCTEngine(mode="16x", pyramid=pyramid, stages=STAGES, space=4,
                    slab_rows=48, packed=False)
    with pytest.raises(ValueError, match="per-image"):
        eng.stylize(cb, sb, alpha=0.9)


def test_pallas_halo_cascade_matches_ppermute(pyramid, imgs):
    """build_tiled_slab_cascade(halo='pallas') — the RDMA kernel in the real
    production program (interpret-simulated off-TPU) — must be bit-identical
    to the ppermute build: the exchanged bytes are the same, everything
    downstream is the same code."""
    c, s = imgs
    slab, _ = _slab_for(pyramid, 48)
    mesh = make_mesh(space=4)
    ref_fn, ref_params = build_tiled_slab_cascade(pyramid, mesh, stages=STAGES,
                                                  slab_rows=slab)
    ref = np.asarray(ref_fn(ref_params, c, s, 0.8))
    pfn, pparams = build_tiled_slab_cascade(pyramid, mesh, stages=STAGES,
                                            slab_rows=slab, halo="pallas")
    out = np.asarray(pfn(pparams, c, s, 0.8))
    np.testing.assert_array_equal(out, ref)


def test_pallas_halo_cascade_combined_mesh(pyramid, imgs, rng):
    """halo='pallas' on the (data=2, space=4) mesh: mesh-coordinate
    addressing keeps each exchange inside its own data shard."""
    c, s = imgs
    slab, _ = _slab_for(pyramid, 48)
    c2 = jnp.concatenate([c, jnp.asarray(rng.random(c.shape, np.float32))], axis=0)
    s2 = jnp.concatenate([s, jnp.asarray(rng.random(s.shape, np.float32))], axis=0)
    mesh = make_mesh(data=2, space=4)
    ref_fn, ref_params = build_tiled_slab_cascade(pyramid, mesh, stages=STAGES,
                                                  slab_rows=slab,
                                                  data_axis="data")
    ref = np.asarray(ref_fn(ref_params, c2, s2, 1.0))
    pfn, pparams = build_tiled_slab_cascade(pyramid, mesh, stages=STAGES,
                                            slab_rows=slab, data_axis="data",
                                            halo="pallas")
    out = np.asarray(pfn(pparams, c2, s2, 1.0))
    np.testing.assert_array_equal(out, ref)
