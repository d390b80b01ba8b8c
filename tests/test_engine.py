"""WCTEngine surface: bf16 path, partial stages, synthetic-weight smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from collaborative_distillation_tpu.models import decoder_spec, encoder_spec, init_params
from collaborative_distillation_tpu.wct.engine import WCTEngine, stylize_cascade_fn


def _toy_pyramid(stages, key=0):
    pyramid = {}
    k = jax.random.key(key)
    for s in stages:
        k, k1, k2 = jax.random.split(k, 3)
        espec = encoder_spec("16x", s, aux=True)
        dspec = decoder_spec("16x", s)
        pyramid[s] = {"enc_spec": espec, "dec_spec": dspec,
                      "enc": init_params(espec, k1), "dec": init_params(dspec, k2)}
    return pyramid


def test_bf16_cascade_close_to_f32(rng):
    """bf16 activations through the cascade must stay close to f32 output
    (the WCT statistics run in f32 internally regardless)."""
    stages = (2, 1)
    pyramid32 = _toy_pyramid(stages)
    params32 = {s: {"enc": pyramid32[s]["enc"], "dec": pyramid32[s]["dec"]} for s in stages}
    params16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params32)
    content = rng.random((1, 64, 64, 3), dtype=np.float32)
    style = rng.random((1, 64, 64, 3), dtype=np.float32)

    f = stylize_cascade_fn(pyramid32, stages=stages)
    out32 = f(params32, jnp.asarray(content), jnp.asarray(style), 1.0)
    out16 = f(params16, jnp.asarray(content, jnp.bfloat16),
              jnp.asarray(style, jnp.bfloat16), 1.0)
    assert out16.dtype == jnp.bfloat16
    diff = np.abs(np.asarray(out16, np.float32) - np.asarray(out32))
    assert diff.mean() < 0.05, diff.mean()


def test_bf16_full_cascade_pinned_floor(weights_root):
    """Full 5-stage cascade with the REAL converted 16x weights, bf16 engine
    vs f32 engine at a fixed seed, PSNR pinned (r4 verdict item 2: the bf16
    quality claim must be re-established at HEAD whenever the kernel path
    changes, not inherited from a prior round's measurement).

    Floors calibrated on the CPU/XLA path at this seed: noise input 17.6 dB,
    photo-like input ~30 dB. Noise sits far below real content because the
    5-level cascade routes everything through per-stage CxC eigh and noise
    covariance spectra are near-degenerate — eigenvector rotation, not
    precision, dominates (docs/BENCHMARKS.md r3 sensitivity table). The
    pinned floors are set beneath backend/kernel-path variation; a real
    bf16 accuracy break (wrong accumulation dtype, clipped activations)
    lands single-digit dB and trips them."""
    rng = np.random.default_rng(7)
    c = rng.random((128, 128, 3), dtype=np.float32)
    s = rng.random((128, 128, 3), dtype=np.float32)
    o32 = np.asarray(WCTEngine(mode="16x").stylize(c, s, alpha=1.0),
                     np.float32)
    o16 = np.asarray(
        WCTEngine(mode="16x", dtype=jnp.bfloat16).stylize(c, s, alpha=1.0),
        np.float32)
    mse = float(((o16 - o32) ** 2).mean())
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 12.0, f"bf16 cascade PSNR vs f32 collapsed: {psnr:.2f} dB"


def test_engine_external_pyramid_cast_to_dtype(rng):
    """An externally-built (f32) pyramid must be cast to the engine dtype —
    lax.conv rejects mixed f32-params/bf16-activations (regression: the
    bench's random-init teacher crashed WCTEngine(dtype=bfloat16))."""
    stages = (2, 1)
    eng = WCTEngine(mode="16x", stages=stages, pyramid=_toy_pyramid(stages),
                    dtype=jnp.bfloat16, slab_rows=32, fused=True)
    for s in stages:
        assert all(a.dtype == jnp.bfloat16
                   for a in jax.tree.leaves(eng.pyramid[s]["enc"]))
    c = rng.random((64, 48, 3), dtype=np.float32)
    sty = rng.random((64, 48, 3), dtype=np.float32)
    out = eng.stylize(c, sty)
    assert out.shape == c.shape and np.isfinite(np.asarray(out, np.float32)).all()


def test_engine_with_real_weights_all_modes(weights_root, rng):
    """Every shipped mode loads and stylizes a small pair."""
    c = rng.random((48, 64, 3), dtype=np.float32)
    s = rng.random((48, 64, 3), dtype=np.float32)
    for mode in ["16x", "16x_base"]:
        eng = WCTEngine(mode=mode, weights_root=weights_root, stages=(2, 1))
        out = eng.stylize(c, s)
        assert out.shape == c.shape
        assert np.isfinite(out).all()


def test_engine_num_run(weights_root, rng):
    c = rng.random((32, 32, 3), dtype=np.float32)
    s = rng.random((32, 32, 3), dtype=np.float32)
    eng = WCTEngine(mode="16x", weights_root=weights_root, stages=(1,))
    out1 = eng.stylize(c, s, num_run=1)
    out2 = eng.stylize(c, s, num_run=2)
    assert out1.shape == out2.shape
    assert not np.allclose(out1, out2)  # a second cascade pass changes pixels


def test_engine_batch_input(weights_root, rng):
    c = rng.random((2, 32, 32, 3), dtype=np.float32)
    s = rng.random((2, 32, 32, 3), dtype=np.float32)
    eng = WCTEngine(mode="16x", weights_root=weights_root, stages=(1,))
    out = eng.stylize(c, s)
    assert out.shape == c.shape


def test_engine_slab_fused_path(weights_root, rng):
    """Engine slab path (fused single-program cascade) end to end."""
    eng = WCTEngine(mode="16x", weights_root=weights_root, stages=(2, 1),
                    slab_rows=32, fused=True)
    c = rng.random((96, 48, 3), dtype=np.float32)  # multiple of slab: both paths see identical padding
    s = rng.random((64, 48, 3), dtype=np.float32)
    out = eng.stylize(c, s)
    assert out.shape == c.shape and np.isfinite(out).all()
    # matches the non-fused slab path
    eng2 = WCTEngine(mode="16x", weights_root=weights_root, stages=(2, 1),
                     slab_rows=32, fused=False)
    out2 = eng2.stylize(c, s)
    np.testing.assert_allclose(out, out2, atol=2e-3)
    # awkward height: adaptive slab still returns the exact input shape
    c2 = rng.random((100, 48, 3), dtype=np.float32)
    out3 = eng.stylize(c2, s)
    assert out3.shape == c2.shape and np.isfinite(out3).all()


def test_engine_fused_failure_degrades_without_pallas(weights_root, rng, monkeypatch):
    """The degradation ladder (r3 verdict item 2): when the fused cascade
    dies with a compiler/runtime error, the engine must (a) force-disable
    the Pallas conv routes so the rebuilt per-stage programs cannot contain
    the failed kernel, (b) still produce a correct full-shaped output via
    the per-stage slab path."""
    import jax.errors
    from collaborative_distillation_tpu.ops.pallas import conv

    monkeypatch.setattr(conv, "_FORCE_OFF", False)  # restore after test
    eng = WCTEngine(mode="16x", weights_root=weights_root, stages=(2, 1),
                    slab_rows=32, fused=True)
    assert eng._fused_slab is not None
    _, fparams = eng._fused_slab

    def exploding_fn(params, img, sstats, alpha):
        raise jax.errors.JaxRuntimeError(
            "RESOURCE_EXHAUSTED: synthetic scoped-VMEM OOM (test)")

    eng._fused_slab = (exploding_fn, fparams)
    c = rng.random((96, 48, 3), dtype=np.float32)
    s = rng.random((64, 48, 3), dtype=np.float32)
    with pytest.warns(RuntimeWarning, match="falling back"):
        out = eng.stylize(c, s)
    assert out.shape == c.shape and np.isfinite(out).all()
    # the ladder stepped to a configuration that cannot re-trace the kernel
    assert not conv.pallas_conv_enabled()
    assert eng._fused_slab is None
    # ... including the XLA wide packed-conv lowering: the slab must have
    # been rebuilt unpacked (advisor r4: a packed teacher falling back with
    # Pallas disabled would hit the historically crashing W>=5120 lowering)
    assert eng.slab.packed is False
    # the degraded output is the per-stage slab result, not garbage
    eng2 = WCTEngine(mode="16x", weights_root=weights_root, stages=(2, 1),
                     slab_rows=32, fused=False)
    np.testing.assert_allclose(out, eng2.stylize(c, s), atol=2e-3)
    # and a FRESH engine built while the kill switch is active must not
    # default to packed either
    eng3 = WCTEngine(mode="16x", weights_root=weights_root, stages=(2, 1),
                     slab_rows=32, fused=False)
    assert eng3.slab.packed is False


def test_stylize_device_matches_stylize(weights_root, rng):
    """The public device-resident API (what bench.py drives) must agree
    with the host-array path through the same engine."""
    eng = WCTEngine(mode="16x", weights_root=weights_root, stages=(2, 1),
                    slab_rows=32, fused=True)
    c = rng.random((96, 48, 3), dtype=np.float32)
    s = rng.random((64, 48, 3), dtype=np.float32)
    ref = eng.stylize(c, s, style_key="k")
    dev = eng.stylize_device(jnp.asarray(c), jnp.asarray(s), style_key="k")
    assert dev.shape == (1, 96, 48, 3)
    np.testing.assert_allclose(np.asarray(dev[0]), ref, atol=2e-4)
    # non-multiple-of-16 height: padded in, cropped back out
    c2 = rng.random((100, 48, 3), dtype=np.float32)
    dev2 = eng.stylize_device(jnp.asarray(c2), jnp.asarray(s), style_key="k")
    assert dev2.shape == (1, 100, 48, 3)
    np.testing.assert_allclose(np.asarray(dev2[0]),
                               eng.stylize(c2, s, style_key="k"), atol=2e-4)


def test_engine_pwct_path(weights_root, rng):
    """Photo-WCT (argmax unpooling, no final relu) runs end to end and
    differs from the standard nearest-upsample decode."""
    eng = WCTEngine(mode="16x", weights_root=weights_root, stages=(2, 1))
    c = rng.random((64, 64, 3), dtype=np.float32)
    s = rng.random((64, 64, 3), dtype=np.float32)
    out_std = eng.stylize(c, s)
    out_pwct = eng.stylize(c, s, pwct=True)
    assert out_pwct.shape == c.shape and np.isfinite(out_pwct).all()
    assert not np.allclose(out_pwct, out_std)


def test_packed_default_and_escape_hatch(monkeypatch):
    """Width packing defaults ON for every mode — including the teacher,
    whose f=2-packed full-res maps now ride the W-tiled Pallas kernel
    instead of the XLA wide-conv lowering that used to crash the remote
    TPU compiler at W >= 5120 (the r1-r3 reason packing was auto-off for
    mode='original'). CD_TPU_PACKED=0 and packed=False both force the
    unpacked pipeline (A/B + escape hatch)."""
    import jax

    from collaborative_distillation_tpu.models import (
        decoder_spec, encoder_spec, init_params)
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    def pyr(family):
        espec = encoder_spec(family, 1, aux=(family != "original"))
        dspec = decoder_spec(family, 1)
        return {1: {"enc_spec": espec, "dec_spec": dspec,
                    "enc": init_params(espec, jax.random.key(0)),
                    "dec": init_params(dspec, jax.random.key(1))}}

    monkeypatch.delenv("CD_TPU_PACKED", raising=False)
    teacher = WCTEngine(mode="original", stages=(1,), pyramid=pyr("original"),
                        slab_rows=32)
    assert teacher.slab.packed is True
    student = WCTEngine(mode="16x", stages=(1,), pyramid=pyr("16x"),
                        slab_rows=32)
    assert student.slab.packed is True
    forced = WCTEngine(mode="original", stages=(1,), pyramid=pyr("original"),
                       slab_rows=32, packed=False)
    assert forced.slab.packed is False
    monkeypatch.setenv("CD_TPU_PACKED", "0")
    env_off = WCTEngine(mode="original", stages=(1,), pyramid=pyr("original"),
                        slab_rows=32)
    assert env_off.slab.packed is False


def test_style_blend_degenerate_equals_single(rng):
    """stylize_multi with weights [1, 0] must equal single-style stylize
    exactly (the blended stats reduce to style A's)."""
    import jax

    from collaborative_distillation_tpu.models import (
        decoder_spec, encoder_spec, init_params)
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    espec = encoder_spec("16x", 1, aux=True)
    dspec = decoder_spec("16x", 1)
    pyramid = {1: {"enc_spec": espec, "dec_spec": dspec,
                   "enc": init_params(espec, jax.random.key(0)),
                   "dec": init_params(dspec, jax.random.key(1))}}
    eng = WCTEngine(mode="toy", stages=(1,), pyramid=pyramid)
    c = rng.random((48, 48, 3)).astype(np.float32)
    sa = rng.random((48, 48, 3)).astype(np.float32)
    sb = rng.random((48, 48, 3)).astype(np.float32)
    ref = eng.stylize(c, sa, 1.0)
    out = eng.stylize_multi(c, [sa, sb], [1.0, 0.0])
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # a genuine blend differs from both endpoints
    mid = eng.stylize_multi(c, [sa, sb], [0.5, 0.5])
    assert np.abs(mid - ref).mean() > 1e-3
    assert np.abs(mid - eng.stylize(c, sb, 1.0)).mean() > 1e-3


def test_style_blend_fused_path_and_key_caching(rng):
    """Blending works on the fused slab path, and keyed blends land in the
    style cache under a deterministic combo key."""
    import jax

    from collaborative_distillation_tpu.models import (
        decoder_spec, encoder_spec, init_params)
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    pyr = {}
    for s in (2, 1):
        espec = encoder_spec("16x", s, aux=True)
        dspec = decoder_spec("16x", s)
        pyr[s] = {"enc_spec": espec, "dec_spec": dspec,
                  "enc": init_params(espec, jax.random.key(s)),
                  "dec": init_params(dspec, jax.random.key(10 + s))}
    eng = WCTEngine(mode="toy", stages=(2, 1), pyramid=pyr, slab_rows=32)
    c = rng.random((96, 48, 3)).astype(np.float32)
    sa = rng.random((64, 48, 3)).astype(np.float32)
    sb = rng.random((64, 48, 3)).astype(np.float32)
    key, proxy = eng.blend_styles([sa, sb], [0.7, 0.3],
                                  style_keys=["a", "b"])
    assert key == "blend:a:0.7000+b:0.3000"
    out = eng.stylize(c, proxy, 1.0, style_key=key)
    assert out.shape == c.shape
    ref = eng.stylize(c, sa, 1.0, style_key="a")
    assert np.abs(out - ref).mean() > 1e-3
    # w=[1,0] through the fused path reduces to style A's output
    key1, proxy1 = eng.blend_styles([sa, sb], [1.0, 0.0],
                                    style_keys=["a", "b"])
    np.testing.assert_allclose(eng.stylize(c, proxy1, 1.0, style_key=key1),
                               ref, atol=1e-5)
