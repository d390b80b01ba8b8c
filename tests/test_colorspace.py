"""YUV 4:2:0 transport: roundtrip fidelity + engine integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from collaborative_distillation_tpu.utils.colorspace import (
    rgb_to_yuv420_host,
    rgbf_to_yuv420_device,
    yuv420_to_rgb_host,
    yuv420_to_rgbf_device,
)

pytestmark = pytest.mark.quick  # fast regression tier (pytest -m quick)


def _smooth_rgb(rng, h, w):
    small = rng.random((h // 8, w // 8, 3))
    up = small.repeat(8, axis=0).repeat(8, axis=1)
    return (up * 255).astype(np.uint8)[None]


def test_host_roundtrip_high_psnr(rng):
    x = _smooth_rgb(rng, 64, 96)
    back = yuv420_to_rgb_host(*rgb_to_yuv420_host(x))
    mse = np.mean((back.astype(np.float64) - x.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr > 38.0, psnr


def test_device_converters_match_host(rng):
    x = _smooth_rgb(rng, 32, 48)
    y, c = rgb_to_yuv420_host(x)
    rgbf = np.asarray(yuv420_to_rgbf_device(jnp.asarray(y), jnp.asarray(c)))
    ref = yuv420_to_rgb_host(y, c).astype(np.float32) / 255.0
    np.testing.assert_allclose(rgbf, ref, atol=2 / 255)
    y2, c2 = (np.asarray(a) for a in rgbf_to_yuv420_device(jnp.asarray(rgbf)))
    yr, cr = rgb_to_yuv420_host((np.clip(rgbf, 0, 1) * 255 + 0.5).astype(np.uint8))
    assert np.abs(y2.astype(int) - yr.astype(int)).max() <= 2
    assert np.abs(c2.astype(int) - cr.astype(int)).max() <= 2


def test_gray_image_is_chroma_invariant(rng):
    g = (rng.random((1, 32, 32, 1)) * 255).astype(np.uint8).repeat(3, axis=-1)
    back = yuv420_to_rgb_host(*rgb_to_yuv420_host(g))
    assert np.abs(back.astype(int) - g.astype(int)).max() <= 1


def test_engine_yuv_transport_close_to_rgb(rng):
    from collaborative_distillation_tpu.models.specs import decoder_spec, encoder_spec
    from collaborative_distillation_tpu.models.vgg import init_params
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    key = jax.random.key(9)
    stages = (1,)
    espec = encoder_spec("16x", 1, aux=True)
    dspec = decoder_spec("16x", 1)
    k1, k2 = jax.random.split(key)
    pyramid = {1: {"enc_spec": espec, "dec_spec": dspec,
                   "enc": init_params(espec, k1), "dec": init_params(dspec, k2)}}
    eng = WCTEngine(mode="16x", pyramid=pyramid, stages=stages)
    c = _smooth_rgb(rng, 48, 64)[0]
    s = _smooth_rgb(rng, 32, 32)[0]
    # precise contract: yuv transport == rgb transport applied to the
    # chroma-roundtripped input, up to the OUTPUT-side 4:2:0 roundtrip
    c_rt = yuv420_to_rgb_host(*rgb_to_yuv420_host(c[None]))[0]
    ref = eng.stylize(c_rt, s, alpha=0.7, as_uint8=True)
    out_yuv = eng.stylize(c, s, alpha=0.7, as_uint8=True, transport="yuv420")
    assert out_yuv.shape == ref.shape == c.shape
    ref_rt = yuv420_to_rgb_host(*rgb_to_yuv420_host(ref[None]))[0]
    diff = np.abs(out_yuv.astype(int) - ref_rt.astype(int))
    assert diff.mean() < 1.5, diff.mean()
    # and the overall result stays visually equivalent to pure-RGB transport
    out_rgb = eng.stylize(c, s, alpha=0.7, as_uint8=True)
    mse = np.mean((out_yuv.astype(np.float64) - out_rgb.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr > 30.0, psnr


def test_engine_yuv_transport_odd_size(rng):
    from collaborative_distillation_tpu.models.specs import decoder_spec, encoder_spec
    from collaborative_distillation_tpu.models.vgg import init_params
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    key = jax.random.key(9)
    espec = encoder_spec("16x", 1, aux=True)
    dspec = decoder_spec("16x", 1)
    k1, k2 = jax.random.split(key)
    pyramid = {1: {"enc_spec": espec, "dec_spec": dspec,
                   "enc": init_params(espec, k1), "dec": init_params(dspec, k2)}}
    eng = WCTEngine(mode="16x", pyramid=pyramid, stages=(1,), transport="yuv420")
    c = _smooth_rgb(rng, 48, 64)[0][:45, :63]  # odd dims
    s = _smooth_rgb(rng, 32, 32)[0]
    out = eng.stylize(c, s, alpha=0.5, as_uint8=True)
    assert out.shape == c.shape


def test_bad_transport_rejected():
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    with pytest.raises(ValueError, match="transport"):
        WCTEngine(mode="16x", pyramid={}, stages=(), transport="cmyk")


# ---- native fixed-point conversion (native/imgcodec.cpp) ----

def _numpy_only(monkeypatch):
    """Force the host converters onto their pure-numpy bodies."""
    from collaborative_distillation_tpu.data import native_codec
    monkeypatch.setattr(native_codec, "rgb_to_yuv420", lambda *_: None)
    monkeypatch.setattr(native_codec, "yuv420_to_rgb", lambda *_: None)


@pytest.mark.parametrize("shape", [(64, 96), (130, 62), (2, 2)])
def test_native_matches_numpy_within_1lsb(rng, monkeypatch, shape):
    from collaborative_distillation_tpu.data import native_codec
    if not native_codec.available():
        pytest.skip("native codec unavailable")
    x = (rng.random((1, *shape, 3)) * 255).astype(np.uint8)
    y_nat, c_nat = rgb_to_yuv420_host(x)
    with monkeypatch.context() as m:
        _numpy_only(m)
        y_np, c_np = rgb_to_yuv420_host(x)
        rgb_np = yuv420_to_rgb_host(y_nat, c_nat)
    assert np.abs(y_nat.astype(int) - y_np.astype(int)).max() <= 1
    assert np.abs(c_nat.astype(int) - c_np.astype(int)).max() <= 1
    rgb_nat = yuv420_to_rgb_host(y_nat, c_nat)
    assert np.abs(rgb_nat.astype(int) - rgb_np.astype(int)).max() <= 1


def test_native_batched_matches_per_image(rng):
    from collaborative_distillation_tpu.data import native_codec
    if not native_codec.available():
        pytest.skip("native codec unavailable")
    x = (rng.random((3, 16, 24, 3)) * 255).astype(np.uint8)
    y, c = rgb_to_yuv420_host(x)
    assert y.shape == (3, 16, 24) and c.shape == (3, 8, 12, 2)
    for i in range(3):
        yi, ci = rgb_to_yuv420_host(x[i][None])
        np.testing.assert_array_equal(y[i], yi[0])
        np.testing.assert_array_equal(c[i], ci[0])
    back = yuv420_to_rgb_host(y, c)
    assert back.shape == x.shape


def test_auto_transport_picks_by_size(rng, monkeypatch):
    """transport='auto' (the default): small uint8 images ride RGB, images
    past the threshold ride 4:2:0 — outputs match the explicit transports."""
    from collaborative_distillation_tpu.models.specs import decoder_spec, encoder_spec
    from collaborative_distillation_tpu.models.vgg import init_params
    from collaborative_distillation_tpu.wct import engine as eng_mod

    key = jax.random.key(9)
    espec = encoder_spec("16x", 1, aux=True)
    dspec = decoder_spec("16x", 1)
    k1, k2 = jax.random.split(key)
    pyramid = {1: {"enc_spec": espec, "dec_spec": dspec,
                   "enc": init_params(espec, k1), "dec": init_params(dspec, k2)}}
    eng = eng_mod.WCTEngine(mode="16x", pyramid=pyramid, stages=(1,))
    assert eng.transport == "auto"
    c = _smooth_rgb(rng, 48, 64)[0]
    s = _smooth_rgb(rng, 32, 32)[0]
    # below threshold: auto == rgb exactly
    out_auto = eng.stylize(c, s, alpha=0.5, as_uint8=True)
    out_rgb = eng.stylize(c, s, alpha=0.5, as_uint8=True, transport="rgb")
    np.testing.assert_array_equal(out_auto, out_rgb)
    # force the threshold below this image: auto == yuv420 exactly
    monkeypatch.setattr(eng_mod, "_YUV_AUTO_PIX", 48 * 64)
    out_auto2 = eng.stylize(c, s, alpha=0.5, as_uint8=True)
    out_yuv = eng.stylize(c, s, alpha=0.5, as_uint8=True, transport="yuv420")
    np.testing.assert_array_equal(out_auto2, out_yuv)
    # float I/O never auto-selects yuv420 (bit-exactness contract)
    cf = c.astype(np.float32) / 255.0
    sf = s.astype(np.float32) / 255.0
    out_f = eng.stylize(cf, sf, alpha=0.5)
    out_f_rgb = eng.stylize(cf, sf, alpha=0.5, transport="rgb")
    np.testing.assert_array_equal(out_f, out_f_rgb)


def test_engine_stylize_planes_matches_yuv_transport(rng):
    """stylize_planes (the JPEG-native serving endpoint) == stylize with
    yuv420 transport, up to the output-side uint8 conversion."""
    from collaborative_distillation_tpu.models.specs import decoder_spec, encoder_spec
    from collaborative_distillation_tpu.models.vgg import init_params
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    key = jax.random.key(9)
    espec = encoder_spec("16x", 1, aux=True)
    dspec = decoder_spec("16x", 1)
    k1, k2 = jax.random.split(key)
    pyramid = {1: {"enc_spec": espec, "dec_spec": dspec,
                   "enc": init_params(espec, k1), "dec": init_params(dspec, k2)}}
    eng = WCTEngine(mode="16x", pyramid=pyramid, stages=(1,))
    c = _smooth_rgb(rng, 48, 64)[0]
    s = _smooth_rgb(rng, 32, 32)[0]
    y, cbcr = rgb_to_yuv420_host(c[None])
    yo, co = eng.stylize_planes(y[0], cbcr[0], s, alpha=0.7, style_key="p")
    assert yo.shape == y[0].shape and co.shape == cbcr[0].shape
    ref = eng.stylize(c, s, alpha=0.7, as_uint8=True, transport="yuv420")
    out = yuv420_to_rgb_host(yo[None], co[None])[0]
    d = np.abs(out.astype(int) - ref.astype(int))
    assert d.mean() < 2.0, d.mean()


def test_auto_transport_float_input_uint8_output_stays_lossless(rng, monkeypatch):
    """auto resolves from the INPUT side only: float input with as_uint8
    output must never get lossy 4:2:0 transport, whatever the image size."""
    from collaborative_distillation_tpu.models.specs import decoder_spec, encoder_spec
    from collaborative_distillation_tpu.models.vgg import init_params
    from collaborative_distillation_tpu.wct import engine as eng_mod

    key = jax.random.key(9)
    espec = encoder_spec("16x", 1, aux=True)
    dspec = decoder_spec("16x", 1)
    k1, k2 = jax.random.split(key)
    pyramid = {1: {"enc_spec": espec, "dec_spec": dspec,
                   "enc": init_params(espec, k1), "dec": init_params(dspec, k2)}}
    eng = eng_mod.WCTEngine(mode="16x", pyramid=pyramid, stages=(1,))
    monkeypatch.setattr(eng_mod, "_YUV_AUTO_PIX", 1)  # everything is "big"
    c = _smooth_rgb(rng, 48, 64)[0].astype(np.float32) / 255.0
    s = _smooth_rgb(rng, 32, 32)[0].astype(np.float32) / 255.0
    out_auto = eng.stylize(c, s, alpha=0.5, as_uint8=True)
    out_rgb = eng.stylize(c, s, alpha=0.5, as_uint8=True, transport="rgb")
    np.testing.assert_array_equal(out_auto, out_rgb)


def test_banded_yuv_upload_matches_whole(rng):
    """The banded convert-while-uploading path must produce exactly the
    planes the whole-image conversion produces (even bands keep every 2x2
    chroma box inside one band)."""
    import jax.numpy as jnp
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    x = (rng.random((1, 70, 36, 3)) * 255).astype(np.uint8)
    x = x[:, :70 - (70 % 2), :, :]
    y_ref, c_ref = rgb_to_yuv420_host(x)
    y_b, c_b = WCTEngine._upload_yuv420(x, bands=4)
    np.testing.assert_array_equal(np.asarray(y_b), y_ref)
    np.testing.assert_array_equal(np.asarray(c_b), c_ref)


def test_explicit_yuv_transport_with_float_input_stays_lossless(rng):
    """transport='yuv420' with float content can't take the 4:2:0 input leg;
    the output leg must then downgrade too — lossless float input never
    gets chroma-lossy output."""
    from collaborative_distillation_tpu.models import (
        decoder_spec, encoder_spec, init_params)
    from collaborative_distillation_tpu.wct.engine import WCTEngine
    import jax as _jax

    espec = encoder_spec("16x", 1, aux=True)
    dspec = decoder_spec("16x", 1)
    pyramid = {1: {"enc_spec": espec, "dec_spec": dspec,
                   "enc": init_params(espec, _jax.random.key(0)),
                   "dec": init_params(dspec, _jax.random.key(1))}}
    eng = WCTEngine(mode="16x", pyramid=pyramid, stages=(1,),
                    transport="yuv420")
    c = rng.random((32, 32, 3)).astype(np.float32)
    s = rng.random((32, 32, 3)).astype(np.float32)
    out_yuv_cfg = eng.stylize(c, s, alpha=0.5, as_uint8=True)
    out_rgb = eng.stylize(c, s, alpha=0.5, as_uint8=True, transport="rgb")
    np.testing.assert_array_equal(out_yuv_cfg, out_rgb)
