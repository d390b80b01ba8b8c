"""Golden parity: the converted *trained* checkpoints through our JAX models
vs the independent torch-functional oracle, on a real image (SURVEY.md §4's
golden-feature strategy)."""

import os

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from collaborative_distillation_tpu.models import apply_decoder, apply_encoder, stage_specs
from collaborative_distillation_tpu.models.zoo import load_stage_params

import torch_oracle

CONTENT = "/root/reference/PytorchWCT/content/in1.jpg"


@pytest.fixture(scope="module")
def real_image():
    if not os.path.exists(CONTENT):
        pytest.skip("reference sample image unavailable")
    img = Image.open(CONTENT).convert("RGB").resize((128, 96))
    return (np.asarray(img, np.float32) / 255.0)[None]


@pytest.mark.quick
@pytest.mark.parametrize("stage", [1, 3, 5])
def test_trained_se_features_match_oracle(weights_root, real_image, stage):
    enc_spec, _ = stage_specs("16x", stage)
    params = load_stage_params(os.path.join(weights_root, "16x", f"e{stage}.npz"), enc_spec)
    ours = apply_encoder(params, jnp.asarray(real_image), enc_spec)
    np_params = {k: {kk: np.asarray(vv) for kk, vv in v.items()} for k, v in params.items()}
    ref = torch_oracle.encoder_forward(np_params, real_image, enc_spec)
    for key in ("out", f"relu{stage}1", f"aux{stage}1"):
        a, b = np.asarray(ours[key]), ref[key]
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=2e-4 * scale, err_msg=key)


@pytest.mark.parametrize("stage", [1, 4])
def test_trained_autoencoder_reconstructs(weights_root, real_image, stage):
    """SE+SD were trained to reconstruct: rec error must be small — this
    catches any weight-conversion or wiring mistake that shape checks miss."""
    enc_spec, dec_spec = stage_specs("16x", stage)
    enc = load_stage_params(os.path.join(weights_root, "16x", f"e{stage}.npz"), enc_spec)
    dec = load_stage_params(os.path.join(weights_root, "16x", f"d{stage}.npz"), dec_spec)
    feats = apply_encoder(enc, jnp.asarray(real_image), enc_spec)
    rec = apply_decoder(dec, feats["out"], dec_spec)["out"]
    err = float(np.abs(np.asarray(rec) - real_image).mean())
    assert err < 0.15, err  # trained students reconstruct natural images well


def test_full_cascade_parity_with_oracle(weights_root, real_image):
    """End-to-end quality pin: the WHOLE 5-stage stylization (trained 16x
    checkpoints, real content + style images) vs the reference algorithm —
    float64 torch convs and float64 SVD-equivalent WCT (WCT.py:120-125 +
    util_wct.py:62-131) run stage by stage. Our f32 eigh cascade must match
    the f64 oracle closely through all five encode-WCT-decode round trips."""
    import torch_oracle
    from collaborative_distillation_tpu.models.zoo import load_pyramid
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    style_path = "/root/reference/PytorchWCT/style/in1.jpg"
    if not os.path.exists(style_path):
        pytest.skip("reference style image unavailable")
    style = (np.asarray(
        Image.open(style_path).convert("RGB").resize((128, 96)), np.float32)
        / 255.0)[None]
    alpha = 0.6

    eng = WCTEngine(mode="16x", weights_root=weights_root)
    ours = eng.stylize(real_image, style, alpha=alpha)

    img = real_image.astype(np.float64)
    for k in (5, 4, 3, 2, 1):
        enc_spec, dec_spec = stage_specs("16x", k)
        e = load_stage_params(os.path.join(weights_root, "16x", f"e{k}.npz"), enc_spec)
        d = load_stage_params(os.path.join(weights_root, "16x", f"d{k}.npz"), dec_spec)
        e = {n: {kk: np.asarray(v) for kk, v in p.items()} for n, p in e.items()}
        d = {n: {kk: np.asarray(v) for kk, v in p.items()} for n, p in d.items()}
        sf = torch_oracle.encoder_forward(e, style, enc_spec)["out"]
        cf = torch_oracle.encoder_forward(e, img.astype(np.float32), enc_spec)["out"]
        csf = torch_oracle.wct_oracle(cf[0].transpose(2, 0, 1),
                                      sf[0].transpose(2, 0, 1), alpha)
        img = torch_oracle.decoder_forward(
            d, csf.transpose(1, 2, 0)[None].astype(np.float32), dec_spec)["out"]
    ref = np.clip(img[0], 0.0, 1.0)

    diff = np.abs(ours[0].astype(np.float64) - ref)
    assert diff.mean() < 5e-3, diff.mean()
    assert np.quantile(diff, 0.99) < 5e-2, np.quantile(diff, 0.99)
