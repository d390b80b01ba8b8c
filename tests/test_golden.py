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
