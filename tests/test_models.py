"""Model apply-function parity vs the torch-functional oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from collaborative_distillation_tpu.models import (
    apply_decoder,
    apply_decoder_pwct,
    apply_encoder,
    decoder_spec,
    encoder_spec,
    init_params,
)

import torch_oracle


def _np_params(params):
    return jax.tree.map(np.asarray, params)


@pytest.mark.parametrize("family,stage", [("original", 1), ("original", 3), ("16x", 2), ("16x", 5)])
def test_encoder_matches_oracle(rng, family, stage):
    spec = encoder_spec(family, stage, aux=(family == "16x"))
    params = init_params(spec, jax.random.key(0))
    x = rng.standard_normal((1, 32, 48, 3), dtype=np.float32)
    ours = apply_encoder(params, jnp.asarray(x), spec)
    ref = torch_oracle.encoder_forward(_np_params(params), x, spec)
    assert set(ours) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(ours[k]), ref[k], rtol=1e-4, atol=1e-4, err_msg=k)


@pytest.mark.parametrize("family,stage,aux", [("original", 2, False), ("16x", 4, False), ("16x", 5, True)])
def test_decoder_matches_oracle(rng, family, stage, aux):
    spec = decoder_spec(family, stage, aux=aux)
    params = init_params(spec, jax.random.key(1))
    cin = spec.layers[0].in_ch
    x = rng.standard_normal((1, 4, 6, cin), dtype=np.float32)
    ours = apply_decoder(params, jnp.asarray(x), spec)
    ref = torch_oracle.decoder_forward(_np_params(params), x, spec)
    assert set(ours) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(ours[k]), ref[k], rtol=1e-4, atol=1e-4, err_msg=k)


def test_encoder_decoder_roundtrip_shapes():
    """Decoder(encoder(x)) must reproduce the input shape for 16-multiple sizes."""
    for stage in range(1, 6):
        espec = encoder_spec("16x", stage, aux=True)
        dspec = decoder_spec("16x", stage)
        eparams = init_params(espec, jax.random.key(2))
        dparams = init_params(dspec, jax.random.key(3))
        x = jnp.zeros((1, 32, 64, 3))
        feats = apply_encoder(eparams, x, espec)
        down = 2 ** (stage - 1)
        assert feats["out"].shape == (1, 32 // down, 64 // down, espec.out_channels)
        rec = apply_decoder(dparams, feats["out"], dspec)["out"]
        assert rec.shape == x.shape


def test_encoder_taps_and_aux_structure():
    spec = encoder_spec("16x", 5, aux=True)
    params = init_params(spec, jax.random.key(4))
    outs = apply_encoder(params, jnp.zeros((1, 32, 32, 3)), spec)
    assert {f"relu{k}1" for k in range(1, 6)} <= set(outs)
    assert {f"aux{k}1" for k in range(1, 6)} <= set(outs)
    # aux features have teacher widths at tap resolutions
    assert outs["aux11"].shape == (1, 32, 32, 64)
    assert outs["aux51"].shape == (1, 2, 2, 512)
    # final output == relu5_1 tap
    np.testing.assert_array_equal(np.asarray(outs["out"]), np.asarray(outs["relu51"]))


def test_pwct_decode_shapes(rng):
    """Photo-WCT path: argmax pooling indices drive the unpooling."""
    espec = encoder_spec("16x", 3, aux=True)
    dspec = decoder_spec("16x", 3)
    eparams = init_params(espec, jax.random.key(5))
    dparams = init_params(dspec, jax.random.key(6))
    x = jnp.asarray(rng.standard_normal((1, 24, 24, 3), dtype=np.float32))
    feats = apply_encoder(eparams, x, espec, with_pool_argmax=True)
    assert "pool1_idx" in feats and "pool2_idx" in feats
    rec = apply_decoder_pwct(dparams, feats["out"], dspec, feats)
    assert rec.shape == x.shape


def test_decoder_final_relu_off_is_norule(rng):
    """final_relu=False == the reference's Decoder4.forward_norule
    (model_original.py:391-404): identical decode, no ReLU on the last conv,
    so out_relu = relu(out_norule) and every intermediate tap is unchanged."""
    import jax
    import jax.numpy as jnp

    from collaborative_distillation_tpu.models.specs import decoder_spec
    from collaborative_distillation_tpu.models.vgg import apply_decoder, init_params

    spec = decoder_spec("original", 2)
    params = init_params(spec, jax.random.key(3))
    feat = jnp.asarray(rng.standard_normal((1, 8, 8, 128)).astype(np.float32))
    with_relu = apply_decoder(params, feat, spec)
    norule = apply_decoder(params, feat, spec, final_relu=False)
    np.testing.assert_array_equal(
        np.asarray(with_relu["out"]),
        np.maximum(np.asarray(norule["out"]), 0.0))
    assert float(jnp.min(norule["out"])) < 0.0  # negatives actually survive
    for k in with_relu:
        # dec11 IS the final conv's output (the 3-channel image tap), so it
        # changes with the final relu exactly like "out" does
        if k in ("out", "dec11"):
            np.testing.assert_array_equal(
                np.asarray(with_relu[k]),
                np.maximum(np.asarray(norule[k]), 0.0))
        else:
            np.testing.assert_array_equal(np.asarray(with_relu[k]),
                                          np.asarray(norule[k]))
