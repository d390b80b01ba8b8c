"""Torch-free regression guard: activations of the trained checkpoints on a
fixed input, captured once (tests/golden_fixtures.npz) and pinned.

Catches silent numerical drift in the conv/pool/pad semantics or in the
weight store without needing torch or the reference at test time.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from collaborative_distillation_tpu.models import apply_decoder, apply_encoder, stage_specs
from collaborative_distillation_tpu.models.zoo import load_stage_params

FIXTURE = os.path.join(os.path.dirname(__file__), "golden_fixtures.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(FIXTURE):
        pytest.skip("golden fixture not generated")
    with np.load(FIXTURE) as data:
        return {k: data[k] for k in data.files}


@pytest.mark.parametrize("stage", [1, 3, 5])
def test_encoder_decoder_match_golden(golden, weights_root, stage):
    espec, dspec = stage_specs("16x", stage)
    enc = load_stage_params(os.path.join(weights_root, "16x", f"e{stage}.npz"), espec)
    dec = load_stage_params(os.path.join(weights_root, "16x", f"d{stage}.npz"), dspec)
    outs = apply_encoder(enc, jnp.asarray(golden["input"][None]), espec)
    for key, got in [(f"e{stage}_out", outs["out"]),
                     (f"e{stage}_aux", outs[f"aux{stage}1"])]:
        ref = golden[key]
        scale = max(np.abs(ref).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4 * scale, err_msg=key)
    rec = apply_decoder(dec, outs["out"], dspec)["out"]
    ref = golden[f"d{stage}_rec"]
    np.testing.assert_allclose(np.asarray(rec), ref, atol=1e-4, err_msg=f"d{stage}_rec")
