"""Spec correctness: generated shapes must match the reference checkpoints."""

import glob
import os

import numpy as np
import pytest

from collaborative_distillation_tpu.models.specs import decoder_spec, encoder_spec

pytestmark = pytest.mark.quick  # fast regression tier (pytest -m quick)


def _ckpt_shapes(path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    return {k: tuple(v.shape) for k, v in obj.items()}


@pytest.mark.parametrize("stage", [1, 2, 3, 4, 5])
def test_16x_encoder_spec_matches_base_ckpt(reference_ckpt_dir, stage):
    path = os.path.join(reference_ckpt_dir, "small16x_ae_base", f"e{stage}_base.pth")
    ref = _ckpt_shapes(path)
    spec = encoder_spec("16x", stage, aux=True)
    shapes = spec.param_shapes()
    # ours: (kh, kw, in, out); torch: (out, in, kh, kw)
    ours = {f"{n}.weight": (w[3], w[2], w[0], w[1]) for n, (w, b) in shapes.items()}
    ours.update({f"{n}.bias": b for n, (w, b) in shapes.items()})
    assert ours == ref


@pytest.mark.parametrize("stage", [1, 2, 3, 4, 5])
def test_16x_decoder_spec_matches_base_ckpt(reference_ckpt_dir, stage):
    path = os.path.join(reference_ckpt_dir, "small16x_ae_base", f"d{stage}_base.pth")
    ref = _ckpt_shapes(path)
    spec = decoder_spec("16x", stage, aux=False)
    shapes = spec.param_shapes()
    ours = {f"{n}.weight": (w[3], w[2], w[0], w[1]) for n, (w, b) in shapes.items()}
    ours.update({f"{n}.bias": b for n, (w, b) in shapes.items()})
    assert ours == ref


def test_16x_trained_se_ckpts_match_spec(reference_ckpt_dir):
    """The {k}SE.pth symlinks are the trained SE stages (WCT.py:50-54)."""
    paths = sorted(glob.glob(os.path.join(reference_ckpt_dir, "wct_se_16x_new", "[1-5]SE.pth")))
    assert len(paths) == 5
    for path in paths:
        stage = int(os.path.basename(path)[0])
        ref = _ckpt_shapes(path)
        spec = encoder_spec("16x", stage, aux=True)
        shapes = spec.param_shapes()
        ours = {f"{n}.weight": (w[3], w[2], w[0], w[1]) for n, (w, b) in shapes.items()}
        ours.update({f"{n}.bias": b for n, (w, b) in shapes.items()})
        assert ours == ref, path


def test_original_specs_shapes():
    spec = encoder_spec("original", 5)
    shapes = spec.param_shapes()
    assert shapes["conv11"][0] == (3, 3, 3, 64)
    assert shapes["conv51"][0] == (3, 3, 512, 512)
    assert len([n for n in shapes if n != "conv0"]) == 13
    dspec = decoder_spec("original", 5)
    dshapes = dspec.param_shapes()
    assert dshapes["conv51"][0] == (3, 3, 512, 512)
    assert dshapes["conv41"][0] == (3, 3, 512, 256)
    assert dshapes["conv11"][0] == (3, 3, 64, 3)


def test_kd2sd_decoder_aux_shapes():
    dspec = decoder_spec("16x", 5, aux=True)
    shapes = dspec.param_shapes()
    assert shapes["aux51"][0] == (1, 1, 128, 512)
    assert shapes["aux41"][0] == (1, 1, 64, 256)
    assert shapes["aux31"][0] == (1, 1, 32, 128)
    assert shapes["aux21"][0] == (1, 1, 16, 64)
    assert "aux11" not in shapes


def test_stage1_student_width_24():
    assert encoder_spec("16x", 1, aux=True).param_shapes()["conv11"][0] == (3, 3, 3, 24)
    assert decoder_spec("16x", 1).param_shapes()["conv11"][0] == (3, 3, 24, 3)
