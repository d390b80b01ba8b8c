"""Torch7 deserializer roundtrip: write a synthetic .t7 nn.Sequential, read it.

The teacher .t7 checkpoints are external downloads, so the reader is validated
against a bit-accurate synthetic writer implementing the same wire format.
"""

import numpy as np
import pytest

from collaborative_distillation_tpu.utils.t7reader import load_t7, read_t7_conv_layers
from t7_synth import Writer as _Writer


@pytest.fixture
def synthetic_t7(tmp_path, rng):
    w0 = rng.standard_normal((3, 3, 1, 1))
    b0 = rng.standard_normal(3)
    w1 = rng.standard_normal((8, 3, 3, 3))
    b1 = rng.standard_normal(8)
    wr = _Writer()
    seq = ("module", "nn.Sequential", {
        "modules": {
            1: ("module", "nn.SpatialConvolution", {
                "weight": w0, "bias": b0, "kH": 1, "kW": 1, "nInputPlane": 3}),
            2: ("module", "nn.SpatialReflectionPadding", {"pad_l": 1}),
            3: ("module", "nn.SpatialConvolution", {
                "weight": w1, "bias": b1, "kH": 3, "kW": 3, "nInputPlane": 3}),
            4: ("module", "nn.ReLU", {"inplace": True}),
        },
    })
    wr._any(seq)
    path = tmp_path / "model.t7"
    path.write_bytes(bytes(wr.buf))
    return str(path), (w0, b0, w1, b1)


def test_roundtrip_conv_layers(synthetic_t7):
    path, (w0, b0, w1, b1) = synthetic_t7
    layers = read_t7_conv_layers(path)
    assert sorted(layers) == [0, 2]  # 0-based flat indices; pad/relu skipped
    np.testing.assert_allclose(layers[0][0], w0)
    np.testing.assert_allclose(layers[0][1], b0)
    np.testing.assert_allclose(layers[2][0], w1)
    np.testing.assert_allclose(layers[2][1], b1)


def test_load_t7_structure(synthetic_t7):
    path, _ = synthetic_t7
    root = load_t7(path)
    assert root.torch_type == "nn.Sequential"
    mods = root["modules"]
    assert mods[2].torch_type == "nn.SpatialReflectionPadding"
    assert mods[4]["inplace"] is True


def test_flattened_2d_weight_reshape(tmp_path, rng):
    """Old Torch7 sometimes stores conv weight as (out, in*kh*kw)."""
    w = rng.standard_normal((4, 3 * 3 * 3))
    b = rng.standard_normal(4)
    wr = _Writer()
    wr._any(("module", "nn.Sequential", {
        "modules": {1: ("module", "nn.SpatialConvolution", {
            "weight": w, "bias": b, "kH": 3, "kW": 3, "nInputPlane": 3})},
    }))
    path = tmp_path / "flat.t7"
    path.write_bytes(bytes(wr.buf))
    layers = read_t7_conv_layers(str(path))
    assert layers[0][0].shape == (4, 3, 3, 3)
    np.testing.assert_allclose(layers[0][0].reshape(4, -1), w)
