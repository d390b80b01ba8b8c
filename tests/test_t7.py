"""Torch7 deserializer roundtrip: write a synthetic .t7 nn.Sequential, read it.

The teacher .t7 checkpoints are external downloads, so the reader is validated
against a bit-accurate synthetic writer implementing the same wire format.
"""

import struct

import numpy as np
import pytest

from collaborative_distillation_tpu.utils.t7reader import load_t7, read_t7_conv_layers


class _Writer:
    def __init__(self):
        self.buf = bytearray()
        self.next_index = 1

    def i32(self, v):
        self.buf += struct.pack("<i", v)

    def i64(self, v):
        self.buf += struct.pack("<q", v)

    def f64(self, v):
        self.buf += struct.pack("<d", v)

    def string(self, s):
        b = s.encode()
        self.i32(len(b))
        self.buf += b

    def number(self, v):
        self.i32(1)
        self.f64(v)

    def table(self, d):
        self.i32(3)
        self.i32(self._idx())
        self.i32(len(d))
        for k, v in d.items():
            self._any(k)
            self._any(v)

    def _idx(self):
        i = self.next_index
        self.next_index += 1
        return i

    def _any(self, v):
        if v is None:
            self.i32(0)
        elif isinstance(v, bool):
            self.i32(5)
            self.i32(1 if v else 0)
        elif isinstance(v, (int, float)):
            self.number(float(v))
        elif isinstance(v, str):
            self.i32(2)
            self.string(v)
        elif isinstance(v, dict):
            self.table(v)
        elif isinstance(v, np.ndarray):
            self.tensor(v)
        elif isinstance(v, tuple) and v[0] == "module":
            self.module(v[1], v[2])
        else:
            raise TypeError(type(v))

    def module(self, cls, attrs):
        self.i32(4)
        self.i32(self._idx())
        self.string("V 1")
        self.string(cls)
        self.table(attrs)

    def tensor(self, arr):
        arr = np.asarray(arr, np.float64)
        self.i32(4)
        self.i32(self._idx())
        self.string("V 1")
        self.string("torch.DoubleTensor")
        self.i32(arr.ndim)
        for s in arr.shape:
            self.i64(s)
        strides = [st // arr.itemsize for st in arr.strides]
        for s in strides:
            self.i64(s)
        self.i64(1)  # storageOffset, 1-based
        # storage object
        self.i32(4)
        self.i32(self._idx())
        self.string("V 1")
        self.string("torch.DoubleStorage")
        flat = np.ascontiguousarray(arr).ravel()
        self.i64(flat.size)
        self.buf += flat.tobytes()


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
