"""Synthetic Torch7 .t7 writer for tests.

Implements the Torch7 serialization wire format (the same one
``utils/t7reader.py`` parses) well enough to produce nn.Sequential
checkpoints bit-compatible with what `torch.save` under Lua Torch emitted.
Used to validate the reader without the external teacher downloads, and to
fabricate *teacher-shaped* checkpoints whose conv modules sit at the exact
flat indices of the reference's vgg_normalised/feature_invertor files
(utils/torch_convert.py T7_*_LAYER_INDEX tables).
"""

from __future__ import annotations

import struct

import numpy as np


class Writer:
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


def write_sequential_t7(path: str, modules: list) -> None:
    """Write a flat nn.Sequential with the given ('module', cls, attrs) list
    (Torch7 'modules' tables are 1-based)."""
    wr = Writer()
    wr._any(("module", "nn.Sequential", {
        "modules": {i + 1: m for i, m in enumerate(modules)}}))
    with open(path, "wb") as fh:
        fh.write(bytes(wr.buf))


def write_teacher_t7(path: str, index_map: dict[int, str],
                     conv_params: dict[str, dict[str, np.ndarray]]) -> None:
    """Fabricate a teacher-shaped .t7: SpatialConvolution modules at exactly
    the flat indices of ``index_map`` (e.g. T7_ENCODER_LAYER_INDEX[k]), with
    reflection-pad filler modules at every other index — the same skeleton as
    the reference's vgg_normalised_conv{k}_1.t7 files.

    ``conv_params``: ``{name: {"w": HWIO, "b": (out,)}}`` (the framework's
    layout); weights are transposed to Torch7's OIHW on write.
    """
    n_modules = max(index_map) + 2  # trailing relu like the real files
    modules = []
    for i in range(n_modules):
        if i in index_map:
            p = conv_params[index_map[i]]
            w = np.ascontiguousarray(np.asarray(p["w"]).transpose(3, 2, 0, 1))
            o, c, kh, kw = w.shape
            modules.append(("module", "nn.SpatialConvolution", {
                "weight": w.astype(np.float64),
                "bias": np.asarray(p["b"], np.float64),
                "kH": kh, "kW": kw, "nInputPlane": c, "nOutputPlane": o}))
        else:
            modules.append(("module", "nn.SpatialReflectionPadding",
                            {"pad_l": 1, "pad_r": 1, "pad_t": 1, "pad_b": 1}))
    write_sequential_t7(path, modules)
