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


def _seq_bytes(rng, n_conv=2):
    """Serialized bytes of a small synthetic Sequential (fuzz corpus seed)."""
    wr = _Writer()
    mods = {}
    for i in range(n_conv):
        w = rng.standard_normal((4, 3, 3, 3))
        mods[2 * i + 1] = ("module", "nn.SpatialConvolution", {
            "weight": w, "bias": rng.standard_normal(4),
            "kH": 3, "kW": 3, "nInputPlane": 3})
        mods[2 * i + 2] = ("module", "nn.ReLU", {"inplace": True})
    wr._any(("module", "nn.Sequential", {"modules": mods}))
    return bytes(wr.buf)


def _parse_bytes(tmp_path, data, name="fuzz.t7"):
    p = tmp_path / name
    p.write_bytes(data)
    try:
        read_t7_conv_layers(str(p))
        return "ok"
    except (EOFError, ValueError, KeyError, TypeError, AttributeError,
            UnicodeDecodeError, RecursionError) as e:
        return type(e).__name__


def test_fuzz_truncations_never_crash(tmp_path, rng):
    """Truncating the stream at any point must raise cleanly, not segfault,
    hang, or OOM (the real teacher files are external; this is the only
    untrusted-ingestion path with no golden fixture)."""
    data = _seq_bytes(rng)
    for cut in list(range(0, min(len(data), 200))) + list(
            range(200, len(data), 97)):
        _parse_bytes(tmp_path, data[:cut])


def test_fuzz_byteflips_never_crash(tmp_path, rng):
    """Random single/multi-byte corruptions across 500 trials: every outcome
    must be a clean exception or a (garbage but bounded) success."""
    data = bytearray(_seq_bytes(rng))
    for _ in range(500):
        mutated = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos] = int(rng.integers(0, 256))
        _parse_bytes(tmp_path, bytes(mutated))


def test_fuzz_hostile_tensor_geometry(tmp_path):
    """Hand-built hostile tensors: out-of-bounds strides/offsets (unchecked
    as_strided would read arbitrary memory), huge claimed sizes (OOM),
    negative dims. All must raise ValueError/EOFError."""
    import struct as st

    def tensor_bytes(sizes, strides, offset1, n_storage):
        wr = _Writer()
        wr.buf += st.pack("<i", 4)       # torch object
        wr.buf += st.pack("<i", 1)       # heap index
        wr.string("V 1")
        wr.string("torch.DoubleTensor")
        wr.buf += st.pack("<i", len(sizes))
        for s in sizes:
            wr.buf += st.pack("<q", s)
        for s in strides:
            wr.buf += st.pack("<q", s)
        wr.buf += st.pack("<q", offset1)
        wr.buf += st.pack("<i", 4)       # storage object
        wr.buf += st.pack("<i", 2)
        wr.string("V 1")
        wr.string("torch.DoubleStorage")
        wr.buf += st.pack("<q", n_storage)
        wr.buf += b"\x00" * (8 * n_storage)
        return bytes(wr.buf)

    hostile = [
        tensor_bytes([4, 4], [1000000, 1], 1, 16),   # stride escapes storage
        tensor_bytes([4, 4], [4, 1], 1 << 40, 16),   # offset escapes storage
        tensor_bytes([1 << 20, 1 << 20], [0, 0], 1, 16),  # 2^40 elements
        tensor_bytes([-4, 4], [4, 1], 1, 16),        # negative size
        tensor_bytes([4, 4], [-8, 1], 1, 16),        # backward stride escapes
        st.pack("<i", 4) + st.pack("<i", 1)          # ndim = 2^31-1
        + st.pack("<i", 3) + b"V 1" + st.pack("<i", 19) + b"torch.DoubleTensor"
        + st.pack("<i", 0x7FFFFFFF),
    ]
    for i, data in enumerate(hostile):
        p = tmp_path / f"hostile{i}.t7"
        p.write_bytes(data)
        with pytest.raises((ValueError, EOFError, KeyError, TypeError)):
            load_t7(str(p))


def test_cuda_tensor_storage_parses(tmp_path, rng):
    """GPU-saved checkpoints serialize torch.CudaTensor over torch.CudaStorage
    (float32 wire layout); the reader must yield the weights, not crash."""
    import struct as st

    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
    wr = _Writer()
    wr.buf += st.pack("<i", 4)
    wr.buf += st.pack("<i", 1)
    wr.string("V 1")
    wr.string("torch.CudaTensor")
    wr.buf += st.pack("<i", w.ndim)
    for s in w.shape:
        wr.buf += st.pack("<q", s)
    for s in [st_ // w.itemsize for st_ in w.strides]:
        wr.buf += st.pack("<q", s)
    wr.buf += st.pack("<q", 1)
    wr.buf += st.pack("<i", 4)
    wr.buf += st.pack("<i", 2)
    wr.string("V 1")
    wr.string("torch.CudaStorage")
    wr.buf += st.pack("<q", w.size)
    wr.buf += w.ravel().tobytes()
    p = tmp_path / "cuda.t7"
    p.write_bytes(bytes(wr.buf))
    out = load_t7(str(p))
    np.testing.assert_allclose(out, w, rtol=1e-6)


def test_pre_versioning_header_parses(tmp_path, rng):
    """Pre-V1 Torch7 files carry the class name where newer files put the
    'V <n>' version string; the reader must fall through to it."""
    import struct as st

    w = rng.standard_normal((2, 3)).astype(np.float64)
    buf = bytearray()
    buf += st.pack("<i", 4)            # torch object
    buf += st.pack("<i", 1)
    cls = b"torch.DoubleTensor"        # class DIRECTLY (no version string)
    buf += st.pack("<i", len(cls)) + cls
    buf += st.pack("<i", w.ndim)
    for s in w.shape:
        buf += st.pack("<q", s)
    for s in [st_ // w.itemsize for st_ in w.strides]:
        buf += st.pack("<q", s)
    buf += st.pack("<q", 1)
    buf += st.pack("<i", 4)            # storage, also pre-versioning
    buf += st.pack("<i", 2)
    scls = b"torch.DoubleStorage"
    buf += st.pack("<i", len(scls)) + scls
    buf += st.pack("<q", w.size)
    buf += w.ravel().tobytes()
    p = tmp_path / "prev1.t7"
    p.write_bytes(bytes(buf))
    out = load_t7(str(p))
    np.testing.assert_allclose(out, w)


def test_recursive_table_parses(tmp_path):
    """Self-referencing tables (memoized heap indices) must terminate."""
    import struct as st

    buf = bytearray()
    buf += st.pack("<i", 3)   # table, heap index 1, 1 entry: {"self": <ref 1>}
    buf += st.pack("<i", 1)
    buf += st.pack("<i", 1)
    key = b"self"
    buf += st.pack("<i", 2) + st.pack("<i", len(key)) + key
    buf += st.pack("<i", 3) + st.pack("<i", 1)  # back-reference to table 1
    p = tmp_path / "cycle.t7"
    p.write_bytes(bytes(buf))
    out = load_t7(str(p))
    assert out["self"] is out


def test_fuzz_stride0_memory_bomb(tmp_path):
    """sizes=[2^27], strides=[0] over a 1-element storage stays inside
    bounds but would materialize 1 GiB in .copy() — the byte cap must
    reject it."""
    import struct as st

    wr = _Writer()
    wr.buf += st.pack("<i", 4) + st.pack("<i", 1)
    wr.string("V 1")
    wr.string("torch.DoubleTensor")
    wr.buf += st.pack("<i", 1)          # ndim 1
    wr.buf += st.pack("<q", 1 << 28)    # 268M elements -> 2 GiB claimed
    wr.buf += st.pack("<q", 0)          # stride 0: bounds-legal
    wr.buf += st.pack("<q", 1)          # offset
    wr.buf += st.pack("<i", 4) + st.pack("<i", 2)
    wr.string("V 1")
    wr.string("torch.DoubleStorage")
    wr.buf += st.pack("<q", 1) + b"\x00" * 8
    p = tmp_path / "bomb.t7"
    p.write_bytes(bytes(wr.buf))
    with pytest.raises(ValueError, match="byte cap"):
        load_t7(str(p))
