"""Pycaffe-free .caffemodel reader: wire-format roundtrip + CLI conversion.

A synthetic writer emits the same protobuf wire bytes Caffe's NetParameter
serialization produces (legacy V1LayerParameter layers like the published
VGG-19 caffemodels, and the modern `layer` field), so the parser is pinned
without a half-GB external download.
"""

import struct

import numpy as np
import pytest

from collaborative_distillation_tpu.utils.caffeproto import read_caffemodel


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wtype: int) -> bytes:
    return _varint((field << 3) | wtype)


def _len_field(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _blob(arr: np.ndarray, *, legacy_dims: bool, packed: bool = True) -> bytes:
    arr = np.asarray(arr, np.float32)
    out = bytearray()
    if legacy_dims:  # num/channels/height/width varints (old VGG files)
        dims = list(arr.shape)
        dims = [1] * (4 - len(dims)) + dims
        for f, d in zip((1, 2, 3, 4), dims):
            out += _key(f, 0) + _varint(d)
    else:  # BlobShape message, packed dims
        dims = b"".join(_varint(d) for d in arr.shape)
        out += _len_field(7, _key(1, 2) + _varint(len(dims)) + dims)
    flat = arr.ravel().astype("<f4")
    if packed:
        out += _len_field(5, flat.tobytes())
    else:
        for v in flat:
            out += _key(5, 5) + struct.pack("<f", float(v))
    return bytes(out)


def _layer(name: str, blobs, *, legacy: bool) -> bytes:
    name_f, blobs_f = (4, 6) if legacy else (1, 7)
    out = bytearray(_len_field(name_f, name.encode()))
    if legacy:
        out += _key(5, 0) + _varint(4)  # type enum CONVOLUTION
    else:
        out += _len_field(2, b"Convolution")
    for b in blobs:
        out += _len_field(blobs_f, b)
    return bytes(out)


def write_caffemodel(path, layers, *, legacy: bool = True,
                     packed: bool = True):
    """layers: {caffe_name: (weight OIHW, bias)}"""
    out = bytearray(_len_field(1, b"VGG_SYNTH"))
    container = 2 if legacy else 100
    for name, (w, b) in layers.items():
        blobs = [_blob(w, legacy_dims=legacy, packed=packed),
                 _blob(b, legacy_dims=legacy, packed=packed)]
        out += _len_field(container, _layer(name, blobs, legacy=legacy))
    # junk unknown field (training state in real snapshots) must be skipped
    out += _len_field(999, b"\x01\x02\x03")
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def _vgg_layers(rng, stages=("1_1", "1_2", "2_1")):
    widths = {"1": 64, "2": 128}
    layers = {}
    cin = 3
    for tag in stages:
        cout = widths[tag[0]]
        layers[f"conv{tag}"] = (rng.standard_normal((cout, cin, 3, 3)),
                                rng.standard_normal(cout))
        cin = cout
    return layers


@pytest.mark.parametrize("legacy", [True, False])
@pytest.mark.parametrize("packed", [True, False])
def test_caffemodel_roundtrip(tmp_path, rng, legacy, packed):
    layers = _vgg_layers(rng)
    p = tmp_path / "m.caffemodel"
    write_caffemodel(p, layers, legacy=legacy, packed=packed)
    got = read_caffemodel(str(p))
    assert list(got) == list(layers)
    for name, (w, b) in layers.items():
        np.testing.assert_allclose(got[name][0], w.astype(np.float32),
                                   rtol=1e-6)
        np.testing.assert_allclose(got[name][1], b.astype(np.float32),
                                   rtol=1e-6)


def test_convert_caffe_cli_feeds_the_zoo(tmp_path, rng):
    """End to end: synthetic VGG caffemodel -> converter -> store entry the
    zoo loads and shape-checks (stage 2; conv0 substituted by the loader)."""
    from collaborative_distillation_tpu.cli.convert_caffe import main
    from collaborative_distillation_tpu.models.specs import encoder_spec
    from collaborative_distillation_tpu.models.zoo import load_stage_params

    layers = _vgg_layers(rng)
    src = tmp_path / "vgg.caffemodel"
    write_caffemodel(src, layers, legacy=True)
    rc = main(["--caffemodel", str(src), "--out", str(tmp_path),
               "--stages", "2", "--dump", str(tmp_path / "raw.npz")])
    assert rc == 0
    spec = encoder_spec("original", 2)
    params = load_stage_params(str(tmp_path / "original" / "e2.npz"), spec)
    w = np.asarray(params["conv21"]["w"])  # HWIO
    np.testing.assert_allclose(
        w, layers["conv2_1"][0].astype(np.float32).transpose(2, 3, 1, 0),
        rtol=1e-6)
    assert params["conv0"]["w"].shape == (1, 1, 3, 3)  # preproc substituted
    raw = np.load(tmp_path / "raw.npz")
    assert "conv1_1_weight" in raw and "conv1_1_bias" in raw


def test_caffemodel_hostile_inputs(tmp_path, rng):
    layers = _vgg_layers(rng, stages=("1_1",))
    p = tmp_path / "m.caffemodel"
    write_caffemodel(p, layers)
    data = p.read_bytes()
    # truncations raise cleanly
    for cut in range(0, len(data), max(1, len(data) // 64)):
        (tmp_path / "t.caffemodel").write_bytes(data[:cut])
        try:
            read_caffemodel(str(tmp_path / "t.caffemodel"))
        except (EOFError, ValueError):
            pass
    # shape/count mismatch raises
    bad = bytearray(data)
    # flip a dim varint: find the first legacy num field (key 0x08) payload
    idx = bad.index(bytes([0x08]))
    bad[idx + 1] = 0x7F
    (tmp_path / "b.caffemodel").write_bytes(bytes(bad))
    with pytest.raises((ValueError, EOFError)):
        read_caffemodel(str(tmp_path / "b.caffemodel"))


def test_double_data_field8_and_num1_conv(tmp_path, rng):
    """double-precision caffemodels store weights in field 8 (double_data);
    and a genuine num=1 conv (1, C, kh, kw) must stay 4-D (only 1x1x1xC
    bias-shaped blobs collapse)."""
    w = rng.standard_normal((1, 3, 3, 3))  # num=1 conv weight
    b = rng.standard_normal(1)
    out = bytearray(_len_field(1, b"NET"))
    blob_w = bytearray()
    for f, d in zip((1, 2, 3, 4), w.shape):
        blob_w += _key(f, 0) + _varint(d)
    blob_w += _len_field(8, w.ravel().astype("<f8").tobytes())  # double_data
    blob_b = bytearray()
    for f, d in zip((1, 2, 3, 4), (1, 1, 1, 1)):
        blob_b += _key(f, 0) + _varint(d)
    blob_b += _len_field(8, b.astype("<f8").tobytes())
    out += _len_field(2, _layer("conv9_9", [bytes(blob_w), bytes(blob_b)],
                                legacy=True))
    p = tmp_path / "d.caffemodel"
    p.write_bytes(bytes(out))
    got = read_caffemodel(str(p))
    assert got["conv9_9"][0].shape == (1, 3, 3, 3)  # 4-D preserved
    assert got["conv9_9"][1].shape == (1,)
    np.testing.assert_allclose(got["conv9_9"][0], w.astype(np.float32),
                               rtol=1e-6)


def test_blob_data_bad_wire_type_is_clean_error(tmp_path, rng):
    """A blob 'data' field with varint wire type must raise ValueError, not
    TypeError (hostile-input contract)."""
    blob = _key(5, 0) + _varint(7)  # field 5, wire type 0 (varint)
    out = _len_field(1, b"NET") + _len_field(
        2, _layer("conv1_1", [blob], legacy=True))
    p = tmp_path / "w.caffemodel"
    p.write_bytes(out)
    with pytest.raises(ValueError, match="wire type"):
        read_caffemodel(str(p))


def test_duplicate_store_mapping_raises(tmp_path, rng):
    from collaborative_distillation_tpu.cli.convert_caffe import stage_tree
    from collaborative_distillation_tpu.models.specs import encoder_spec

    layers = _vgg_layers(rng, stages=("1_1",))
    layers["deconv1_1"] = layers["conv1_1"]  # also maps to conv11
    with pytest.raises(ValueError, match="both map to"):
        stage_tree(layers, encoder_spec("original", 1))
