"""Data pipeline: datasets, augmentation shapes, loader batching/prefetch."""

import os

import numpy as np
import pytest
from PIL import Image

from collaborative_distillation_tpu.data.pipeline import (
    CenterCropDataset,
    ContentStylePairDataset,
    ImageFolderDataset,
    Loader,
    NpyFolderDataset,
    PairGridDataset,
)


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i, size in enumerate([(320, 400), (500, 280), (300, 300), (290, 310)]):
        arr = (rng.random((size[1], size[0], 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img{i}.jpg")
    (d / "notes.txt").write_text("not an image")
    return str(d)


def test_image_folder_dataset(img_dir):
    ds = ImageFolderDataset(img_dir, shorter_side=300, crop=256)
    assert len(ds) == 4  # txt file filtered out
    arr, path = ds[0]
    assert arr.shape == (256, 256, 3)
    assert arr.dtype == np.float32 and 0 <= arr.min() and arr.max() <= 1
    assert path.endswith(".jpg")


def test_image_folder_uint8_and_cache(img_dir):
    ds8 = ImageFolderDataset(img_dir, shorter_side=300, crop=256, uint8=True,
                             cache=True, seed=7)
    dsf = ImageFolderDataset(img_dir, shorter_side=300, crop=256, seed=7)
    a8, _ = ds8[0]
    af, _ = dsf[0]
    assert a8.dtype == np.uint8 and a8.shape == (256, 256, 3)
    # same seed -> same crop/flip; uint8 is the pre-normalization bytes
    np.testing.assert_allclose(a8.astype(np.float32) / 255.0, af, atol=1e-6)
    # cached second access decodes from RAM but still re-augments (random
    # crop differs with near-certainty on a 300px source vs 256 crop)
    b8, _ = ds8[0]
    assert b8.dtype == np.uint8
    assert len(ds8._cache) == 1


def test_trainer_uint8_batch_matches_float():
    import jax
    from collaborative_distillation_tpu.train.trainer import TrainConfig, Trainer
    from collaborative_distillation_tpu.models.specs import decoder_spec, encoder_spec
    from collaborative_distillation_tpu.models.vgg import init_params

    cfg = TrainConfig(mode="wct_sd", stage=1, lw_perc=0.0, lr=1e-3)
    rng = np.random.default_rng(0)
    se = init_params(encoder_spec("16x", 1, aux=True), jax.random.key(1))
    sd = init_params(decoder_spec("16x", 1), jax.random.key(2))
    batch8 = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    batchf = batch8.astype(np.float32) / 255.0

    import jax.numpy as jnp
    copy = lambda tree: jax.tree.map(jnp.array, tree)  # each Trainer donates its params
    t1 = Trainer(cfg, copy(sd), {"se": se})
    l1, _ = t1.train_step(batch8)
    t2 = Trainer(cfg, copy(sd), {"se": se})
    l2, _ = t2.train_step(batchf)
    assert np.allclose(float(l1["pixl"]), float(l2["pixl"]), rtol=1e-5)


def test_center_crop_deterministic(img_dir):
    ds = CenterCropDataset(img_dir, shorter_side=300, crop=256)
    a1, _ = ds[1]
    a2, _ = ds[1]
    np.testing.assert_array_equal(a1, a2)


def test_npy_dataset(tmp_path):
    rng = np.random.default_rng(1)
    for i in range(2):
        np.save(tmp_path / f"x{i}.npy", (rng.random((300, 300, 3)) * 255).astype(np.uint8))
    ds = NpyFolderDataset(str(tmp_path), crop=256)
    arr, _ = ds[0]
    assert arr.shape == (256, 256, 3) and arr.max() <= 1.0


def test_content_style_pair(img_dir):
    ds = ContentStylePairDataset(img_dir, img_dir, shorter_side=300, crop=256)
    c, s = ds[2]
    assert c.shape == s.shape == (256, 256, 3)


def test_pair_grid_cross_product(img_dir):
    ds = PairGridDataset(img_dir, img_dir)
    assert len(ds) == 16  # 4 x 4
    c, s, name = ds[0]
    assert name == "img0+img0.jpg"
    assert c.ndim == 3 and s.ndim == 3


def test_pair_grid_picked_marks(img_dir):
    ds = PairGridDataset(img_dir, img_dir, picked_content_mark="img1",
                         picked_style_mark="img2")
    assert len(ds) == 1
    assert ds[0][2] == "img1+img2.jpg"


def test_pair_grid_resize(img_dir):
    ds = PairGridDataset(img_dir, img_dir, content_size=128, style_size=64)
    c, s, _ = ds[0]
    assert min(c.shape[:2]) == 128
    assert min(s.shape[:2]) == 64


def test_pair_grid_synthesis(img_dir):
    ds = PairGridDataset(img_dir, img_dir, texture_dir=img_dir,
                         synthesis=True, style_size=100)
    c, s, name = ds[0]
    assert c.shape == s.shape  # noise content matches texture size
    assert name == "img0.jpg"
    assert 0 <= c.min() and c.max() <= 1


def test_loader_batching_and_order(img_dir):
    ds = ImageFolderDataset(img_dir, shorter_side=300, crop=128)
    loader = Loader(ds, batch_size=2, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2 == len(loader)
    imgs, paths = batches[0]
    assert imgs.shape == (2, 128, 128, 3)
    assert [os.path.basename(p) for p in paths] == ["img0.jpg", "img1.jpg"]


def test_loader_shuffles_between_epochs(img_dir):
    ds = ImageFolderDataset(img_dir, shorter_side=300, crop=64)
    loader = Loader(ds, batch_size=4, shuffle=True, seed=3)
    p1 = [p for _, paths in loader for p in paths]
    p2 = [p for _, paths in loader for p in paths]
    assert sorted(p1) == sorted(p2)
    assert p1 != p2  # a reshuffle happened (4! = 24 orders; collision unlikely)


def test_native_codec_matches_pil(tmp_path):
    from collaborative_distillation_tpu.data import native_codec

    if not native_codec.available():
        pytest.skip("native codec toolchain unavailable")
    rng = np.random.default_rng(0)
    arr = (rng.random((240, 320, 3)) * 255).astype(np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(arr).save(p, quality=95)
    data = p.read_bytes()
    ours = native_codec.decode_jpeg(data)
    ref = np.asarray(Image.open(p).convert("RGB"))
    assert ours.shape == ref.shape
    # same libjpeg underneath; tiny differences possible from fancy upsampling
    assert np.abs(ours.astype(int) - ref.astype(int)).mean() < 2.0


def test_native_shorter_side_decode(tmp_path):
    from collaborative_distillation_tpu.data import native_codec

    if not native_codec.available():
        pytest.skip("native codec toolchain unavailable")
    rng = np.random.default_rng(1)
    arr = (rng.random((600, 900, 3)) * 255).astype(np.uint8)
    p = tmp_path / "big.jpg"
    Image.fromarray(arr).save(p, quality=95)
    out = native_codec.decode_jpeg_shorter_side(p.read_bytes(), 120)
    assert out is not None
    assert min(out.shape[:2]) == 120
    assert out.shape[1] / out.shape[0] == pytest.approx(1.5, rel=0.02)


def test_dataset_uses_native_path(img_dir):
    """ImageFolderDataset must produce valid crops through the native path."""
    ds = ImageFolderDataset(img_dir, shorter_side=200, crop=128)
    arr, _ = ds[0]
    assert arr.shape == (128, 128, 3)
    assert 0.0 <= arr.min() and arr.max() <= 1.0 and arr.std() > 0.05


def test_loader_early_break_does_not_deadlock(img_dir):
    """Breaking out of iteration mid-epoch must release the producer thread."""
    import threading
    ds = ImageFolderDataset(img_dir, shorter_side=200, crop=64)
    before = threading.active_count()
    for _ in range(3):
        for batch, _paths in Loader(ds, batch_size=1, prefetch=1, num_workers=2):
            break  # consumer leaves immediately with a full queue
    import time
    time.sleep(1.0)
    assert threading.active_count() <= before + 1


def test_dataset_rng_thread_safety(img_dir):
    """Parallel __getitem__ draws must stay valid (no corrupted generator)."""
    from concurrent.futures import ThreadPoolExecutor
    ds = ImageFolderDataset(img_dir, shorter_side=200, crop=64)
    with ThreadPoolExecutor(8) as pool:
        outs = list(pool.map(lambda i: ds[i % len(ds)][0], range(64)))
    for arr in outs:
        assert arr.shape == (64, 64, 3) and np.isfinite(arr).all()


def test_native_encode_jpeg_roundtrip(rng):
    from collaborative_distillation_tpu.data import native_codec as nc

    if not nc.available():
        pytest.skip("native codec unavailable")
    small = rng.random((16, 20, 3))
    arr = (np.kron(small, np.ones((8, 8, 1))) * 255).astype(np.uint8)
    b = nc.encode_jpeg(arr, quality=95)
    assert b is not None and b[:2] == b"\xff\xd8"  # JPEG SOI
    back = nc.decode_jpeg(b)
    assert back.shape == arr.shape
    assert np.abs(back.astype(int) - arr.astype(int)).mean() < 15
    # PIL interoperability
    import io
    from PIL import Image
    pil = np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
    assert pil.shape == arr.shape


def test_native_encode_jpeg_rejects_bad_input():
    from collaborative_distillation_tpu.data import native_codec as nc

    if not nc.available():
        pytest.skip("native codec unavailable")
    assert nc.encode_jpeg(np.zeros((4, 4), np.uint8)) is None
    assert nc.encode_jpeg(np.zeros((4, 4, 3), np.float32)) is None


def test_native_raw_plane_jpeg_roundtrip(rng):
    """decode_jpeg_yuv420 reads the 4:2:0 planes a JPEG actually stores (no
    color conversion anywhere); encode_jpeg_yuv420 writes them back."""
    import io

    from PIL import Image

    from collaborative_distillation_tpu.data import native_codec as nc
    if not nc.available():
        pytest.skip("native codec unavailable")
    small = rng.random((16, 20, 3))
    img = (np.kron(small, np.ones((8, 8, 1))) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95)
    planes = nc.decode_jpeg_yuv420(buf.getvalue())
    assert planes is not None, "PIL q95 writes baseline 4:2:0"
    y, cbcr = planes
    assert y.shape == img.shape[:2] and y.dtype == np.uint8
    assert cbcr.shape == (img.shape[0] // 2, img.shape[1] // 2, 2)
    # the decoded planes ARE what the encoder stored: they match the
    # source image's own 4:2:0 planes up to q95 quantization (the RGB
    # decode path would add fancy-upsampling differences at chroma edges)
    ys, cs = nc.rgb_to_yuv420(img)
    assert np.abs(y.astype(int) - ys.astype(int)).mean() < 1.0
    assert np.abs(cbcr.astype(int) - cs.astype(int)).mean() < 2.0
    # encode planes -> decode planes: lossy but close; PIL can open the file
    enc = nc.encode_jpeg_yuv420(y, cbcr, quality=95)
    assert enc is not None
    back = nc.decode_jpeg_yuv420(enc)
    assert back is not None
    assert np.abs(back[0].astype(float) - y.astype(float)).mean() < 2.0
    pil = np.asarray(Image.open(io.BytesIO(enc)).convert("RGB"))
    assert pil.shape == img.shape


def test_native_raw_plane_fallbacks(rng):
    """Non-4:2:0 and odd-dimension JPEGs return None (callers fall back)."""
    import io

    from PIL import Image

    from collaborative_distillation_tpu.data import native_codec as nc
    if not nc.available():
        pytest.skip("native codec unavailable")
    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95, subsampling=0)  # 4:4:4
    assert nc.decode_jpeg_yuv420(buf.getvalue()) is None
    buf = io.BytesIO()
    Image.fromarray(img[:31, :29]).save(buf, "JPEG", quality=95)  # odd dims
    assert nc.decode_jpeg_yuv420(buf.getvalue()) is None
    # encode rejects mismatched plane shapes
    assert nc.encode_jpeg_yuv420(np.zeros((16, 16), np.uint8),
                                 np.zeros((4, 4, 2), np.uint8)) is None


def test_native_decode_pixel_cap(rng, monkeypatch):
    """The decompression-bomb guard: claimed dims over the cap return None
    (callers fall back to PIL, which applies its own limit)."""
    import io

    from PIL import Image

    from collaborative_distillation_tpu.data import native_codec as nc
    if not nc.available():
        pytest.skip("native codec unavailable")
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95)
    data = buf.getvalue()
    assert nc.decode_jpeg_yuv420(data) is not None
    assert nc.decode_jpeg_yuv420(data, max_pixels=63 * 63) is None
    monkeypatch.setattr(nc, "MAX_DECODE_PIXELS", 63 * 63)
    assert nc.decode_jpeg(data) is None
    assert nc.decode_jpeg_yuv420(data) is None


def test_incremental_jpeg_encoder_matches_whole():
    """The banded encoder produces byte-identical JPEGs to the whole-plane
    encode, including a non-MCU-aligned final band; misuse (bad band shape,
    underfill) yields None instead of corrupt output."""
    nc = pytest.importorskip(
        "collaborative_distillation_tpu.data.native_codec")
    if not nc.available():
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(7)
    h, w = 96, 64
    rgb = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    y, cbcr = nc.rgb_to_yuv420(rgb)
    ref = nc.encode_jpeg_yuv420(y, cbcr, quality=95)
    wtr = nc.jpeg_yuv420_writer(w, h, 95)
    for a in range(0, h, 32):
        assert wtr.write(y[a:a + 32], cbcr[a // 2:(a + 32) // 2])
    assert wtr.finish() == ref
    # trailing non-multiple-of-16 band
    wtr = nc.jpeg_yuv420_writer(w, 88, 95)
    assert wtr.write(y[:48], cbcr[:24]) and wtr.write(y[48:88], cbcr[24:44])
    assert wtr.finish() == nc.encode_jpeg_yuv420(y[:88], cbcr[:44], quality=95)
    # misuse: wrong geometry kills the writer
    wtr = nc.jpeg_yuv420_writer(w, h, 95)
    assert not wtr.write(y[:10], cbcr[:5])
    assert wtr.finish() is None
    # underfilled
    wtr = nc.jpeg_yuv420_writer(w, h, 95)
    assert wtr.write(y[:32], cbcr[:16])
    assert wtr.finish() is None
    # odd dims rejected at the factory
    assert nc.jpeg_yuv420_writer(63, h) is None


def test_incremental_jpeg_decoder_matches_whole():
    """Banded raw decode == whole-image raw decode; non-4:2:0 inputs are
    rejected at open (callers fall back)."""
    import io
    nc = pytest.importorskip(
        "collaborative_distillation_tpu.data.native_codec")
    if not nc.available():
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(8)
    rgb = (rng.random((88, 64, 3)) * 255).astype(np.uint8)
    y, cbcr = nc.rgb_to_yuv420(rgb)
    jpg = nc.encode_jpeg_yuv420(y, cbcr, quality=95)
    ry, rc = nc.decode_jpeg_yuv420(jpg)
    rd = nc.jpeg_yuv420_reader(jpg)
    assert rd is not None and (rd.w, rd.h) == (64, 88)
    parts = [rd.read(32), rd.read(32), rd.read(32)]  # last clamps to 24
    assert all(p is not None for p in parts) and rd.done
    assert np.array_equal(np.concatenate([p[0] for p in parts]), ry)
    assert np.array_equal(np.concatenate([p[1] for p in parts]), rc)
    # 4:4:4 input rejected at the factory
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", subsampling=0)
    assert nc.jpeg_yuv420_reader(buf.getvalue()) is None
    # bomb guard
    assert nc.jpeg_yuv420_reader(jpg, max_pixels=100) is None


def test_incremental_encoder_abort_after_writes_no_corruption():
    """Aborting a writer after intermediate writes must not double-free the
    destination buffer (regression: jpeg_mem_dest frees superseded buffers
    on growth while the handle's copy of the pointer only updates at
    finish; found by fuzzing). Loops enough to trip glibc's checks."""
    nc = pytest.importorskip(
        "collaborative_distillation_tpu.data.native_codec")
    if not nc.available():
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(9)
    rgb = (rng.random((96, 64, 3)) * 255).astype(np.uint8)
    y, cbcr = nc.rgb_to_yuv420(rgb)
    for _ in range(50):
        w = nc.jpeg_yuv420_writer(64, 96, 95)
        assert w.write(y[:32], cbcr[:16])
        assert w.write(y[:32], cbcr[:16])
        w.close()  # abort with >4 KB already entropy-coded
    # and the finished path still matches the whole-plane encode
    ref = nc.encode_jpeg_yuv420(y, cbcr, quality=95)
    w = nc.jpeg_yuv420_writer(64, 96, 95)
    for a in range(0, 96, 32):
        assert w.write(y[a:a + 32], cbcr[a // 2:(a + 32) // 2])
    assert w.finish() == ref


def test_codec_fuzz_corrupt_jpegs_never_crash():
    """All native decode entry points (incremental reader, raw-plane whole
    decode, RGB decode) must survive arbitrarily corrupted JPEG bytes —
    serve feeds them attacker-controlled request bodies. Bounded fuzz; the
    full 2000-trial sweep ran clean when the double-free was fixed."""
    nc = pytest.importorskip(
        "collaborative_distillation_tpu.data.native_codec")
    if not nc.available():
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(11)
    rgb = (rng.random((96, 64, 3)) * 255).astype(np.uint8)
    y, cbcr = nc.rgb_to_yuv420(rgb)
    src = bytearray(nc.encode_jpeg_yuv420(y, cbcr, quality=95))
    for trial in range(300):
        buf = bytearray(src)
        for _ in range(rng.integers(1, 10)):
            mode = rng.integers(0, 3)
            if mode == 0:
                buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
            elif mode == 1 and len(buf) > 4:
                buf = buf[:rng.integers(2, len(buf))]
            else:
                pos = rng.integers(0, len(buf) + 1)
                buf = (buf[:pos]
                       + bytes(rng.integers(0, 256, rng.integers(1, 64),
                                            dtype=np.uint8)) + buf[pos:])
        data = bytes(buf)
        rd = nc.jpeg_yuv420_reader(data)
        if rd is not None:
            try:
                while not rd.done and rd.read(32) is not None:
                    pass
            finally:
                rd.close()
        nc.decode_jpeg_yuv420(data)
        nc.decode_jpeg(data, [1, 2, 4, 8][trial % 4])
