"""Chunked threaded device->host transfer: exactness + engine integration."""

import numpy as np
import jax.numpy as jnp

from collaborative_distillation_tpu.utils.transfer import fetch


def test_fetch_exact_uint8(rng):
    x = rng.integers(0, 255, (1, 257, 131, 3), dtype=np.uint8)
    d = jnp.asarray(x)
    out = fetch(d, min_bytes=0, chunks=7, threads=4)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, x)


def test_fetch_exact_float_and_small_path(rng):
    x = rng.random((33, 65), np.float32)
    d = jnp.asarray(x)
    # below min_bytes -> plain path
    np.testing.assert_array_equal(fetch(d), x)
    # forced chunking along the longest leading axis
    np.testing.assert_array_equal(fetch(d, min_bytes=0, chunks=16), x)


def test_fetch_more_chunks_than_rows(rng):
    x = rng.random((1, 3, 8, 3), np.float32)
    np.testing.assert_array_equal(fetch(jnp.asarray(x), min_bytes=0, chunks=64), x)


def test_fetch_numpy_passthrough(rng):
    x = rng.random((4, 4), np.float32)
    assert fetch(x) is x


def test_style_cache_lru_bound(monkeypatch, rng):
    import collaborative_distillation_tpu.wct.engine as eng_mod
    from collaborative_distillation_tpu.wct.engine import WCTEngine
    import jax
    from collaborative_distillation_tpu.models.specs import decoder_spec, encoder_spec
    from collaborative_distillation_tpu.models.vgg import init_params

    monkeypatch.setattr(eng_mod, "STYLE_CACHE_MAX", 3)
    key = jax.random.key(0)
    pyramid = {}
    for s in (1,):
        k1, k2, key = jax.random.split(key, 3)
        espec = encoder_spec("16x", s, aux=True)
        dspec = decoder_spec("16x", s)
        pyramid[s] = {"enc_spec": espec, "dec_spec": dspec,
                      "enc": init_params(espec, k1), "dec": init_params(dspec, k2)}
    eng = WCTEngine(mode="16x", pyramid=pyramid, stages=(1,))
    sty = jnp.asarray(rng.random((1, 32, 32, 3), np.float32))
    for i in range(6):
        eng._style_stats(1, sty, cache_key=f"s{i}")
    assert len(eng._style_cache) == 3
    assert [k[1] for k in eng._style_cache] == ["s3", "s4", "s5"]
    # re-touch oldest survivor -> becomes MRU, evicted last
    eng._style_stats(1, sty, cache_key="s3")
    eng._style_stats(1, sty, cache_key="s6")
    assert [k[1] for k in eng._style_cache] == ["s5", "s3", "s6"]


def test_push_roundtrip_and_small_path(rng):
    from collaborative_distillation_tpu.utils.transfer import push

    small = rng.random((8, 8, 3)).astype(np.float32)
    out = push(small)
    np.testing.assert_array_equal(np.asarray(out), small)
    big = (rng.random((64, 2048, 64)) * 255).astype(np.uint8)  # > 32 MB? no:
    # 64*2048*64 = 8 MB -> force the chunked path via min_bytes
    out2 = push(big, streams=3, min_bytes=1 << 20)
    np.testing.assert_array_equal(np.asarray(out2), big)
    # odd split along a short axis
    out3 = push(big[:5], streams=2, min_bytes=1 << 10)
    np.testing.assert_array_equal(np.asarray(out3), big[:5])
