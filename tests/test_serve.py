"""Serving endpoint: register a style, stylize a content image over HTTP."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

import jax

from collaborative_distillation_tpu.cli.serve import build_app
from collaborative_distillation_tpu.models import decoder_spec, encoder_spec, init_params


def _toy_engine():
    """Engine over random stage-(1,) params — fast enough for HTTP tests."""
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    espec = encoder_spec("16x", 1, aux=True)
    dspec = decoder_spec("16x", 1)
    pyramid = {1: {"enc_spec": espec, "dec_spec": dspec,
                   "enc": init_params(espec, jax.random.key(0)),
                   "dec": init_params(dspec, jax.random.key(1))}}
    return WCTEngine(mode="toy", stages=(1,), pyramid=pyramid)


@pytest.fixture(scope="module")
def server():
    from http.server import ThreadingHTTPServer

    handler = build_app(_toy_engine(), lambda m: None)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _jpeg_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read(), resp.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def test_health_and_flow(server, rng):
    with urllib.request.urlopen(server + "/healthz") as resp:
        health = json.loads(resp.read())
    assert health["ok"] and health["stages"] == [1]

    style = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    code, body, _ = _post(server + "/style/vangogh", _jpeg_bytes(style))
    assert code == 200 and json.loads(body)["registered"] == "vangogh"

    content = (rng.random((48, 80, 3)) * 255).astype(np.uint8)
    code, body, ctype = _post(server + "/stylize?style=vangogh&alpha=0.7",
                              _jpeg_bytes(content))
    assert code == 200 and ctype == "image/jpeg"
    out = np.asarray(Image.open(io.BytesIO(body)))
    assert out.shape == content.shape


def test_unknown_style_is_400(server, rng):
    content = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    code, body, _ = _post(server + "/stylize?style=nope", _jpeg_bytes(content))
    assert code == 400
    assert "unknown style" in json.loads(body)["error"]


def test_garbage_body_is_500_not_crash(server):
    code, body, _ = _post(server + "/stylize?style=vangogh", b"not an image")
    assert code == 500
    # server still alive
    with urllib.request.urlopen(server + "/healthz") as resp:
        assert json.loads(resp.read())["ok"]


@pytest.fixture()
def tiny_registry_server():
    from http.server import ThreadingHTTPServer

    handler = build_app(_toy_engine(), lambda m: None, max_styles=2)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_register_returns_immediately_with_warming_flag(server, rng):
    sty = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
    code, body, _ = _post(server + "/style/asyncwarm", _jpeg_bytes(sty))
    assert code == 200
    reply = json.loads(body)
    assert reply["registered"] == "asyncwarm" and reply["warming"] is True
    # a stylize racing the warm-up must still succeed (it queues on the
    # engine lock and computes the statistics itself if needed)
    content = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    code, body, ctype = _post(server + "/stylize?style=asyncwarm", _jpeg_bytes(content))
    assert code == 200 and ctype == "image/jpeg"


def test_style_registry_lru_eviction(tiny_registry_server, rng):
    url = tiny_registry_server
    for name in ("a", "b", "c"):  # capacity 2 -> 'a' evicted
        sty = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        code, _, _ = _post(url + f"/style/{name}", _jpeg_bytes(sty))
        assert code == 200
    with urllib.request.urlopen(url + "/styles") as resp:
        names = json.loads(resp.read())["styles"]
    assert names == ["b", "c"]
    content = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    code, body, _ = _post(url + "/stylize?style=a", _jpeg_bytes(content))
    assert code == 400 and b"unknown style" in body


def test_concurrent_reregistration_cannot_poison_stats(server, rng):
    """Hammer re-registrations of one style name with different images while
    stylize requests race them. The generation-keyed registry must (a) never
    error, (b) leave the server consistent: after settling, identical
    requests return identical bytes, equal to a fresh registration of the
    same final image (a stale-stats poisoning of the final generation's
    cache would break that equality)."""
    from concurrent.futures import ThreadPoolExecutor

    styles = [(rng.random((32, 32, 3)) * 255).astype(np.uint8)
              for _ in range(6)]
    content = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    cbytes = _jpeg_bytes(content)

    def register(i):
        code, _, _ = _post(server + "/style/stress", _jpeg_bytes(styles[i % 6]))
        return code

    def stylize(_):
        code, _, _ = _post(server + "/stylize?style=stress", cbytes)
        return code

    with ThreadPoolExecutor(6) as ex:
        codes = list(ex.map(register, range(12))) + list(
            ex.map(stylize, range(12)))
    assert all(c == 200 for c in codes), codes

    # settle on a known final image
    final = styles[3]
    assert _post(server + "/style/stress", _jpeg_bytes(final))[0] == 200
    a = _post(server + "/stylize?style=stress&alpha=0.9", cbytes)
    b = _post(server + "/stylize?style=stress&alpha=0.9", cbytes)
    assert a[0] == b[0] == 200 and a[1] == b[1]
    # a brand-new generation of the same image must agree (fresh stats)
    assert _post(server + "/style/stress", _jpeg_bytes(final))[0] == 200
    c = _post(server + "/stylize?style=stress&alpha=0.9", cbytes)
    assert c[0] == 200 and c[1] == a[1]
    with urllib.request.urlopen(server + "/healthz") as resp:
        assert json.loads(resp.read())["ok"]


def test_streamed_jpeg_path_over_http(rng):
    """A fused-slab engine with streaming forced on serves baseline 4:2:0
    JPEGs through engine.stylize_jpeg (banded decode/encode); the response
    must be a valid JPEG of the right size and match the non-streamed
    server's output bytes."""
    from http.server import ThreadingHTTPServer
    nc = pytest.importorskip(
        "collaborative_distillation_tpu.data.native_codec")
    if not nc.available():
        pytest.skip("native codec unavailable")
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    def build(stream_min):
        espec = encoder_spec("16x", 1, aux=True)
        dspec = decoder_spec("16x", 1)
        pyramid = {1: {"enc_spec": espec, "dec_spec": dspec,
                       "enc": init_params(espec, jax.random.key(3)),
                       "dec": init_params(dspec, jax.random.key(4))}}
        eng = WCTEngine(mode="toy", stages=(1,), pyramid=pyramid,
                        slab_rows=16, fused=True, stream_min_pix=stream_min,
                        packed=False)
        srv = ThreadingHTTPServer(("127.0.0.1", 0),
                                  build_app(eng, lambda m: None))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, f"http://127.0.0.1:{srv.server_address[1]}"

    content = (rng.random((64, 48, 3)) * 255).astype(np.uint8)
    y, cbcr = nc.rgb_to_yuv420(content)
    jpg = nc.encode_jpeg_yuv420(y, cbcr, quality=95)
    style = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    bodies = []
    for stream_min in (0, 1 << 60):
        srv, url = build(stream_min)
        try:
            assert _post(url + "/style/s", _jpeg_bytes(style))[0] == 200
            code, body, ctype = _post(url + "/stylize?style=s&alpha=0.8", jpg)
            assert code == 200 and ctype == "image/jpeg"
            out = np.asarray(Image.open(io.BytesIO(body)))
            assert out.shape == content.shape
            bodies.append(body)
        finally:
            srv.shutdown()
    assert bodies[0] == bodies[1]  # streamed == whole-path bytes


def test_warm_shapes_precompiles_at_startup():
    """build_app(warm_shapes=...) drives the engine at the given shape from a
    background thread so the first real request at that shape is warm."""
    import time

    logs = []
    build_app(_toy_engine(), logs.append, warm_shapes=[(32, 48)])
    deadline = time.time() + 60
    while time.time() < deadline:
        if any("shape 32x48 warm" in m for m in logs):
            break
        time.sleep(0.1)
    assert any("shape 32x48 warm" in m for m in logs), logs


def test_auto_transport_gate_small_jpeg_skips_planes_path(rng):
    """Under transport='auto', a sub-cutoff JPEG must take the plain
    PIL+stylize path (no per-shape YUV converter compiles), while images at
    or above _YUV_AUTO_PIX keep the JPEG-native planes fast path."""
    import threading as _threading
    from http.server import ThreadingHTTPServer

    from collaborative_distillation_tpu.data import native_codec
    from collaborative_distillation_tpu.wct import engine as engine_mod

    eng = _toy_engine()
    assert eng.transport == "auto"
    calls = []
    orig = native_codec.decode_jpeg_yuv420

    def spy(data):
        calls.append(len(data))
        return orig(data)

    handler = build_app(eng, lambda m: None)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = _threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        native_codec.decode_jpeg_yuv420 = spy
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        _post(url + "/style/g", _jpeg_bytes(img))
        code, _, ctype = _post(url + "/stylize?style=g", _jpeg_bytes(img))
        assert code == 200 and ctype == "image/jpeg"
        assert calls == []  # 4096 px < 2 MPix: planes path skipped
        # drop the cutoff below the image size: planes path used again
        old_pix = engine_mod._YUV_AUTO_PIX
        engine_mod._YUV_AUTO_PIX = 1024
        try:
            code, _, _ = _post(url + "/stylize?style=g", _jpeg_bytes(img))
            assert code == 200
            assert len(calls) >= 1
        finally:
            engine_mod._YUV_AUTO_PIX = old_pix
    finally:
        native_codec.decode_jpeg_yuv420 = orig
        srv.shutdown()


def test_metrics_endpoint(server, rng):
    """/metrics reports stylize counts and latency percentiles."""
    img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    _post(server + "/style/m", _jpeg_bytes(img))
    code, _, _ = _post(server + "/stylize?style=m", _jpeg_bytes(img))
    assert code == 200
    with urllib.request.urlopen(server + "/metrics") as resp:
        m = json.loads(resp.read())
    assert m["stylize_requests"] >= 1
    assert m["styles"] >= 1
    assert "latency_s" in m and m["latency_s"]["p50"] > 0
    # a failing request (garbage body) counts as an error
    _post(server + "/stylize?style=m", b"not an image")
    with urllib.request.urlopen(server + "/metrics") as resp:
        m2 = json.loads(resp.read())
    assert m2["stylize_errors"] >= 1
    # engine-lock queue gauge: idle between requests, but the successful
    # stylize above must have driven the high-water mark to >= 1
    assert m2["engine_queue"]["depth"] == 0
    assert m2["engine_queue"]["max"] >= 1


def test_style_blend_over_http(server, rng):
    """style=a:0.6+b:0.4 blends registered styles; unknown names 400."""
    a = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    b = 255 - a
    _post(server + "/style/ba", _jpeg_bytes(a))
    _post(server + "/style/bb", _jpeg_bytes(b))
    img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    code, body, ctype = _post(server + "/stylize?style=ba:0.6+bb:0.4",
                              _jpeg_bytes(img))
    assert code == 200 and ctype == "image/jpeg"
    out = np.asarray(Image.open(io.BytesIO(body)))
    assert out.shape == (40, 40, 3)
    code, body, _ = _post(server + "/stylize?style=ba:0.6+nope:0.4",
                          _jpeg_bytes(img))
    assert code == 400 and b"nope" in body
    code, body, _ = _post(server + "/stylize?style=ba:x+bb:0.4",
                          _jpeg_bytes(img))
    assert code == 400 and b"weight" in body
