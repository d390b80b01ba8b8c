"""Stylization server: HTTP endpoint over a warm WCT engine.

Production-shaped serving runtime around the compute path (the reference has
no serving story at all — batch CLI only):

    python -m collaborative_distillation_tpu.cli.serve --mode 16x --port 8700

    POST /stylize?alpha=0.8&style=<name>   body: JPEG/PNG content image
    POST /style/<name>                     body: JPEG/PNG style image (registers
                                           + precomputes per-stage statistics)
    GET  /healthz                          liveness + engine config
    GET  /styles                           registered style names
    GET  /metrics                          request counts + latency p50/p95

Responses are JPEG. Requests serialize through a single engine lock (one
accelerator). On the PIL/whole-image paths decode/encode happen outside the
lock; the streamed JPEG->JPEG fast path (engine.stylize_jpeg) runs its
banded entropy decode/encode inside the lock by design — those bands
overlap the locked device transfers themselves, which is where the time
goes. Per-style statistics are cached inside the engine, so steady-state
cost per request is one content cascade.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


def build_app(engine, log, *, max_styles: int = 256,
              warm_shapes: list[tuple[int, int]] | None = None):
    from collections import OrderedDict

    from PIL import Image

    # LRU-bounded registry: a long-lived server registering styles forever
    # must not grow host memory (raw style images) or device memory (the
    # engine's per-stage statistics cache, itself LRU'd) without bound.
    # Each registration gets a fresh GENERATION in its cache key: an
    # in-flight /stylize that read the previous image can only (re)cache
    # stats under the OLD key, never poison the new registration (warm-up is
    # async, so "invalidate then recompute" alone cannot prevent that race).
    styles: OrderedDict[str, tuple[np.ndarray, str]] = OrderedDict()
    gen_counter = iter(range(1 << 62))
    class _GaugedLock:
        """Engine lock with an observable queue: depth counts threads
        waiting for OR holding the device. /metrics reports the
        instantaneous and high-water values so a load test can see
        contention directly instead of inferring it from tail latency."""

        def __init__(self):
            self._lock = threading.Lock()
            self._meta = threading.Lock()
            self.depth = 0
            self.max_depth = 0

        def __enter__(self):
            with self._meta:
                self.depth += 1
                if self.depth > self.max_depth:
                    self.max_depth = self.depth
            self._lock.acquire()
            return self

        def __exit__(self, *exc):
            self._lock.release()
            with self._meta:
                self.depth -= 1
            return False

    lock = _GaugedLock()             # serializes device work (one accelerator)
    registry_lock = threading.Lock()  # guards the styles dict only

    def register(name: str, arr: np.ndarray) -> str:
        with registry_lock:
            keyed = f"{name}#{next(gen_counter)}"
            old = styles.get(name)
            if name in styles:
                styles.move_to_end(name)
            styles[name] = (arr, keyed)
            evicted_keys = [old[1]] if old is not None else []
            while len(styles) > max_styles:
                evicted, (_, ekey) = styles.popitem(last=False)
                evicted_keys.append(ekey)
                log(f"style registry full: evicted {evicted!r}")
        if hasattr(engine, "invalidate_style"):
            for ekey in evicted_keys:  # free cached stats (memory, not
                engine.invalidate_style(ekey)  # correctness — keys are dead)
        return keyed

    def warm(keyed: str, arr: np.ndarray) -> None:
        # background: the first warm-up includes an XLA compile (tens of
        # seconds on a remote TPU) — holding the engine lock from the
        # registration request would block every concurrent /stylize for
        # the duration. Requests arriving before the warm finishes simply
        # queue on the engine lock and compute the stats themselves.
        try:
            probe = np.zeros((32, 32, 3), np.uint8)
            with lock:
                engine.stylize(probe, arr, style_key=keyed)
            log(f"style {keyed!r} warm")
        except Exception as e:  # noqa: BLE001 — warm-up is best-effort
            log(f"style warm-up failed for {keyed!r}: {type(e).__name__}: {e}")

    def warm_shape(h: int, w: int) -> None:
        # pre-compile the cascade for a canonical request shape so the first
        # real request at that shape is not a ~60 s compile outlier; with the
        # persistent compilation cache enabled this also only ever costs a
        # full compile once per machine, not once per process
        try:
            content = np.zeros((h, w, 3), np.uint8)
            probe_style = np.zeros((64, 64, 3), np.uint8)
            with lock:
                engine.stylize(content, probe_style, style_key="__shape_warm__",
                               as_uint8=True)
            log(f"shape {h}x{w} warm")
        except Exception as e:  # noqa: BLE001 — warm-up is best-effort
            log(f"shape warm-up failed for {h}x{w}: {type(e).__name__}: {e}")

    if warm_shapes:
        def _warm_all():
            for h, w in warm_shapes:
                warm_shape(h, w)
        threading.Thread(target=_warm_all, daemon=True).start()

    # observability: rolling stylize latencies + counters (the reference's
    # only serving-adjacent metric is the CLI's per-pair seconds print,
    # WCT.py:118; a long-lived server needs to answer "is it healthy and
    # how slow" without grepping logs)
    from collections import deque
    metrics_lock = threading.Lock()
    metrics = {"stylize_requests": 0, "stylize_errors": 0,
               "latencies": deque(maxlen=256)}

    def record_stylize(dt_s: float, ok: bool) -> None:
        with metrics_lock:
            metrics["stylize_requests"] += 1
            if ok:
                metrics["latencies"].append(dt_s)
            else:
                metrics["stylize_errors"] += 1

    def metrics_snapshot() -> dict:
        with metrics_lock:
            lats = sorted(metrics["latencies"])
            n_req = metrics["stylize_requests"]
            n_err = metrics["stylize_errors"]
        with registry_lock:
            n_styles = len(styles)
        out = {"stylize_requests": n_req, "stylize_errors": n_err,
               "styles": n_styles, "uptime_s": round(time.time() - t_start, 1)}
        if lats:
            out["latency_s"] = {
                "p50": round(lats[len(lats) // 2], 3),
                "p95": round(lats[min(len(lats) - 1, int(len(lats) * 0.95))], 3),
                "max": round(lats[-1], 3)}
        out["engine_queue"] = {"depth": lock.depth, "max": lock.max_depth}
        return out

    t_start = time.time()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through our logger
            log(f"{self.address_string()} {fmt % args}")

        def _send(self, code: int, body: bytes, ctype: str = "application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode())

        def _read_body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                self._json(200, {"ok": True, "mode": engine.mode,
                                 "method": engine.method,
                                 "stages": list(engine.stages)})
            elif path == "/styles":
                with registry_lock:
                    names = sorted(styles)
                self._json(200, {"styles": names})
            elif path == "/metrics":
                self._json(200, metrics_snapshot())
            else:
                self._json(404, {"error": f"unknown path {path}"})

        def do_POST(self):
            url = urlparse(self.path)
            try:
                if url.path.startswith("/style/"):
                    name = url.path[len("/style/"):]
                    if not name:
                        return self._json(400, {"error": "style name required"})
                    img = Image.open(io.BytesIO(self._read_body())).convert("RGB")
                    arr = np.asarray(img, np.uint8)
                    keyed = register(name, arr)
                    threading.Thread(target=warm, args=(keyed, arr),
                                     daemon=True).start()
                    return self._json(200, {"registered": name,
                                            "size": list(arr.shape[:2]),
                                            "warming": True})
                if url.path == "/stylize":
                    t0 = time.time()
                    self._timing_stylize = t0

                    def finish(body: bytes):
                        # clear before recording: connection keep-alive reuses
                        # this handler instance for later requests
                        self._timing_stylize = None
                        record_stylize(time.time() - t0, ok=True)
                        return self._send(200, body, "image/jpeg")

                    q = parse_qs(url.query)
                    alpha = float(q.get("alpha", ["1.0"])[0])
                    name = q.get("style", [None])[0]
                    import re as _re
                    if (name and _re.search(r"[+,\s]", name)
                            and hasattr(engine, "blend_styles")):
                        # multi-style blend: style=a:0.6,b:0.4 (weights
                        # optional, default equal; '+' also accepted — URL
                        # decoding turns it into a space). Per-style
                        # statistics are already warm in the engine cache;
                        # the blend itself is a few C x C adds under the
                        # device lock.
                        parts = [p.partition(":") for p in
                                 _re.split(r"[+,\s]+", name) if p]
                        with registry_lock:
                            entries = [styles.get(nm) for nm, _, _ in parts]
                            known = sorted(styles)
                        missing = [p[0] for p, e in zip(parts, entries)
                                   if e is None]
                        if missing:
                            return self._json(400, {
                                "error": f"unknown styles {missing} in blend "
                                         f"{name!r}", "styles": known})
                        try:
                            ws = [float(wtxt) if wtxt else 1.0
                                  for _, _, wtxt in parts]
                        except ValueError:
                            return self._json(400, {
                                "error": f"bad blend weights in {name!r} "
                                         f"(want style:weight+style:weight)"})
                        with lock:
                            keyed, style_arr = engine.blend_styles(
                                [e[0] for e in entries], ws,
                                style_keys=[e[1] for e in entries])
                    else:
                        with registry_lock:
                            entry = styles.get(name) if name else None
                            if entry is not None:
                                styles.move_to_end(name)
                            known = sorted(styles)
                        style_arr, keyed = (entry if entry is not None
                                            else (None, None))
                    if style_arr is None:
                        return self._json(400, {
                            "error": f"unknown style {name!r}; register via POST /style/<name>",
                            "styles": known})
                    data = self._read_body()
                    # JPEG-native fast path: ordinary photo JPEGs are YCbCr
                    # 4:2:0 internally — read the planes straight out, let
                    # the device do all pixel math, entropy-encode the
                    # stylized planes back. Zero host color conversion.
                    # Gated off under --transport rgb (the operator asked
                    # for bit-exact RGB transport); decode_jpeg_yuv420
                    # enforces the decompression-bomb pixel cap that PIL
                    # would apply on the fallback path.
                    from ..data.native_codec import (
                        decode_jpeg_yuv420,
                        encode_jpeg,
                        encode_jpeg_yuv420,
                        jpeg_dims,
                    )
                    planes_ok = (hasattr(engine, "stylize_planes")
                                 and getattr(engine, "transport", "rgb") != "rgb")
                    if planes_ok and getattr(engine, "transport", "") == "auto":
                        # honor the engine's documented 'auto' cutoff: below
                        # _YUV_AUTO_PIX the link savings don't repay per-shape
                        # compiles of the device YUV converters — take the
                        # plain PIL+stylize path like direct callers do
                        from ..wct.engine import _YUV_AUTO_PIX
                        dims = jpeg_dims(data)
                        if dims is not None and dims[0] * dims[1] < _YUV_AUTO_PIX:
                            planes_ok = False
                    if planes_ok:
                        # fully streamed JPEG->JPEG first: banded entropy
                        # decode under the upload, banded entropy encode
                        # under the readback, zero host pixel math. Skip
                        # (and don't take the engine lock) when this engine
                        # can never stream — it would open a decoder just
                        # to throw it away on every request.
                        if (hasattr(engine, "stylize_jpeg")
                                and getattr(engine, "supports_streamed_jpeg",
                                            lambda: True)()):
                            with lock:
                                body = engine.stylize_jpeg(
                                    data, style_arr, alpha=alpha,
                                    style_key=keyed, quality=95)
                            if body is not None:
                                return finish(body)
                        planes = decode_jpeg_yuv420(data)
                    else:
                        planes = None
                    if planes is not None:
                        with lock:
                            # big requests: streamed tail + incremental
                            # native encode (each band entropy-encodes while
                            # the next one fetches); None -> assembled path
                            body = (engine.stylize_planes_jpeg(
                                        *planes, style_arr, alpha=alpha,
                                        style_key=keyed, quality=95)
                                    if hasattr(engine, "stylize_planes_jpeg")
                                    else None)
                            if body is not None:
                                yo = co = None
                            else:
                                yo, co = engine.stylize_planes(
                                    *planes, style_arr, alpha=alpha,
                                    style_key=keyed)
                        if body is None:
                            body = encode_jpeg_yuv420(yo, co, quality=95)
                        if body is None:
                            # native encode failed: the stylized planes are
                            # already in hand — finish on the host instead
                            # of re-running the cascade
                            from ..utils.colorspace import yuv420_to_rgb_host
                            out = yuv420_to_rgb_host(yo[None], co[None])[0]
                            body = encode_jpeg(out, quality=95)
                            if body is None:
                                buf = io.BytesIO()
                                Image.fromarray(out).save(buf, format="JPEG",
                                                          quality=95)
                                body = buf.getvalue()
                        return finish(body)
                    # fallback: PNG/other-sampling inputs, rgb transport, or
                    # no native codec
                    content = np.asarray(
                        Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)
                    with lock:
                        out = engine.stylize(content, style_arr, alpha=alpha,
                                             style_key=keyed, as_uint8=True)
                    # native libjpeg encode (GIL released -> concurrent
                    # encodes across server threads); PIL fallback
                    body = encode_jpeg(out, quality=95)
                    if body is None:
                        buf = io.BytesIO()
                        Image.fromarray(out).save(buf, format="JPEG", quality=95)
                        body = buf.getvalue()
                    return finish(body)
                return self._json(404, {"error": f"unknown path {url.path}"})
            except Exception as e:  # noqa: BLE001 — turn into a 500, keep serving
                t0 = getattr(self, "_timing_stylize", None)
                if t0 is not None:
                    record_stylize(time.time() - t0, ok=False)
                    self._timing_stylize = None
                log(f"request failed: {type(e).__name__}: {e}")
                return self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", default="16x",
                    choices=["original", "16x", "16x_kd2sd", "16x_base"])
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8700)
    ap.add_argument("--method", default="eigh", choices=["eigh", "newton"])
    ap.add_argument("--slab_rows", type=int, default=0,
                    help="enable slab streaming for large inputs")
    ap.add_argument("--transport", default="auto",
                    choices=["auto", "rgb", "yuv420"],
                    help="host<->device transport for images (yuv420 halves "
                         "link bytes; both endpoints are JPEGs)")
    ap.add_argument("--weights_root", default="")
    ap.add_argument("--warm_shapes", default="",
                    help="comma-separated HxW request shapes to pre-compile at "
                         "startup (e.g. '1080x1920,2160x3840'); the compiles "
                         "land in the persistent cache, so later processes "
                         "warm from disk in seconds")
    args = ap.parse_args(argv)
    warm_shapes = []
    for tok in filter(None, (t.strip() for t in args.warm_shapes.split(","))):
        try:
            h, w = tok.lower().split("x")
            warm_shapes.append((int(h), int(w)))
        except ValueError:
            ap.error(f"--warm_shapes: {tok!r} is not of the form HxW "
                     f"(e.g. 1080x1920)")

    from ..utils.logging import LogPrinter
    from ..wct.engine import WCTEngine

    log = LogPrinter(None, "serve", to_screen=True)
    engine = WCTEngine(mode=args.mode, weights_root=args.weights_root or None,
                       method=args.method, slab_rows=args.slab_rows,
                       transport=args.transport)
    server = ThreadingHTTPServer(
        (args.host, args.port),
        build_app(engine, log, warm_shapes=warm_shapes))
    log(f"serving mode={args.mode} on http://{args.host}:{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        log("shutting down")
    return 0


if __name__ == "__main__":
    sys.exit(main())
