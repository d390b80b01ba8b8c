"""Concurrency load test for cli/serve.py (VERDICT r4 item 8).

Drives N concurrent clients, each issuing M sequential 2K streamed-JPEG
/stylize requests against a warm server, and reports per-request latency
percentiles, aggregate throughput, and the server's own /metrics view
(including the engine-lock queue gauge added for this test). The reference
has no serving story at all (batch CLI only, WCT.py:118) — this measures
the queueing behavior its single-accelerator lock design produces.

Usage (server must already be running and warm):
    python -m collaborative_distillation_tpu.cli.serve --mode 16x --port 8700 &
    python tools/serve_bench.py --port 8700 --clients 4 --requests 6
"""

from __future__ import annotations

import argparse
import http.client
import io
import json
import statistics
import sys
import threading
import time

from PIL import Image

CONTENT = ("/root/reference/PytorchWCT/content/UHD_content/"
           "green_park-wallpaper-3840x2160.jpg")
STYLE = "/root/reference/PytorchWCT/style/in1.jpg"


def _jpeg_content(w: int, h: int) -> bytes:
    img = Image.open(CONTENT).convert("RGB").resize((w, h), Image.LANCZOS)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=92)
    return buf.getvalue()


def _post(port: int, path: str, body: bytes, timeout: float = 300.0) -> bytes:
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    try:
        conn.request("POST", path, body=body,
                     headers={"Content-Type": "application/octet-stream"})
        r = conn.getresponse()
        data = r.read()
        if r.status != 200:
            raise RuntimeError(f"{path} -> {r.status}: {data[:200]!r}")
        return data
    finally:
        conn.close()


def _get(port: int, path: str) -> dict:
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    try:
        conn.request("GET", path)
        return json.loads(conn.getresponse().read())
    finally:
        conn.close()


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--port", type=int, default=8700)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--requests", type=int, default=6,
                    help="sequential requests per client")
    ap.add_argument("--alpha", type=float, default=0.8)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--height", type=int, default=1088)
    args = ap.parse_args()

    body = _jpeg_content(args.width, args.height)
    print(f"content: {args.width}x{args.height} JPEG, "
          f"{len(body) / 1e6:.2f} MB", flush=True)

    with open(STYLE, "rb") as f:
        _post(args.port, "/style/bench", f.read())
    # warm: style-stat compute + content-shape compile out of the timed region
    t0 = time.time()
    _post(args.port, f"/stylize?style=bench&alpha={args.alpha}", body)
    print(f"warm-up request: {time.time() - t0:.2f} s", flush=True)

    lats: list[float] = []
    errs: list[str] = []
    lat_lock = threading.Lock()
    depth_samples: list[int] = []
    stop = threading.Event()

    def client(i: int) -> None:
        for _ in range(args.requests):
            t = time.time()
            try:
                _post(args.port, f"/stylize?style=bench&alpha={args.alpha}",
                      body)
                dt = time.time() - t
                with lat_lock:
                    lats.append(dt)
            except Exception as e:  # noqa: BLE001 — collect, report, continue
                with lat_lock:
                    errs.append(f"client{i}: {type(e).__name__}: {e}")

    def sampler() -> None:
        while not stop.is_set():
            try:
                m = _get(args.port, "/metrics")
                depth_samples.append(m.get("engine_queue", {}).get("depth", 0))
            except Exception:
                pass
            stop.wait(0.25)

    threading.Thread(target=sampler, daemon=True).start()
    t0 = time.time()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    stop.set()

    m = _get(args.port, "/metrics")
    lats.sort()
    n = len(lats)
    out = {
        "clients": args.clients,
        "requests_ok": n,
        "errors": len(errs),
        "wall_s": round(wall, 2),
        "throughput_rps": round(n / wall, 3) if wall else None,
        "client_latency_s": {
            "p50": round(lats[n // 2], 3) if n else None,
            "p95": round(lats[min(n - 1, int(n * 0.95))], 3) if n else None,
            "mean": round(statistics.fmean(lats), 3) if n else None,
            "min": round(lats[0], 3) if n else None,
            "max": round(lats[-1], 3) if n else None,
        },
        "queue_depth": {
            "sampled_max": max(depth_samples, default=0),
            "sampled_mean": round(statistics.fmean(depth_samples), 2)
            if depth_samples else None,
            "server_high_water": m.get("engine_queue", {}).get("max"),
        },
        "server_metrics": m,
    }
    print(json.dumps(out, indent=2))
    for e in errs[:10]:
        print("ERR:", e, file=sys.stderr)
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
