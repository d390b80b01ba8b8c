"""Benchmark: UHD stylization throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": MPix/s, "unit": "MPix/s", "vs_baseline": ...}

Baseline: the driver-set target for the reference's headline capability —
10240x4096 (41.9 MPix) end-to-end 5-level WCT stylization in < 10 s on one
v5e chip (BASELINE.md; the reference's claim is that this *fits at all* on a
12 GB GPU, with CPU float64 SVD in the loop). 41.94 MPix / 10 s = 4.19 MPix/s
== vs_baseline 1.0.

Secondary numbers (2K throughput, per-level WCT cov+eig latency) go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

UHD_W, UHD_H = 10240, 4096
BASELINE_MPIX_S = (UHD_W * UHD_H / 1e6) / 10.0  # the <10 s target


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_pair(cw, ch, sw=2048, sh=2048):
    from PIL import Image
    Image.MAX_IMAGE_PIXELS = None
    croot = "/root/reference/PytorchWCT/content/UHD_content/green_park-wallpaper-3840x2160.jpg"
    sroot = "/root/reference/PytorchWCT/style/in1.jpg"
    if os.path.exists(croot):
        c = np.asarray(Image.open(croot).convert("RGB").resize((cw, ch)), np.float32) / 255.0
        s = np.asarray(Image.open(sroot).convert("RGB").resize((sw, sh)), np.float32) / 255.0
    else:
        rng = np.random.default_rng(0)
        c = rng.random((ch, cw, 3), dtype=np.float32)
        s = rng.random((sh, sw, 3), dtype=np.float32)
    return c, s


def time_stylize(eng, c, s, runs=3):
    t0 = time.time()
    eng.stylize(c, s, style_key="bench")
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        eng.stylize(c, s, style_key="bench")
        best = min(best, time.time() - t0)
    mpix = c.shape[0] * c.shape[1] / 1e6
    return compile_s, best, mpix / best


def wct_latency(eng):
    """Per-level WCT cov+eig (+coloring) latency at UHD stage-1 scale."""
    import jax
    import jax.numpy as jnp
    from collaborative_distillation_tpu.ops.wct_transform import wct_transform, feature_stats

    out = {}
    for c_ch, hw in [(24, (2560, 1024)), (128, (640, 256))]:  # 16x stage-1 / stage-5-ish
        x = jnp.asarray(np.random.default_rng(0).random((1, *hw, c_ch), np.float32))
        s_mean, s_cov = feature_stats(x)
        f = jax.jit(lambda a, m, cv: wct_transform(a, m, cv, 1.0))
        f(x, s_mean, s_cov).block_until_ready()
        t0 = time.time()
        for _ in range(5):
            r = f(x, s_mean, s_cov)
        r.block_until_ready()
        out[f"C={c_ch}"] = (time.time() - t0) / 5 * 1000
    return out


def main():
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    mode = "16x"
    eng = WCTEngine(mode=mode)

    # warm the per-stage programs on a small shape first (cheap compiles are
    # shared across shapes only for the style side; content-side programs are
    # per-shape, so go straight to the target shapes after).
    results = {}

    c2k, s2k = load_pair(2048, 1024)
    comp, best, mpix_s = time_stylize(eng, c2k, s2k)
    results["2k"] = {"compile_s": round(comp, 1), "run_s": round(best, 3),
                     "mpix_per_s": round(mpix_s, 2)}
    log(f"2K (2048x1024): compile {comp:.1f}s, run {best:.3f}s, {mpix_s:.2f} MPix/s")

    try:
        cu, su = load_pair(UHD_W, UHD_H)
        comp, best, mpix_s = time_stylize(eng, cu, su, runs=2)
        results["uhd"] = {"compile_s": round(comp, 1), "run_s": round(best, 3),
                          "mpix_per_s": round(mpix_s, 2)}
        log(f"UHD (10240x4096): compile {comp:.1f}s, run {best:.3f}s, {mpix_s:.2f} MPix/s")
        headline = results["uhd"]["mpix_per_s"]
        metric = "UHD 10240x4096 5-level WCT stylization throughput (mode 16x, one v5e chip)"
    except Exception as e:  # OOM etc: report 2K and say so
        log(f"UHD failed: {type(e).__name__}: {e}")
        headline = results["2k"]["mpix_per_s"]
        metric = "2K 2048x1024 5-level WCT stylization throughput (mode 16x; UHD failed)"

    try:
        lat = wct_latency(eng)
        results["wct_latency_ms"] = {k: round(v, 2) for k, v in lat.items()}
        log(f"WCT transform latency: {results['wct_latency_ms']}")
    except Exception as e:
        log(f"wct latency bench failed: {e}")

    print(json.dumps({
        "metric": metric,
        "value": headline,
        "unit": "MPix/s",
        "vs_baseline": round(headline / BASELINE_MPIX_S, 3),
        "detail": results,
    }))


if __name__ == "__main__":
    main()
