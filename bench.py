"""Benchmark: UHD stylization throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": MPix/s, "unit": "MPix/s", "vs_baseline": ...}

Baseline: the driver-set target for the reference's headline capability —
10240x4096 (41.9 MPix) end-to-end 5-level WCT stylization in < 10 s on one
v5e chip (BASELINE.md; the reference's claim is that this *fits at all* on a
12 GB GPU, with CPU float64 SVD in the loop). 41.94 MPix / 10 s = 4.19 MPix/s
== vs_baseline 1.0.

The headline value is the on-device cascade throughput (image resident on the
chip, full 5-level pyramid via bounded-memory slab streaming). End-to-end
numbers including host<->device transfer over this container's axon relay are
reported in "detail" — the relay is a development tunnel (~20 MB/s, high
variance), not production PCIe, so uint8 conversion happens on-device to
minimize its impact.

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
        c = np.asarray(Image.open(croot).convert("RGB").resize((cw, ch)), np.uint8)
        s = np.asarray(Image.open(sroot).convert("RGB").resize((sw, sh)), np.uint8)
    else:
        rng = np.random.default_rng(0)
        c = rng.integers(0, 255, (ch, cw, 3), dtype=np.uint8)
        s = rng.integers(0, 255, (sh, sw, 3), dtype=np.uint8)
    return c, s


def wct_latency():
    """Per-level WCT cov+eig (+coloring) latency at UHD feature scales.

    Relay-immune methodology (the r01->r02 "2x regression" postmortem): the
    old loop issued 5 separate dispatches, each paying a congestion-dependent
    RPC to the axon backend — the number tracked the relay, not the chip
    (measured 7-17 ms for a ~1 ms transform). Now the transform runs inside a
    single jitted lax.fori_loop (iterations serialized by the data
    dependency), and the per-iteration time is the difference between a
    22-iteration and a 2-iteration program — one dispatch + one readback
    each, so their shared overhead cancels exactly.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from collaborative_distillation_tpu.ops.wct_transform import wct_transform, feature_stats

    out = {}
    for c_ch, hw in [(24, (2560, 1024)), (128, (640, 256))]:  # 16x stage-1 / stage-5-ish
        x = jnp.asarray(np.random.default_rng(0).random((1, *hw, c_ch), np.float32))
        s_mean, s_cov = feature_stats(x)

        def mk(n):
            return jax.jit(lambda a, m, cv: lax.fori_loop(
                0, n, lambda i, v: wct_transform(v, m, cv, 1.0), a))

        f2, f22 = mk(2), mk(22)
        # warm both programs (block_until_ready lies on this backend: force
        # completion with a scalar readback)
        float(jnp.sum(f2(x, s_mean, s_cov)[0, 0, 0]))
        float(jnp.sum(f22(x, s_mean, s_cov)[0, 0, 0]))

        def best(fn):
            b = float("inf")
            for _ in range(3):
                t0 = time.time()
                r = fn(x, s_mean, s_cov)
                float(jnp.sum(r[0, 0, 0]))
                b = min(b, time.time() - t0)
            return b

        out[f"C={c_ch}"] = (best(f22) - best(f2)) / 20 * 1000
    return out


# partial results survive a watchdog/exception so the JSON line still
# carries whatever was measured before the relay collapsed
_RESULTS: dict = {}


def _main_guarded():
    # watchdog: a fully collapsed relay (observed: 24 MB not moving in
    # 240 s) can hang a transfer indefinitely — better to emit partial
    # numbers than no JSON at all. SIGALRM interrupts the pool waits the
    # chunked transfers block on (not a raw device call, but most of the
    # long waits go through the pools).
    import signal

    def _watchdog(_sig, _frm):
        raise TimeoutError("bench watchdog expired (relay collapsed?)")

    try:
        signal.signal(signal.SIGALRM, _watchdog)
        signal.alarm(int(os.environ.get("CD_TPU_BENCH_TIMEOUT", "2100")))
    except (ValueError, OSError):  # non-main thread / platform quirk
        pass
    try:
        rc = main()
        signal.alarm(0)
        return rc
    except Exception as e:  # noqa: BLE001 — always emit the JSON line
        try:  # disarm first: an alarm firing mid-handler would lose the JSON
            signal.alarm(0)
        except (ValueError, OSError):
            pass
        log(f"bench failed: {type(e).__name__}: {e}")
        headline = _RESULTS.get("uhd_device_mpix_s", 0.0)
        print(json.dumps({
            "metric": "UHD 10240x4096 5-level WCT stylization"
                      + (" (bench PARTIAL)" if _RESULTS else " (bench failed)"),
            "value": headline,
            "unit": "MPix/s",
            "vs_baseline": round(headline / BASELINE_MPIX_S, 3),
            "detail": {**_RESULTS,
                       "error": f"{type(e).__name__}: {str(e)[:500]}"},
        }))
        return 1


def main():
    import jax
    import jax.numpy as jnp
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    results = _RESULTS
    mpix = UHD_W * UHD_H / 1e6
    # slab_rows=4096: at UHD the whole 4096-row image is ONE slab (~10 GiB
    # peak, fits 16 GB HBM) — measured A/B vs 2048: f32 1.641->1.472 s,
    # bf16 1.515->1.391 s, and the single-slab program also compiles ~2x
    # faster. Two-slab streaming remains the fallback for taller images
    # (the engine re-picks per image height).
    eng = WCTEngine(mode="16x", slab_rows=4096, packed=True, fused=True)

    # ============ PHASE 1: on-device metrics (relay-light) ============
    # Device-SYNTHESIZED pixels: the cascade's cost is shape-dependent, not
    # pixel-dependent (same convs, same C x C eigh), so uniform noise times
    # identically to a photograph. Only the ~2 MB of 16x weights + scalar
    # readbacks cross the link in this phase — the headline number survives
    # relay congestion collapses (observed: 0.02 MB/s windows lasting hours
    # that would otherwise zero the whole bench).
    kc, ks2 = jax.random.split(jax.random.key(0))
    cd = jax.random.uniform(kc, (1, UHD_H, UHD_W, 3), jnp.float32)
    sdev = jax.random.uniform(ks2, (1, 2048, 2048, 3), jnp.float32)

    def force(x):
        # this backend's block_until_ready does not actually block; force
        # completion with a strided readback instead. The sampling overhead
        # (a 43x106 gather + one scalar d2h + sum dispatch) is INCLUDED in
        # the measured on-device time — ~5-10 ms of the ~2 s, i.e. the
        # reported MPix/s is conservative by <0.5%.
        return float(jnp.sum(x[0, ::97, ::97, 0]))

    # public device-resident API: same dispatch as stylize() (fused-slab
    # selection, style-stat caching, degradation ladder) with no host
    # transfer on either leg — the bench measures what a user's pipeline
    # gets, not a private program handle (r3 verdict item 2)
    t0 = time.time()
    force(eng.stylize_device(cd, sdev, 1.0, style_key="bench-dev"))
    log(f"device-cascade warm-up (compile): {time.time() - t0:.1f}s")
    best_dev = float("inf")
    for _ in range(3):
        t0 = time.time()
        force(eng.stylize_device(cd, sdev, 1.0, style_key="bench-dev"))
        best_dev = min(best_dev, time.time() - t0)
    results["uhd_device_s"] = round(best_dev, 2)
    headline = round(mpix / best_dev, 2)
    results["uhd_device_mpix_s"] = headline
    log(f"UHD on-device cascade: {best_dev:.2f}s = {headline:.2f} MPix/s")

    # whole-cascade MFU (r4 verdict item 4): analytic spec-walk FLOPs over
    # the measured time, against the chip's dense-matmul peak. The 16x
    # student is ~1.7 TFLOP at UHD — its channels (16-128) make it
    # HBM-bandwidth-bound, so a low matmul-MFU is the expected signature,
    # not a defect; the teacher (26.3 TFLOP) is the MXU-utilization story.
    def mfu(tflop_key, mode, secs, dtype):
        from collaborative_distillation_tpu.utils.flops import (
            cascade_flops, tpu_peak_flops)
        fl = cascade_flops(mode, UHD_H, UHD_W)
        results[f"{tflop_key}_tflops"] = round(fl / 1e12, 2)
        results[f"{tflop_key}_tflops_per_s"] = round(fl / secs / 1e12, 2)
        peak, label = tpu_peak_flops(dtype)
        if peak:
            results[f"{tflop_key}_mfu_pct"] = round(100 * fl / secs / peak, 2)
            log(f"{tflop_key}: {fl / 1e12:.2f} TFLOP, "
                f"{fl / secs / 1e12:.2f} TFLOP/s = "
                f"{results[f'{tflop_key}_mfu_pct']}% of {label} peak")

    try:
        mfu("uhd_f32", "16x", best_dev, "float32")
    except Exception as e:  # noqa: BLE001 — optional metric
        log(f"mfu calc skipped: {e}")

    # bf16 on-device cascade. WCT statistics/eigh stay f32 internally
    # (ops/wct_transform.py upcasts); PSNR vs the f32 output is computed
    # on-device (one scalar crosses the relay). CAUTION reading the PSNR:
    # on these NOISE inputs it is dominated by eigh-rotation sensitivity
    # (near-degenerate covariance spectra), not precision — pure-f32
    # reordering (rolled vs unrolled scans) already scores 26.8 dB here,
    # while on the real UHD photo pair bf16-vs-f32 is 38.3 dB against a
    # 43.5 dB f32-reordering floor (docs/BENCHMARKS.md round-3 table).
    try:
        out32 = eng.stylize_device(cd, sdev, 1.0, style_key="bench-dev")
        eng16 = WCTEngine(mode="16x", slab_rows=4096, packed=True, fused=True,
                          dtype=jnp.bfloat16)
        cd16 = cd.astype(jnp.bfloat16)
        sd16 = sdev.astype(jnp.bfloat16)
        t0 = time.time()
        out16 = eng16.stylize_device(cd16, sd16, 1.0, style_key="bench-dev16")
        force(out16)
        log(f"bf16 warm-up (compile): {time.time() - t0:.1f}s")
        best16 = float("inf")
        for _ in range(3):
            t0 = time.time()
            force(eng16.stylize_device(cd16, sd16, 1.0,
                                       style_key="bench-dev16"))
            best16 = min(best16, time.time() - t0)
        results["uhd_device_s_bf16"] = round(best16, 2)
        results["uhd_device_mpix_s_bf16"] = round(mpix / best16, 2)
        mfu("uhd_bf16", "16x", best16, "bfloat16")
        psnr = jax.jit(lambda a, b: -10.0 * jnp.log10(jnp.maximum(
            jnp.mean(jnp.square(jnp.clip(a.astype(jnp.float32), 0, 1)
                                - jnp.clip(b.astype(jnp.float32), 0, 1))),
            1e-12)))
        results["uhd_bf16_psnr_db"] = round(float(psnr(out32, out16)), 1)
        log(f"UHD on-device cascade bf16: {best16:.2f}s = "
            f"{results['uhd_device_mpix_s_bf16']} MPix/s, "
            f"PSNR vs f32 {results['uhd_bf16_psnr_db']} dB")
        del out32, out16, cd16
    except Exception as e:  # noqa: BLE001 — optional metric
        log(f"bf16 bench skipped: {e}")

    # teacher (original) mode on-device: the reference's original models
    # cannot fit UHD on a 12 GB GPU at all (README.md:2) — running them at
    # UHD on one chip is a headline of its own. Since r4 the teacher runs
    # width-packed (f=2 at full res) through the W-tiled Pallas kernels —
    # the layout-coherence fix that took it 8.83 -> ~4.1 s.
    try:
        opyr = None
        if not os.path.isdir(os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "weights", "original")):
            # teacher checkpoints are external downloads (reference README:26);
            # random-init the same specs — identical compute graph, identical
            # performance, only the pixels differ
            from collaborative_distillation_tpu.models.specs import (
                decoder_spec, encoder_spec)
            from collaborative_distillation_tpu.models.vgg import init_params
            key = jax.random.key(0)
            opyr = {}
            for s in (5, 4, 3, 2, 1):
                key, k1, k2 = jax.random.split(key, 3)
                es, ds = encoder_spec("original", s), decoder_spec("original", s)
                opyr[s] = {"enc_spec": es, "dec_spec": ds,
                           "enc": init_params(es, k1), "dec": init_params(ds, k2)}
        engo = WCTEngine(mode="original", slab_rows=1024, fused=True, pyramid=opyr)
        t0 = time.time()
        force(engo.stylize_device(cd, sdev, 1.0, style_key="bench-devo"))
        log(f"original-mode warm-up (compile): {time.time() - t0:.1f}s")
        besto = float("inf")
        for _ in range(2):
            t0 = time.time()
            force(engo.stylize_device(cd, sdev, 1.0, style_key="bench-devo"))
            besto = min(besto, time.time() - t0)
        results["uhd_original_device_s"] = round(besto, 2)
        results["uhd_original_device_mpix_s"] = round(mpix / besto, 2)
        log(f"UHD original-mode on-device: {besto:.2f}s = "
            f"{results['uhd_original_device_mpix_s']} MPix/s")
        mfu("uhd_teacher_f32", "original", besto, "float32")
        del engo
    except Exception as e:  # noqa: BLE001 — optional metric
        opyr = None
        log(f"original-mode bench skipped: {e}")

    # teacher bf16 in its OWN try-block: an f32-teacher success must stay
    # recorded (and correctly attributed) even if only the bf16 leg dies.
    try:
        # teacher bf16: the wide teacher convs ARE MXU-bound once packed, so
        # bf16 pays ~1.4x here (unlike the students' bandwidth-bound ~1.05x
        # pre-Pallas). A few stage-3 bf16 tiled kernels crash the remote
        # compiler; the AOT probe routes those shapes to XLA automatically.
        cdo16 = cd.astype(jnp.bfloat16)
        sdevo16 = sdev.astype(jnp.bfloat16)
        engo16 = WCTEngine(mode="original", slab_rows=1024, fused=True,
                           pyramid=opyr, dtype=jnp.bfloat16)
        t0 = time.time()
        force(engo16.stylize_device(cdo16, sdevo16, 1.0, style_key="bench-devo16"))
        log(f"original-mode bf16 warm-up (compile): {time.time() - t0:.1f}s")
        besto16 = float("inf")
        for _ in range(2):
            t0 = time.time()
            force(engo16.stylize_device(cdo16, sdevo16, 1.0,
                                        style_key="bench-devo16"))
            besto16 = min(besto16, time.time() - t0)
        results["uhd_original_device_s_bf16"] = round(besto16, 2)
        log(f"UHD original-mode on-device bf16: {besto16:.2f}s = "
            f"{round(mpix / besto16, 2)} MPix/s")
        mfu("uhd_teacher_bf16", "original", besto16, "bfloat16")
        del engo16, cdo16, sdevo16
    except Exception as e:  # noqa: BLE001 — optional metric
        log(f"original-mode bf16 bench skipped: {e}")

    # 2K device-only: separates compute from transport so a congested relay
    # can't masquerade as a pipeline regression (r02 had no such number).
    # Goes through _run_device — the engine's real dispatch (slab re-pick for
    # the 1024-row height, style-stat cache) — with device-resident inputs,
    # stream_ok=False so the monolithic program's full compute is timed.
    # Free the ~1.6 GB of UHD device buffers first: a standalone probe of the
    # identical 2K program measured 0.055-0.059 s while the in-bench number
    # read 0.125 s with the UHD arrays still resident (HBM allocator
    # pressure / fragmentation), and nothing below reuses them.
    try:
        del cd, sdev, eng16, sd16
    except NameError:
        pass  # bf16 section may have been skipped
    cd2 = jax.random.uniform(kc, (1, 1024, 2048, 3), jnp.float32)
    sdev2 = jax.random.uniform(ks2, (1, 1024, 1024, 3), jnp.float32)
    run2k = lambda: eng.stylize_device(cd2, sdev2, 1.0, style_key="bench2k-dev")
    t0 = time.time()
    float(jnp.sum(run2k()[0, ::97, ::97, 0]))  # warm (compile)
    log(f"2K device warm-up: {time.time() - t0:.1f}s")

    # dispatch-differencing (r4 verdict item 6): at 2K one relay RPC is
    # comparable to the ~60 ms compute, so single-run timings swung 2x
    # (0.057-0.13 s across BENCH_r0{2..4}). Queue N async dispatches behind
    # one readback vs 1 dispatch behind one readback; the difference divides
    # out the shared RPC + readback cost exactly, same cancellation the
    # fori-loop method gives wct_latency() — but through the engine's REAL
    # dispatch (slab re-pick, style-stat cache), not a private program.
    def timed_chain(run, force_out, n):
        b = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = None
            for _i in range(n):
                out = run()
            force_out(out)
            b = min(b, time.time() - t0)
        return b

    f2k = lambda out: float(jnp.sum(out[0, ::97, ::97, 0]))
    t5, t1 = timed_chain(run2k, f2k, 5), timed_chain(run2k, f2k, 1)
    best2d = max((t5 - t1) / 4, 0.0)
    results["2k_device_s"] = round(best2d, 3)
    results["2k_device_dispatch_s"] = round(t1, 3)  # incl. one relay RPC
    log(f"2K on-device: {best2d:.3f}s/run (differenced; "
        f"single-dispatch {t1:.3f}s)")

    try:
        lat = wct_latency()
        results["wct_latency_ms"] = {k: round(v, 2) for k, v in lat.items()}
        log(f"WCT transform latency: {results['wct_latency_ms']}")
    except Exception as e:
        log(f"wct latency bench failed: {e}")

    # distillation training step (stage-2 wct_se, batch 16 @256² — the
    # reference's config, main.py:27-47), device-resident batch; random-init
    # teachers time identically to converted ones
    try:
        from collaborative_distillation_tpu.models.specs import (
            decoder_spec, encoder_spec)
        from collaborative_distillation_tpu.models.vgg import init_params
        from collaborative_distillation_tpu.train.trainer import (
            TrainConfig, Trainer)
        k1, k2, k3, k4 = jax.random.split(jax.random.key(1), 4)
        be = init_params(encoder_spec("original", 2), k1)
        bd = init_params(decoder_spec("original", 2), k2)
        se = init_params(encoder_spec("16x", 2, aux=True), k3)
        tr = Trainer(TrainConfig(mode="wct_se", stage=2, batch_size=16),
                     se, {"be": be, "bd": bd})
        batch = jax.random.uniform(k4, (16, 256, 256, 3), jnp.float32)
        t0 = time.time()
        losses, _ = tr.train_step(batch)
        float(next(iter(losses.values())))
        log(f"train-step warm-up (compile): {time.time() - t0:.1f}s")
        # same dispatch-differencing as 2k_device_s: a train step is ~0.1 s,
        # same order as one relay RPC
        def run_tr():
            return tr.train_step(batch)

        ttr5 = timed_chain(run_tr, lambda o: float(next(iter(o[0].values()))), 5)
        ttr1 = timed_chain(run_tr, lambda o: float(next(iter(o[0].values()))), 1)
        best_tr = max((ttr5 - ttr1) / 4, 0.0)
        results["train_step_s"] = round(best_tr, 3)
        results["train_step_dispatch_s"] = round(ttr1, 3)
        log(f"train step (wct_se stage 2, batch 16 @256^2): {best_tr:.3f}s = "
            f"{16 / best_tr:.1f} img/s")
        del tr, be, bd, se, batch
    except Exception as e:  # noqa: BLE001 — optional metric
        log(f"train-step bench skipped: {e}")

    # ============ PHASE 2: end-to-end over the relay ============
    cu, su = load_pair(UHD_W, UHD_H)

    # record the relay's condition next to the e2e numbers: the dev tunnel
    # swings 0.5-50 MB/s with load (full collapses observed), and e2e is
    # link-dominated — without this context a congested-window number would
    # be indistinguishable from a pipeline regression
    try:
        from collaborative_distillation_tpu.utils.transfer import fetch
        probe = np.ones((512, 4096, 3), np.uint8)  # 6 MB
        t0 = time.time()
        d = jnp.asarray(probe); np.asarray(d[0, 0, 0])
        results["relay_h2d_mbps"] = round(probe.nbytes / (time.time() - t0) / 1e6, 1)
        t0 = time.time()
        fetch(d, min_bytes=1 << 20)
        results["relay_d2h_mbps"] = round(probe.nbytes / (time.time() - t0) / 1e6, 1)
        log(f"relay probe: h2d {results['relay_h2d_mbps']} MB/s, "
            f"d2h {results['relay_d2h_mbps']} MB/s")
    except Exception as e:  # noqa: BLE001 — the probe must never kill the bench
        log(f"relay probe failed: {e}")

    # end-to-end, default transport: uint8 in/out, which at UHD rides the
    # link as JPEG-native 4:2:0 planes (1.5 B/px; native fixed-point
    # conversion, +-1 LSB of the float math) — the pipeline endpoints are
    # JPEGs, themselves 4:2:0, so the saved artifact is unchanged up to
    # chroma-box rounding.
    t0 = time.time()
    eng.stylize(cu, su, style_key="bench", as_uint8=True)
    results["uhd_compile_s"] = round(time.time() - t0, 1)
    log(f"UHD compile+first run: {results['uhd_compile_s']}s")
    # min over 5 runs: the relay's d2h bandwidth swings 0.5-50 MB/s with
    # load (measured same-day); min is the least-congested estimate of the
    # pipeline itself, and congestion spikes can last whole 3-run windows
    best_e2e = float("inf")
    for _ in range(5):
        t0 = time.time()
        eng.stylize(cu, su, style_key="bench", as_uint8=True)
        best_e2e = min(best_e2e, time.time() - t0)
    results["uhd_e2e_s"] = round(best_e2e, 2)
    results["uhd_e2e_mpix_s"] = round(mpix / best_e2e, 2)
    log(f"UHD end-to-end (default transport): {best_e2e:.2f}s = "
        f"{mpix / best_e2e:.2f} MPix/s")

    # the reference's actual workflow — JPEG file in, stylized JPEG out —
    # via the fully streamed path (banded entropy decode under the upload,
    # banded entropy encode under the readback, zero host pixel math)
    try:
        from collaborative_distillation_tpu.data.native_codec import (
            encode_jpeg_yuv420, rgb_to_yuv420)
        yj, cj = rgb_to_yuv420(cu)
        src_jpg = encode_jpeg_yuv420(yj, cj, quality=95)
        body = eng.stylize_jpeg(src_jpg, su, style_key="bench")  # warm tail
        if body is not None:
            best_jj = float("inf")
            for _ in range(3):
                t0 = time.time()
                eng.stylize_jpeg(src_jpg, su, style_key="bench")
                best_jj = min(best_jj, time.time() - t0)
            results["uhd_jpeg_jpeg_s"] = round(best_jj, 2)
            log(f"UHD JPEG->JPEG (streamed codec): {best_jj:.2f}s")
    except Exception as e:  # noqa: BLE001 — optional metric
        log(f"jpeg->jpeg bench skipped: {e}")

    # lossless RGB transport (3 B/px, bit-exact uint8 across the link);
    # same run count as the default so congestion bias can't favor either
    best_rgb = float("inf")
    for _ in range(5):
        t0 = time.time()
        eng.stylize(cu, su, style_key="bench", as_uint8=True, transport="rgb")
        best_rgb = min(best_rgb, time.time() - t0)
    results["uhd_e2e_rgb_s"] = round(best_rgb, 2)
    log(f"UHD end-to-end (rgb transport): {best_rgb:.2f}s = "
        f"{mpix / best_rgb:.2f} MPix/s")

    # per-leg breakdown (r4 verdict item 5): one timed run per transport.
    # timed=True serializes legs that normally overlap, so its total is an
    # upper bound on the un-timed best-of-5 above — the VALUE is the split
    # (upload vs compute vs readback), which tells a congested link apart
    # from a pipeline regression.
    try:
        for tname in ("yuv420", "rgb"):
            eng.stylize(cu, su, style_key="bench", as_uint8=True,
                        transport=tname, timed=True)
            results[f"uhd_e2e_legs_{tname}"] = dict(eng.last_timings)
            log(f"UHD e2e legs ({tname}): {eng.last_timings}")
    except Exception as e:  # noqa: BLE001 — optional metric
        log(f"e2e leg breakdown skipped: {e}")

    # bf16 quality on the REAL photo pair through the HEAD kernel path
    # (r4 verdict item 2): the phase-1 bf16 PSNR is on noise inputs, where
    # eigh-rotation sensitivity dominates; this is the number that says
    # whether bf16 output is visually lossless on actual content. One uint8
    # upload is already paid (cu/su are on the host); everything else stays
    # on-device and one scalar comes back.
    try:
        from collaborative_distillation_tpu.utils.transfer import push
        cu_dev = push(np.ascontiguousarray(cu[None]))
        su_dev = push(np.ascontiguousarray(su[None]))
        to_f = jax.jit(lambda x: x.astype(jnp.float32) / 255.0)
        cf, sf = to_f(cu_dev), to_f(su_dev)
        out32p = eng.stylize_device(cf, sf, 1.0, style_key="bench-photo")
        engq = WCTEngine(mode="16x", slab_rows=4096, packed=True, fused=True,
                         dtype=jnp.bfloat16)
        out16p = engq.stylize_device(cf.astype(jnp.bfloat16),
                                     sf.astype(jnp.bfloat16), 1.0,
                                     style_key="bench-photo16")
        psnrp = jax.jit(lambda a, b: -10.0 * jnp.log10(jnp.maximum(
            jnp.mean(jnp.square(jnp.clip(a.astype(jnp.float32), 0, 1)
                                - jnp.clip(b.astype(jnp.float32), 0, 1))),
            1e-12)))
        results["uhd_bf16_photo_psnr_db"] = round(float(psnrp(out32p, out16p)), 1)
        log(f"bf16-vs-f32 PSNR on the real UHD photo pair (HEAD kernels): "
            f"{results['uhd_bf16_photo_psnr_db']} dB")
        del cu_dev, su_dev, cf, sf, out32p, out16p, engq
    except Exception as e:  # noqa: BLE001 — optional metric
        log(f"bf16 photo PSNR skipped: {e}")

    # 2K config (BASELINE.md secondary config), same engine
    c2, s2 = load_pair(2048, 1024, 1024, 1024)
    t0 = time.time()
    eng.stylize(c2, s2, style_key="bench2k", as_uint8=True)
    log(f"2K compile+first: {time.time() - t0:.1f}s")
    best2 = float("inf")
    for _ in range(3):
        t0 = time.time()
        eng.stylize(c2, s2, style_key="bench2k", as_uint8=True)
        best2 = min(best2, time.time() - t0)
    results["2k_e2e_s"] = round(best2, 3)
    results["2k_e2e_mpix_s"] = round(2048 * 1024 / 1e6 / best2, 2)
    log(f"2K end-to-end: {best2:.3f}s = {results['2k_e2e_mpix_s']} MPix/s "
        f"(link share vs device: {best2 - results['2k_device_s']:.3f}s)")

    # 4x4 content x style grid at 2K, pipelined (upload/compute/readback
    # overlapped across pairs, style stats cached per style)
    rng = np.random.default_rng(1)
    cs = [load_pair(2048, 1024, 1024, 1024)[0] for _ in range(2)]
    cs.append(np.ascontiguousarray(cs[0][::-1]))
    cs.append(np.ascontiguousarray(cs[0][:, ::-1]))
    ss = [s2, np.ascontiguousarray(s2[::-1]),
          np.ascontiguousarray(s2[:, ::-1]),
          rng.integers(0, 255, s2.shape, dtype=np.uint8)]
    pairs = [(c, s) for c in cs for s in ss]
    keys = [f"grid{j % 4}" for j in range(16)]
    list(eng.stylize_pairs(pairs[:2], style_keys=keys[:2]))  # warm
    t0 = time.time()
    outs = list(eng.stylize_pairs(pairs, style_keys=keys))
    grid_dt = (time.time() - t0) / len(pairs)
    results["grid_2k_s_per_pair"] = round(grid_dt, 3)
    # link-saturation floor for one pair at this relay's measured bandwidth:
    # 4:2:0 transport moves 1.5 B/px each way, and the pipelined grid runs
    # uploads and readbacks concurrently (full duplex), so the floor is the
    # slower DIRECTION, not the sum. When grid s/pair sits at this floor,
    # cross-pair pipelining has already hidden all compute under the
    # transfers and only a faster link can improve it.
    if "relay_h2d_mbps" in results and "relay_d2h_mbps" in results:
        pair_mb = 2048 * 1024 * 1.5 / 1e6
        floor = max(pair_mb / max(results["relay_h2d_mbps"], 0.1),
                    pair_mb / max(results["relay_d2h_mbps"], 0.1))
        results["grid_2k_link_floor_s"] = round(floor, 3)
        log(f"4x4 grid @2K pipelined: {grid_dt:.3f} s/pair "
            f"(link floor at probed bandwidth: {floor:.3f}s)")
    else:
        log(f"4x4 grid @2K pipelined: {grid_dt:.3f} s/pair")

    print(json.dumps({
        "metric": "UHD 10240x4096 5-level WCT stylization, on-device cascade (mode 16x, one v5e chip)",
        "value": headline,
        "unit": "MPix/s",
        "vs_baseline": round(headline / BASELINE_MPIX_S, 3),
        "detail": results,
    }))


if __name__ == "__main__":
    sys.exit(_main_guarded())
