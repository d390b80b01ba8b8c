"""Real-content quality A/B between engine configurations.

Measures PSNR between two engine configurations (default: bf16 vs f32 with
the current production defaults) on the reference's real UHD content photo
(PytorchWCT/content/UHD_content) + a real style. PSNR is computed on device
so only one scalar crosses the relay; the content crosses once as uint8.

Noise-input PSNR numbers (bench.py) are dominated by eigh-rotation
sensitivity on near-degenerate spectra, NOT precision — this script is the
real-content counterpart those numbers must be read against
(docs/BENCHMARKS.md "cascade sensitivity study").

Usage:
    python tools/quality_ab.py [--content path] [--style path]
                               [--scale 1.0] [--xla_vs_pallas]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/PytorchWCT"


def load_img(path: str, scale: float) -> np.ndarray:
    from PIL import Image
    im = Image.open(path).convert("RGB")
    if scale != 1.0:
        w, h = im.size
        im = im.resize((int(w * scale) // 32 * 32, int(h * scale) // 32 * 32),
                       Image.LANCZOS)
    else:
        w, h = im.size
        im = im.crop((0, 0, w // 32 * 32, h // 32 * 32))
    return np.asarray(im, np.uint8)[None]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--content",
                    default=f"{REF}/content/UHD_content/green_park-wallpaper-3840x2160.jpg")
    ap.add_argument("--style", default=f"{REF}/style/in3.jpg")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--mode", default="16x")
    ap.add_argument("--xla_vs_pallas", action="store_true",
                    help="A/B the Pallas conv kernels vs the XLA lowering "
                         "at f32 instead of bf16 vs f32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    c8 = load_img(args.content, args.scale)
    s8 = load_img(args.style, 1.0)
    print(f"content {c8.shape} style {s8.shape}", file=sys.stderr)
    cdev8 = jax.device_put(c8)
    sdev8 = jax.device_put(s8)
    to_f = jax.jit(lambda x: x.astype(jnp.float32) / 255.0)
    cdev = to_f(cdev8)
    sdev = to_f(sdev8)

    def run(dtype, tag):
        eng = WCTEngine(mode=args.mode, slab_rows=4096, packed=True,
                        fused=True, dtype=dtype)
        fn, fp = eng._fused_slab
        sd = eng._fused_style_stats(sdev.astype(dtype), style_key=f"qab-{tag}")
        t0 = time.time()
        out = fn(fp, cdev.astype(dtype), sd, 1.0)
        out = jax.block_until_ready(out)
        print(f"{tag}: {time.time() - t0:.1f}s (incl. compile)", file=sys.stderr)
        return out

    psnr = jax.jit(lambda a, b: -10.0 * jnp.log10(jnp.maximum(
        jnp.mean(jnp.square(jnp.clip(a.astype(jnp.float32), 0, 1)
                            - jnp.clip(b.astype(jnp.float32), 0, 1))),
        1e-12)))

    if args.xla_vs_pallas:
        a = run(jnp.float32, "f32-pallas")
        os.environ["CD_TPU_PALLAS_CONV"] = "0"
        b = run(jnp.float32, "f32-xla")
        label = "f32 Pallas-conv vs f32 XLA-conv"
    else:
        a = run(jnp.float32, "f32")
        b = run(jnp.bfloat16, "bf16")
        label = "bf16 vs f32 (production defaults)"
    val = float(psnr(a, b))
    mad = float(jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"{label}: PSNR {val:.1f} dB, mean|delta| {mad:.4f} "
          f"on {args.content.rsplit('/', 1)[-1]} x {args.style.rsplit('/', 1)[-1]}")


if __name__ == "__main__":
    main()
