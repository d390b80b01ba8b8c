"""Evaluate autoencoder fidelity of a model family, per pyramid stage.

The collaborative-distillation paper reports quantitative tables (PSNR/SSIM
of reconstructions, distillation losses) that the reference repo has no
script for — quality there is judged by the training loop's saved
``[content; reconstruction]`` grids (main.py:121-126). This tool computes
the numbers:

* reconstruction PSNR/SSIM/MSE of ``dec_k(enc_k(x))`` against ``x`` per stage —
  exactly what the pixel loss optimizes (model/model.py:29, 47);
* with ``--teacher_root``, the per-stage feature-distillation error between
  the student encoder's aux-adapted taps and the teacher's taps (the
  wct_se feat loss, model/model.py:24-26).

    python -m collaborative_distillation_tpu.cli.eval --mode 16x \
        --images <dir> --n_images 16 --size 256
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def _gauss_filter(x: np.ndarray, win: int = 11, sigma: float = 1.5) -> np.ndarray:
    """Separable Gaussian over the H, W axes of (N, H, W, C), 'valid' edges
    (the standard SSIM prescription drops the border instead of padding).
    Vectorized via sliding windows — a Python-level per-slice convolve loop
    takes minutes per eval stage on this 1-CPU container."""
    from numpy.lib.stride_tricks import sliding_window_view

    g = np.exp(-0.5 * ((np.arange(win) - win // 2) / sigma) ** 2)
    g /= g.sum()
    x = sliding_window_view(x, win, axis=1) @ g  # (N, H', W, C)
    return sliding_window_view(x, win, axis=2) @ g  # (N, H', W', C)


def ssim(a: np.ndarray, b: np.ndarray, peak: float = 1.0, *, win: int = 11,
         sigma: float = 1.5) -> float:
    """Mean single-scale SSIM (Wang et al. 2004: 11x11 Gaussian window,
    sigma 1.5, k1=0.01, k2=0.03), channels treated as independent planes and
    averaged — the convention the paper's quality tables use. Inputs
    (N, H, W, C) or (H, W, C) in [0, peak]."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 3:
        a, b = a[None], b[None]
    c1, c2 = (0.01 * peak) ** 2, (0.03 * peak) ** 2
    mu_a = _gauss_filter(a, win, sigma)
    mu_b = _gauss_filter(b, win, sigma)
    var_a = _gauss_filter(a * a, win, sigma) - mu_a * mu_a
    var_b = _gauss_filter(b * b, win, sigma) - mu_b * mu_b
    cov = _gauss_filter(a * b, win, sigma) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)
    return float(np.mean(num / den))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", default="16x",
                    help="family to evaluate (original | 16x | 16x_kd2sd)")
    ap.add_argument("--images", required=True, help="directory of images")
    ap.add_argument("--n_images", type=int, default=16)
    ap.add_argument("--size", type=int, default=256, help="center-crop size")
    ap.add_argument("--stages", type=int, nargs="+", default=[5, 4, 3, 2, 1])
    ap.add_argument("--weights_root", type=str, default="")
    ap.add_argument("--teacher_root", type=str, default="",
                    help="weights root holding original/e{k}.npz teachers; "
                         "adds the SE-vs-BE feature-distillation error")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data.pipeline import CenterCropDataset
    from ..models.specs import encoder_spec
    from ..models.vgg import apply_decoder, apply_encoder
    from ..models.zoo import load_pyramid, load_stage_params

    pyramid = load_pyramid(args.mode, args.weights_root or None,
                           stages=tuple(args.stages))
    ds = CenterCropDataset(args.images, shorter_side=args.size + 16,
                           crop=args.size)
    n = min(args.n_images, len(ds))
    if n == 0:
        raise SystemExit(f"no images found under {args.images}")
    imgs = np.stack([ds[i][0] for i in range(n)])  # (N, H, W, 3) float [0,1]

    teachers = {}
    if args.teacher_root:
        for k in args.stages:
            spec = encoder_spec("original", k)
            teachers[k] = (load_stage_params(
                f"{args.teacher_root}/original/e{k}.npz", spec), spec)

    results = {}
    for k in args.stages:
        es, dsx = pyramid[k]["enc_spec"], pyramid[k]["dec_spec"]
        fn = jax.jit(lambda ep, dp, x, _es=es, _ds=dsx: apply_decoder(
            dp, apply_encoder(ep, x, _es)["out"], _ds)["out"])
        rec = np.clip(np.asarray(fn(pyramid[k]["enc"], pyramid[k]["dec"],
                                    jnp.asarray(imgs))), 0.0, 1.0)
        row = {"psnr": round(psnr(rec, imgs), 2),
               "ssim": round(ssim(rec, imgs), 4),
               "mse": round(float(np.mean((rec - imgs) ** 2)), 6)}
        if k in teachers and es.aux:
            # the wct_se feat loss (model/model.py:24-26): student aux taps
            # (adapted up to teacher widths) vs teacher relu taps. Only
            # meaningful for aux-carrying students — an aux-less family
            # (mode=original) simply omits the metric
            tp, tspec = teachers[k]

            def feat_err(ep, tpp, x, _es=es, _ts=tspec):
                taps_s = apply_encoder(ep, x, _es)
                taps_t = apply_encoder(tpp, x, _ts)
                errs = [jnp.mean((taps_s[n] - taps_t["relu" + n[3:]]) ** 2)
                        for n in taps_s if n.startswith("aux")
                        and ("relu" + n[3:]) in taps_t]
                return jnp.mean(jnp.stack(errs))

            row["feat_mse"] = round(float(jax.jit(feat_err)(
                pyramid[k]["enc"], tp, jnp.asarray(imgs))), 6)
        results[k] = row
        print(f"stage {k}: " + "  ".join(f"{m}={v}" for m, v in row.items()),
              flush=True)
    mean_psnr = np.mean([r["psnr"] for r in results.values()])
    print(f"mean reconstruction PSNR over stages {args.stages}: "
          f"{mean_psnr:.2f} dB ({n} images @ {args.size}px, mode {args.mode})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
