"""Build a synthetic *normalized* teacher weight store (no downloads).

The real teacher autoencoders (`vgg_normalised_conv{k}_1.t7`, `our_BD`) are
external downloads in the reference checkout too (reference README.md:26/62),
so a fresh clone cannot run ``--mode original`` or the distillation trainer
at all. This tool makes the whole teacher-dependent pipeline exercisable
end-to-end without any external file:

* encoders: Kaiming-random VGG-19 stage weights with the reference's baked-in
  preprocessing conv0 (RGB->BGR x255 - ImageNet mean, model_original.py:
  428-433), passed through the same Gatys activation normalization the real
  teachers received (mean filter activation == 1 over a calibration set;
  tools/convert_caffemodel_to_pth/normalise_vgg/normalise_pth.py:245-268) —
  so WCT covariances are well-scaled and the distillation losses are
  numerically realistic;
* decoders: Kaiming-random mirrors (the reference's `our_BD` decoders were
  trained offline by the authors with an unpublished recipe; a synthetic
  store cannot reproduce them, only their shapes and scale).

Outputs are real store entries (``<out>/original/e{k}.npz`` / ``d{k}.npz``)
consumed by the zoo, the trainer, the pruner, and ``WCTEngine(mode=
"original")``. Quality is obviously not the real teachers' — this is the
path-exercising store for CI, smoke runs, and recipe development.

    python -m collaborative_distillation_tpu.cli.make_teacher \
        --out weights --stages 1 2 3 4 5 [--images <calib dir>] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def synth_calibration_batches(n_images: int, batch: int, size: int, seed: int):
    """Smooth random calibration images in [0,1] (noise images drive relu
    activations into unrealistically uniform regimes; low-frequency blobs are
    closer to natural-image statistics)."""
    rng = np.random.default_rng(seed)
    batches = []
    for i in range(0, n_images, batch):
        n = min(batch, n_images - i)
        small = rng.random((n, size // 16, size // 16, 3), np.float32)
        up = small.repeat(16, axis=1).repeat(16, axis=2)
        # separable box blur to soften the block edges
        k = 9
        pad = np.pad(up, ((0, 0), (k // 2, k // 2), (0, 0), (0, 0)), mode="edge")
        up = np.stack([pad[:, j:j + up.shape[1]] for j in range(k)]).mean(0)
        pad = np.pad(up, ((0, 0), (0, 0), (k // 2, k // 2), (0, 0)), mode="edge")
        up = np.stack([pad[:, :, j:j + up.shape[2]] for j in range(k)]).mean(0)
        batches.append(up.astype(np.float32))
    return batches


def build_synthetic_teacher(out_root: str, stages=(1, 2, 3, 4, 5), *, seed: int = 0,
                            calib_batches=None, n_images: int = 16,
                            batch: int = 4, size: int = 128, log=print):
    import jax

    from ..models.specs import decoder_spec, encoder_spec
    from ..models.vgg import init_params
    from ..models.zoo import PREPROC_CONV0
    from ..utils.torch_convert import save_tree_npz
    from .normalize_vgg import normalize_encoder

    if calib_batches is None:
        calib_batches = synth_calibration_batches(n_images, batch, size, seed)
    key = jax.random.key(seed)
    for k in sorted(stages):
        key, ke, kd = jax.random.split(key, 3)
        espec = encoder_spec("original", k)
        dspec = decoder_spec("original", k)
        enc = init_params(espec, ke)
        if espec.has_conv0:
            enc["conv0"] = {"w": PREPROC_CONV0["w"], "b": PREPROC_CONV0["b"]}
        # synthetic random teachers have near-dead relu filters; floor them
        # so the normalization scale can't explode (real-teacher runs via
        # cli.normalize_vgg keep the exact reference semantics, floor off)
        enc = normalize_encoder(enc, espec, calib_batches, rel_floor=1e-2)
        dec = init_params(dspec, kd)
        epath = os.path.join(out_root, "original", f"e{k}.npz")
        dpath = os.path.join(out_root, "original", f"d{k}.npz")
        save_tree_npz({n: {kk: np.asarray(v) for kk, v in e.items()}
                       for n, e in enc.items()}, epath)
        save_tree_npz({n: {kk: np.asarray(v) for kk, v in e.items()}
                       for n, e in dec.items()}, dpath)
        log(f"stage {k}: synthetic normalized teacher -> {epath}, {dpath}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--out", default="weights", help="weight store root")
    ap.add_argument("--stages", type=int, nargs="+", default=[1, 2, 3, 4, 5],
                    choices=[1, 2, 3, 4, 5])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--images", default="",
                    help="calibration image folder (default: synthetic blobs)")
    ap.add_argument("--n_images", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=128)
    args = ap.parse_args(argv)

    calib = None
    if args.images:
        from ..data.pipeline import CenterCropDataset
        ds = CenterCropDataset(args.images, shorter_side=args.size + 16,
                               crop=args.size)
        n = min(args.n_images, len(ds))
        calib = [np.stack([ds[j][0] for j in range(i, min(i + args.batch, n))])
                 for i in range(0, n, args.batch)]
    build_synthetic_teacher(args.out, args.stages, seed=args.seed,
                            calib_batches=calib, n_images=args.n_images,
                            batch=args.batch, size=args.size)
    return 0


if __name__ == "__main__":
    sys.exit(main())
