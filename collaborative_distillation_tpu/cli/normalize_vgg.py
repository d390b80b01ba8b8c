"""Gatys-style activation normalization of a VGG encoder.

JAX port of tools/convert_caffemodel_to_pth/normalise_vgg/normalise_pth.py
(245-268): rescale each conv's weights and bias so the *mean activation* of
every filter over a calibration image set equals 1, propagating the previous
layer's scale into the next layer's input weights. This is how the original
"vgg_normalised" WCT teachers were produced; needed only when (re)building
teachers from raw VGG weights.

    python -m collaborative_distillation_tpu.cli.normalize_vgg \
        --weights weights/original/e5.npz --stage 5 \
        --images data/val/ --out weights/original/e5_norm.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def normalize_encoder(params, spec, batches, *, eps: float = 1e-12,
                      rel_floor: float = 0.0):
    """Return a new params tree with per-filter mean activation == 1.

    ``batches``: iterable of (N, H, W, 3) float arrays. Mean activations are
    taken over the *pre-relu is post-relu here* conv outputs like the
    reference (it averages the ReLU'd blob, normalise_caffe.py:83-106).

    ``rel_floor``: filters whose mean activation is below ``rel_floor`` x the
    layer's average are floored there before inverting. OFF by default (0.0
    = exact reference semantics — every filter normalized to mean 1, real
    VGG weights never need a floor). Synthetic/random teachers
    (cli.make_teacher) pass 1e-2 so near-dead relu filters don't receive a
    ~1/eps rescale that explodes on inputs the calibration set didn't cover.
    """
    import jax
    import jax.numpy as jnp

    from ..models.vgg import apply_encoder

    batches = list(batches)

    # per-layer mean activation under the *current* (already partially
    # rescaled) parameters, so scales compose exactly like the reference's
    # sequential pass.
    params = jax.tree.map(np.asarray, params)
    prev_scale = None
    conv_names = [l.name for l in spec.layers]

    @jax.jit
    def taps_fn(p, x):
        outs = {}
        h = x
        if spec.has_conv0:
            from ..ops.conv import conv1x1
            h = conv1x1(h, p["conv0"]["w"], p["conv0"]["b"])
        from ..ops.conv import conv3x3, max_pool_2x2
        for layer in spec.layers:
            h = conv3x3(h, p[layer.name]["w"], p[layer.name]["b"], relu=layer.relu)
            outs[layer.name] = jnp.mean(h.astype(jnp.float32), axis=(0, 1, 2))
            if layer.pool_after:
                h = max_pool_2x2(h)
        return outs

    for name in conv_names:
        if prev_scale is not None:
            params[name] = {
                "w": params[name]["w"] * prev_scale[None, None, :, None],
                "b": params[name]["b"],
            }
        means = None
        total = 0
        for b in batches:
            m = taps_fn(params, jnp.asarray(b, jnp.float32))[name]
            m = np.asarray(m) * b.shape[0]
            means = m if means is None else means + m
            total += b.shape[0]
        mean_act = means / total
        floor = max(eps, rel_floor * float(np.mean(mean_act)))
        mean_act = np.maximum(mean_act, floor)
        scale = 1.0 / mean_act
        params[name] = {"w": params[name]["w"] * scale[None, None, None, :],
                        "b": params[name]["b"] * scale}
        prev_scale = mean_act  # next layer's inputs shrink by 1/scale -> multiply back
    return params


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", required=True)
    ap.add_argument("--stage", type=int, required=True, choices=[1, 2, 3, 4, 5])
    ap.add_argument("--family", default="original", choices=["original", "16x"])
    ap.add_argument("--images", required=True, help="calibration image folder")
    ap.add_argument("--n_images", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", required=True)
    ap.add_argument("--rel_floor", type=float, default=0.0,
                    help="floor mean activations at this fraction of the "
                         "layer mean before inverting (0 = reference "
                         "semantics; use ~1e-2 for synthetic teachers)")
    args = ap.parse_args(argv)

    from ..data.pipeline import CenterCropDataset
    from ..models.specs import encoder_spec
    from ..models.zoo import load_stage_params
    from ..utils.torch_convert import save_tree_npz

    spec = encoder_spec(args.family, args.stage, aux=(args.family == "16x"))
    params = load_stage_params(args.weights, spec)
    ds = CenterCropDataset(args.images, shorter_side=args.size + 16, crop=args.size)
    n = min(args.n_images, len(ds))
    batches = []
    for i in range(0, n, args.batch):
        batches.append(np.stack([ds[j][0] for j in range(i, min(i + args.batch, n))]))
    out = normalize_encoder(params, spec, batches, rel_floor=args.rel_floor)
    save_tree_npz({k: {n_: np.asarray(v) for n_, v in e.items()} for k, e in out.items()},
                  args.out)
    print(f"normalized {args.weights} over {n} images -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
