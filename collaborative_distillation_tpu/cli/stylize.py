"""Inference CLI: universal style transfer over content x style grids.

TPU rework of ``PytorchWCT/WCT.py`` with the same flag surface (WCT.py:15-34):

    python -m collaborative_distillation_tpu.cli.stylize --mode 16x \
        --contentPath .../content --stylePath .../style --outf stylized_results

Additions over the reference: ``--method newton`` (matmul-only WCT),
``--space N`` (spatial tiling over N mesh devices for UHD inputs),
``--bf16`` activations, and per-style statistic caching.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--UHD_contentPath", type=str, default="content/UHD_content")
    ap.add_argument("--UHD_stylePath", type=str, default="style/UHD_style")
    ap.add_argument("--contentPath", type=str, default="content")
    ap.add_argument("--stylePath", type=str, default="style")
    ap.add_argument("--texturePath", type=str, default="style/texture")
    ap.add_argument("--outf", type=str, default="stylized_results")
    ap.add_argument("--picked_content_mark", type=str, default="")
    ap.add_argument("--picked_style_mark", type=str, default="")
    ap.add_argument("--mode", type=str, default="original",
                    choices=["original", "16x", "16x_kd2sd", "16x_base"])
    ap.add_argument("--UHD", action="store_true")
    ap.add_argument("--synthesis", action="store_true", help="texture synthesis from noise")
    ap.add_argument("--content_size", type=int, default=0)
    ap.add_argument("--style_size", type=int, default=0)
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--log_mark", type=str, default=time.strftime("%Y%m%d-%H%M"))
    ap.add_argument("--num_run", type=int, default=1)
    ap.add_argument("--debug", action="store_true")
    ap.add_argument("--method", type=str, default="eigh", choices=["eigh", "newton"],
                    help="WCT matrix-root algorithm (reference: CPU float64 SVD)")
    ap.add_argument("--space", type=int, default=0,
                    help="spatially tile over N devices (0 = single device)")
    ap.add_argument("--bf16", action="store_true", help="bfloat16 activations")
    ap.add_argument("--weights_root", type=str, default="")
    ap.add_argument("--slab_rows", type=int, default=0,
                    help="stream in row slabs of N rows (single-chip UHD)")
    ap.add_argument("--packed", action="store_true",
                    help="width-packed lane-dense conv pipeline")
    ap.add_argument("--transport", default="auto",
                    choices=["auto", "rgb", "yuv420"],
                    help="host<->device image transport; yuv420 moves "
                         "JPEG-native 4:2:0 planes (half the link bytes)")
    ap.add_argument("--halo", default="ppermute",
                    choices=["ppermute", "pallas"],
                    help="multi-chip halo exchange: XLA ppermute collective "
                         "or the Pallas RDMA kernel (ops/pallas/halo.py); "
                         "only meaningful with --space > 1 + --slab_rows")
    ap.add_argument("--profile", type=str, default="",
                    help="write a jax.profiler trace to this dir")
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.pipeline import PairGridDataset
    from ..utils.image import save_image
    from ..utils.logging import LogPrinter, Throughput
    from ..utils.profiling import trace
    from ..wct.engine import WCTEngine

    os.makedirs(args.outf, exist_ok=True)
    log_path = os.path.join(args.outf, f"log_{args.log_mark}_{args.mode}.txt")
    log = LogPrinter(None if args.debug else open(log_path, "a+"),
                     args.log_mark, to_screen=args.debug)
    log(str(vars(args)))

    content_dir = args.UHD_contentPath if args.UHD else args.contentPath
    style_dir = args.UHD_stylePath if args.UHD else args.stylePath
    dataset = PairGridDataset(
        content_dir, style_dir, texture_dir=args.texturePath,
        content_size=args.content_size, style_size=args.style_size,
        picked_content_mark=args.picked_content_mark,
        picked_style_mark=args.picked_style_mark, synthesis=args.synthesis)
    log(f"Number of content-style pairs: {len(dataset)}")

    engine = WCTEngine(
        mode=args.mode, weights_root=args.weights_root or None,
        method=args.method, dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        space=args.space, slab_rows=args.slab_rows, packed=args.packed,
        transport=args.transport, halo=args.halo)
    tp = Throughput()
    total_t = 0.0
    profile_ctx = trace(args.profile)
    profile_ctx.__enter__()
    # pipelined across pairs: pair i+1's decode+upload and pair i-1's
    # readback overlap pair i's cascade (uint8 at the boundary: 4x less
    # transfer). The pair generator is lazy — one pair decoded ahead.
    from collections import deque
    meta: deque = deque()

    def pair_gen():
        for i in range(len(dataset)):
            c, s, name = dataset[i]
            meta.append((name, c.shape))
            yield ((c * 255).astype(np.uint8), (s * 255).astype(np.uint8))

    keys = (dataset.pairs[i][1] for i in range(len(dataset)))

    def results():
        if len(dataset) == 1:
            # single pair (the reference's flagship UHD use): there is no
            # cross-pair pipeline to feed, so call stylize directly — the
            # engine's streamed final stage then overlaps the readback with
            # the last stage's compute (stylize_pairs keeps the monolithic
            # program, by design)
            (c, s), key = next(iter(zip(pair_gen(), keys)))
            yield engine.stylize(c, s, alpha=args.alpha,
                                 num_run=args.num_run, style_key=key,
                                 as_uint8=True)
        else:
            yield from engine.stylize_pairs(
                pair_gen(), alpha=args.alpha, num_run=args.num_run,
                style_keys=keys)

    t_prev = time.time()
    for i, out in enumerate(results()):
        name, cshape = meta.popleft()
        log("*" * 30 + f' #{i}: Transferred "{name}"')
        out_name = f"{args.log_mark}_mode={args.mode}_alpha={args.alpha}_{name}"
        save_image(out, os.path.join(args.outf, out_name))
        dt = time.time() - t_prev
        t_prev = time.time()
        total_t += dt
        tp.tick(cshape[0] * cshape[1])
        log(f"Elapsed time is: {dt:.4f} seconds")
    profile_ctx.__exit__(None, None, None)
    if len(dataset):
        log(f"Processed {len(dataset)} images. Average processing time per pair: "
            f"{total_t / len(dataset):.4f} seconds ({tp.report()})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
