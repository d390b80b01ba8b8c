"""Image prep utilities: center-crop-to-square and resize.

Replaces PytorchWCT/content/{crop_center.py,resize_img.py} with one CLI:

    python -m collaborative_distillation_tpu.cli.imgtools crop-center DIR
    python -m collaborative_distillation_tpu.cli.imgtools resize DIR --size 3840 2160
"""

from __future__ import annotations

import argparse
import os
import sys

from PIL import Image

from ..data.pipeline import is_img

Image.MAX_IMAGE_PIXELS = None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("crop-center", help="center-crop every image to a square")
    c.add_argument("dir")
    c.add_argument("--suffix", default="_cropped")
    r = sub.add_parser("resize", help="resize every image to an exact size")
    r.add_argument("dir")
    r.add_argument("--size", nargs=2, type=int, required=True, metavar=("W", "H"))
    r.add_argument("--suffix", default="_resized")
    args = ap.parse_args(argv)

    for name in sorted(os.listdir(args.dir)):
        if not is_img(name) or args.suffix in name:
            continue
        path = os.path.join(args.dir, name)
        img = Image.open(path).convert("RGB")
        stem, ext = os.path.splitext(path)
        if args.cmd == "crop-center":
            w, h = img.size
            side = min(w, h)
            left, top = (w - side) // 2, (h - side) // 2
            out = img.crop((left, top, left + side, top + side))
        else:
            out = img.resize(tuple(args.size))
        out_path = f"{stem}{args.suffix}{ext}"
        out.save(out_path)
        print(f"{path} {img.size} -> {out_path} {out.size}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
