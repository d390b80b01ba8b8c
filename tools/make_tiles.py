"""Build a multi-scale tile dataset for the training-quality oracle.

COCO (the reference's training corpus, main.py:27) is not in the container;
this cuts the oracle's training set from the reference checkout's own images
instead. Two properties matter for the oracle to be honest and to transfer:

* **held-out eval**: the eval protocol scores in1-in4 *content* images
  (cli/eval.py, shorter-side 272 -> center-crop 256); those four files are
  excluded here entirely, so eval measures generalization, not memorization.
* **scale match**: eval downsamples whole scenes to 256 px (in1 is 2048^2,
  a 7.5x reduction -> spectrally dense crops). Tiles cut only at native UHD
  scale are smooth by comparison and train a student that under-fits exactly
  the frequencies eval probes. So each source image is rendered at a whole
  pyramid of scales (shorter side from native down to ~272, steps of 1.5x)
  and tiled at every level.

Usage:  python tools/make_tiles.py --out /tmp/sd_train2/data [--tile 300]
"""

from __future__ import annotations

import argparse
import os

from PIL import Image

SOURCES = [
    # everything in the checkout EXCEPT the four eval content images
    "/root/reference/PytorchWCT/style/in1.jpg",
    "/root/reference/PytorchWCT/style/in2.jpg",
    "/root/reference/PytorchWCT/style/in3.jpg",
    "/root/reference/PytorchWCT/style/in4.jpg",
    "/root/reference/PytorchWCT/stylized_results/"
    "fall_foliage_in_central_park_new_york_city-wallpaper-5120x2880+V1.jpg",
    "/root/reference/PytorchWCT/stylized_results/"
    "green_park-wallpaper-3840x2160+Vincent_2K.jpg",
    "/root/reference/PytorchWCT/content/UHD_content/"
    "green_park-wallpaper-3840x2160.jpg",
    "/root/reference/UHD_stylized.jpg",
]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/sd_train2/data")
    ap.add_argument("--tile", type=int, default=300,
                    help="tile side; train resizes shorter side to 300 then "
                         "random-crops 256, so 300 makes the resize a no-op")
    ap.add_argument("--min_short", type=int, default=272,
                    help="stop the pyramid when shorter side drops below this")
    ap.add_argument("--scale_step", type=float, default=1.5)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    t = args.tile
    n = 0
    for si, path in enumerate(SOURCES):
        img = Image.open(path).convert("RGB")
        w0, h0 = img.size
        scale = 1.0
        while min(w0, h0) * scale >= args.min_short:
            w, h = int(w0 * scale), int(h0 * scale)
            lvl = img.resize((w, h), Image.LANCZOS) if scale < 1.0 else img
            # final pyramid level: if the whole level fits in one tile-ish,
            # take the shorter-side-fit center instead of skipping it
            xs = list(range(0, max(w - t, 0) + 1, t)) or [0]
            ys = list(range(0, max(h - t, 0) + 1, t)) or [0]
            for y in ys:
                for x in xs:
                    tile = lvl.crop((x, y, min(x + t, w), min(y + t, h)))
                    if min(tile.size) < args.min_short and min(w, h) >= t:
                        continue  # thin border remnant
                    if min(tile.size) < 128:
                        continue
                    tile.save(os.path.join(
                        args.out, f"s{si}_{scale:.3f}_{y}_{x}.jpg"),
                        quality=95)
                    n += 1
            scale /= args.scale_step
    print(f"{n} tiles -> {args.out}")


if __name__ == "__main__":
    main()
