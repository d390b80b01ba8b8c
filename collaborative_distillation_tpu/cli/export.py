"""Export a trained student from a trainer checkpoint into the weight store.

The reference saves ``{"epoch": E, "model": state_dict}`` pickles that its
inference CLI then loads by path (main.py:129-134, WCT.py:36-75). Here the
equivalent hand-off is: ``cli/train.py`` writes a full trainer checkpoint
(params + Adam state + meta, ``utils/checkpoint.py``); this tool extracts
just the student params and writes a weight-store stage file
(``16x/d{k}.npz`` layout, models/zoo.py docstring) that ``cli/eval.py`` /
``cli/stylize.py`` / ``cli/train.py --SE/--SD`` consume directly.

    python -m collaborative_distillation_tpu.cli.export \
        Experiments/<run>/weights/<ckpt>.npz --out weights/16x/d1.npz
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def export_student(ckpt_path: str, out_path: str) -> dict:
    """Extract ``params/`` leaves from a trainer checkpoint into a stage npz.

    Returns the checkpoint's meta dict (mode/stage/epoch/step) for logging.
    """
    if not ckpt_path.endswith(".npz"):
        ckpt_path += ".npz"
    with np.load(ckpt_path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    params = {k[len("params/"):]: v for k, v in flat.items()
              if k.startswith("params/")}
    if not params:
        raise SystemExit(f"{ckpt_path} has no 'params/' leaves — not a "
                         f"trainer checkpoint (keys: {sorted(flat)[:5]}...)")
    meta = {}
    for k, v in flat.items():
        if k.startswith("meta/"):
            name = k[len("meta/"):]
            if name.endswith("__json__"):
                meta[name[:-len("/__json__")].rstrip("/")] = json.loads(str(v[0]))
            else:
                meta[name] = v.item() if v.ndim == 0 else v
    import os
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez(out_path, **params)
    return meta


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt", help="trainer checkpoint (.npz) from cli/train.py")
    ap.add_argument("--out", required=True,
                    help="weight-store stage file to write, e.g. weights/16x/d1.npz")
    args = ap.parse_args(argv)
    meta = export_student(args.ckpt, args.out)
    print(f"exported student params -> {args.out}  (ckpt meta: {meta})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
