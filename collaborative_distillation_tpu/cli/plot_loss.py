"""Plot training loss curves from experiment logs.

Working replacement for tools/plot_loss.py (which is bit-rotted in the
reference — it imports a ``smooth`` util that doesn't exist). Parses the
``E{epoch}S{step} name (*w): value | ...`` lines produced by cli/train.py
(same shape as the reference's LogHub output, main.py:115-119).

    python -m collaborative_distillation_tpu.cli.plot_loss \
        Experiments/*/weights/log_*.txt --out loss.png
"""

from __future__ import annotations

import argparse
import re
import sys

LOSS_RE = re.compile(r"([\w]+) \(\*[\d.e+-]+\): ([\d.e+-]+)")


def parse_log(path: str):
    """-> {loss_name: [(global_step_index, value), ...]}"""
    curves: dict[str, list[tuple[int, float]]] = {}
    idx = 0
    for line in open(path, errors="replace"):
        if "S" not in line or "|" not in line and "(*" not in line:
            continue
        m = re.search(r"E(\d+)S(\d+)", line)
        if not m:
            continue
        found = LOSS_RE.findall(line)
        if not found:
            continue
        for name, val in found:
            curves.setdefault(name, []).append((idx, float(val)))
        idx += 1
    return curves


def smooth(vals, window: int = 10):
    out, acc = [], []
    for v in vals:
        acc.append(v)
        if len(acc) > window:
            acc.pop(0)
        out.append(sum(acc) / len(acc))
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logs", nargs="+", help="log files (cli/train.py format)")
    ap.add_argument("--out", default="loss.png")
    ap.add_argument("--window", type=int, default=10, help="moving-average window")
    ap.add_argument("--logy", action="store_true")
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    plotted = 0
    for path in args.logs:
        curves = parse_log(path)
        for name, pts in curves.items():
            steps = [p[0] for p in pts]
            vals = smooth([p[1] for p in pts], args.window)
            label = name if len(args.logs) == 1 else f"{path.split('/')[-1]}:{name}"
            ax.plot(steps, vals, label=label)
            plotted += 1
    if not plotted:
        print("no loss lines found in the given logs", file=sys.stderr)
        return 1
    if args.logy:
        ax.set_yscale("log")
    ax.set_xlabel("logged step")
    ax.set_ylabel("loss (moving avg)")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out} ({plotted} curves)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
