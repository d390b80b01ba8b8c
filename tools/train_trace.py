"""Leaf-op trace attribution for the jit'd training step (r4 verdict item 7).

Profiles one warm wct_se stage-2 train step at batch 16 @256^2 (the
configuration bench.py times) and prints the same per-category device-time
attribution as tools/trace_attrib.py does for the inference cascade — the
question being whether the batched training convs pay the XLA relayout tax
the single-image path did before the r4 Pallas kernels (training runs the
XLA conv path: pallas_call has no autodiff rule, ops/conv.py routes only
inference there).

Usage:  python tools/train_trace.py [--mode wct_se] [--stage 2] [--batch 16]
                                    [--top 25] [--bf16]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_attrib import categorize, device_op_totals  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="wct_se")
    ap.add_argument("--stage", type=int, default=2)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from collaborative_distillation_tpu.models.specs import (
        decoder_spec, encoder_spec)
    from collaborative_distillation_tpu.models.vgg import init_params
    from collaborative_distillation_tpu.train.trainer import (
        TrainConfig, Trainer)

    k1, k2, k3, k4 = jax.random.split(jax.random.key(1), 4)
    be = init_params(encoder_spec("original", args.stage), k1)
    bd = init_params(decoder_spec("original", args.stage), k2)
    se = init_params(encoder_spec("16x", args.stage, aux=True), k3)
    tr = Trainer(TrainConfig(mode=args.mode, stage=args.stage,
                             batch_size=args.batch,
                             compute_dtype="bfloat16" if args.bf16
                             else "float32"),
                 se, {"be": be, "bd": bd})
    batch = jax.random.uniform(k4, (args.batch, 256, 256, 3), jnp.float32)

    def step():
        losses, _ = tr.train_step(batch)
        return float(next(iter(losses.values())))

    t0 = time.time()
    step()
    print(f"warm-up (compile): {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    step()
    wall = time.time() - t0
    print(f"warm wall: {wall:.3f}s", file=sys.stderr)

    logdir = args.logdir or tempfile.mkdtemp(prefix="cdtpu_train_trace_")
    jax.profiler.start_trace(logdir)
    step()
    jax.profiler.stop_trace()

    totals, counts = device_op_totals(logdir)
    dev_total = sum(totals.values()) / 1e6
    print(f"\ndevice op total: {dev_total:.3f}s (warm wall {wall:.3f}s)")
    cats = collections.Counter()
    for name, dur in totals.items():
        cats[categorize(name)] += dur
    print("\n== by category ==")
    for cat, dur in cats.most_common():
        print(f"{dur / 1e6:8.3f}s  "
              f"{100 * dur / max(sum(totals.values()), 1):5.1f}%  {cat}")
    print(f"\n== top {args.top} ops ==")
    for name, dur in totals.most_common(args.top):
        print(f"{dur / 1e6:8.3f}s  x{counts[name]:<5d} {name[:110]}")
    if not args.logdir:
        print(f"\n(trace kept at {logdir})", file=sys.stderr)


if __name__ == "__main__":
    main()
