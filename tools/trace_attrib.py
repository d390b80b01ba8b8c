"""Leaf-op trace attribution for the fused UHD cascade.

Runs one warm execution of the engine's fused slab program under
``jax.profiler``, parses the perfetto trace, and prints per-op and
per-category device-time totals. This is the measurement behind the
"where the time goes" tables in docs/BENCHMARKS.md — committed so the
attribution is reproducible instead of ad hoc.

Usage:
    python tools/trace_attrib.py [--h 4096] [--w 10240] [--bf16]
                                 [--mode 16x] [--slab_rows 4096] [--top 30]

Only device-synthesized pixels are used (like bench.py phase 1) so the
numbers survive relay congestion.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CATEGORIES = [
    ("pallas conv3x3", re.compile(r"conv3x3_lane128|conv3x3_tiled|conv3x3_subin")),
    ("pallas conv1x1", re.compile(r"conv1x1_lane128")),
    ("pallas stats", re.compile(r"sum_gram|stats_kernel")),
    ("pallas pool/upsample", re.compile(r"packed_pool_lane|packed_upsample_lane")),
    ("xla conv", re.compile(r"^%?convolution|conv_general")),
    ("pool (reduce_window)", re.compile(r"reduce-window|reduce_window")),
    ("copy/relayout", re.compile(r"^%?(copy|transpose|bitcast-convert)")),
    ("scan writes (DUS)", re.compile(r"dynamic-update-slice|dynamic_update")),
    ("slice/gather", re.compile(r"^%?(slice|dynamic-slice|gather)")),
    ("pad/broadcast/concat", re.compile(r"^%?(pad|broadcast|concatenate)")),
    ("fusion (elementwise)", re.compile(r"^%?(fusion|loop_|input_)")),
    ("dot/eigh", re.compile(r"dot|eigh|cholesky|triangular")),
]

# container events whose duration double-counts their children (the whole
# program, the scan loops, host-side wrappers) — excluded from totals so
# category percentages are leaf-only
_CONTAINER = re.compile(
    r"^(jit_|while\.|\$|np\.asarray|body\.|condition\.)")


def categorize(name: str) -> str:
    for label, rx in CATEGORIES:
        if rx.search(name):
            return label
    return "other"


def device_op_totals(logdir: str):
    """Aggregate 'X' (complete) events on TPU op tracks of the trace."""
    paths = glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # map pid -> process name, (pid, tid) -> thread name
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    totals = collections.Counter()
    counts = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pn = pnames.get(e["pid"], "")
        tn = tnames.get((e["pid"], e.get("tid")), "")
        if "TPU" not in pn and "tpu" not in pn.lower():
            continue
        # op tracks are "XLA Ops"/"Steps"/etc; keep the op-level track only
        if "op" not in tn.lower() and "xla" not in tn.lower():
            continue
        if _CONTAINER.match(e["name"]):
            continue
        totals[e["name"]] += e["dur"]
        counts[e["name"]] += 1
    return totals, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=4096)
    ap.add_argument("--w", type=int, default=10240)
    ap.add_argument("--mode", default="16x")
    ap.add_argument("--slab_rows", type=int, default=4096)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--packed", default="auto", choices=["auto", "0", "1"],
                    help="width packing: auto = the engine's per-mode default")
    ap.add_argument("--synth", action="store_true",
                    help="random-weight pyramid (timing is weight-agnostic; "
                         "lets --mode original run without the external "
                         "teacher downloads, like bench.py)")
    ap.add_argument("--logdir", default=None,
                    help="keep the raw trace here instead of a tmpdir")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from collaborative_distillation_tpu.wct.engine import WCTEngine

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    pyramid = None
    if args.synth:
        from collaborative_distillation_tpu.models.specs import (
            decoder_spec, encoder_spec)
        from collaborative_distillation_tpu.models.vgg import init_params
        key = jax.random.key(0)
        pyramid = {}
        for s in (5, 4, 3, 2, 1):
            key, k1, k2 = jax.random.split(key, 3)
            es, ds = encoder_spec(args.mode, s), decoder_spec(args.mode, s)
            pyramid[s] = {"enc_spec": es, "dec_spec": ds,
                          "enc": init_params(es, k1), "dec": init_params(ds, k2)}
    packed = None if args.packed == "auto" else bool(int(args.packed))
    eng = WCTEngine(mode=args.mode, slab_rows=args.slab_rows, packed=packed,
                    fused=True, dtype=dtype, pyramid=pyramid)
    kc, ks = jax.random.split(jax.random.key(0))
    cd = jax.random.uniform(kc, (1, args.h, args.w, 3), jnp.float32).astype(dtype)
    sdev = jax.random.uniform(ks, (1, 2048, 2048, 3), jnp.float32).astype(dtype)
    fn, fparams = eng._fused_slab
    sd = eng._fused_style_stats(sdev, style_key="trace-dev")

    def force(x):
        return float(jnp.sum(x[0, ::97, ::97, 0].astype(jnp.float32)))

    t0 = time.time()
    force(fn(fparams, cd, sd, 1.0))
    print(f"warm-up (compile): {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    force(fn(fparams, cd, sd, 1.0))
    wall = time.time() - t0
    print(f"warm wall: {wall:.3f}s", file=sys.stderr)

    logdir = args.logdir or tempfile.mkdtemp(prefix="cdtpu_trace_")
    jax.profiler.start_trace(logdir)
    force(fn(fparams, cd, sd, 1.0))
    jax.profiler.stop_trace()

    totals, counts = device_op_totals(logdir)
    dev_total = sum(totals.values()) / 1e6
    print(f"\ndevice op total: {dev_total:.3f}s (warm wall {wall:.3f}s)")
    cats = collections.Counter()
    for name, dur in totals.items():
        cats[categorize(name)] += dur
    print("\n== by category ==")
    for cat, dur in cats.most_common():
        print(f"{dur / 1e6:8.3f}s  {100 * dur / max(sum(totals.values()), 1):5.1f}%  {cat}")
    print(f"\n== top {args.top} ops ==")
    for name, dur in totals.most_common(args.top):
        print(f"{dur / 1e6:8.3f}s  x{counts[name]:<5d} {name[:110]}")
    if not args.logdir:
        print(f"\n(trace kept at {logdir})", file=sys.stderr)


if __name__ == "__main__":
    main()
