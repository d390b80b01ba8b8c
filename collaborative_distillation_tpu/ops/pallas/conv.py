"""Pallas TPU kernel: direct reflect-padded 3x3 conv in the native layout.

Why this exists: XLA lowers the cascade's N=1, huge-spatial convs by
relaying out each feature map into a batched ``[H, 8, W/8*f, C]`` form and
back, per conv, and picks exotic feature-map layouts ({3,0,2,1:T(2,128)})
that force copies between ops. Measured on the v5e (differenced fori_loop,
r3): every packed UHD conv runs at ~43 TFLOP/s — 22% of the bf16 MXU peak —
while touching HBM at only ~76 GB/s, i.e. neither compute- nor bandwidth-
bound, just layout-copy-bound. This kernel computes the conv directly in
the native (H, W, C) layout as 9 shifted (BH*W, Cin) @ (Cin, Cout) MXU dots
per row-block and runs at the MXU floor (measured 162 TFLOP/s-equivalent;
9.6 ms vs XLA's 35.2 ms at the full-res lane-dense UHD shape).

It is also PADLESS: the reflect/packed padding the XLA path materialises
(three chained full-map pads cost ~15 ms at UHD — twice the kernel itself)
is replaced by (a) H-halo handling in the DMA source offsets (edge blocks
re-read the reflected row) and (b) a tiny precomputed (H+2, 16, C) pad-
column array composed into the VMEM window. HBM traffic is exactly one
read of the input map and one write of the output.

Scope: square 3x3, stride 1, single image, Cin/Cout <= 128 (one lane tile —
covers every conv the width-packed student pipeline produces: the packing
plan keeps the hot maps lane-dense at 128 and the transition layers at
12/24/64/96). Anything else falls back to XLA (ops/packed.py:packed_conv3x3).

Reference parity: same math as the reference's ReflectionPad2d+Conv2d(3x3)
blocks (model/model_original.py:434-450) in packed space; equivalence vs
the XLA path is pinned in tests/test_pallas_conv.py.
"""

from __future__ import annotations

import functools
import os
import warnings

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv1x1_lane128", "conv3x3_lane128", "conv3x3_subin",
           "conv3x3_tiled",
           "make_pad_columns", "pick_block_h", "pick_block_h_1x1",
           "pick_subin", "pick_tiles_3x3", "supported",
           "pallas_conv_enabled", "disable_pallas_conv", "kernel_compiles",
           "try_conv1x1_pallas", "try_conv3x3_tiled"]

_LANES = 128
_EDGE = 16  # window column where the interior starts; also the pad-array W
# VMEM budget for the block-size chooser. The chip has ~16 MB/core of VMEM;
# Mosaic's measured stack overhead on top of the declared buffers is ~2.7 MB
# at the UHD width, and the ~13.5 MB bh=4 config compiles and runs at the
# MXU floor while a second shift buffer (+2 MB) tipped it over the 16 MB
# scoped-VMEM limit.
_VMEM_BUDGET = 14 * 1024 * 1024


def _lanes(c: int) -> int:
    """VMEM footprint rounds the minor dim up to the 128-lane tile."""
    return -(-c // _LANES) * _LANES


_FORCE_OFF = False  # runtime kill switch (engine degradation ladder)


def pallas_conv_enabled() -> bool:
    """Master gate for every Pallas conv route.

    OFF when (a) `disable_pallas_conv()` was called (the engine's
    degradation ladder flips it after a compiler/runtime failure so the
    rebuilt programs cannot contain the failed kernel), or (b) the
    `CD_TPU_PALLAS_CONV` / `CD_TPU_PALLAS` env knobs say so (user kill
    switch, checked per call so tests/serving can flip it live)."""
    if _FORCE_OFF:
        return False
    for var in ("CD_TPU_PALLAS_CONV", "CD_TPU_PALLAS"):
        if os.environ.get(var, "1").strip().lower() in ("0", "off", "false"):
            return False
    return True


def _subdense_enabled() -> bool:
    """A/B knob for the native sub-dense tiled-conv route
    (CD_TPU_SUBDENSE=0 restores the channel-padded route everywhere)."""
    return os.environ.get("CD_TPU_SUBDENSE", "1").strip().lower() not in (
        "0", "off", "false")


def disable_pallas_conv(reason: str = "") -> None:
    """Permanently (for this process) route every conv to the XLA lowering.

    Called by the WCT engine's fallback ladder: a Pallas kernel that failed
    to compile/execute once would fail again identically inside the rebuilt
    per-stage programs, so the ladder must step to a configuration that
    cannot contain it."""
    global _FORCE_OFF
    if not _FORCE_OFF:
        _FORCE_OFF = True
        warnings.warn(
            f"Pallas conv kernels disabled for this process"
            f"{': ' + reason if reason else ''}; using XLA conv lowering",
            RuntimeWarning)


def enable_pallas_conv() -> None:
    """Re-arm the Pallas conv routes after ``disable_pallas_conv``.

    The process-global kill is deliberately coarse (a kernel that crashed the
    compiler once would crash it again in any rebuilt program containing the
    same shape), but it also drags down OTHER engines in the process whose
    kernels were fine — e.g. a student engine after a teacher-width failure.
    A host that knows the failing engine is gone (serving rotated it out, a
    test finished) calls this to restore Pallas routing; the per-shape
    ``kernel_compiles`` probe cache still remembers exactly which shapes
    failed, so re-enabling cannot resurrect the crashed kernel itself."""
    global _FORCE_OFF
    _FORCE_OFF = False


_PROBE_CACHE: dict = {}


def kernel_compiles(jitted, arg_shapes, **statics) -> bool:
    """AOT compile probe: does this Pallas kernel actually lower + compile
    for these shapes on the real backend?

    Why it exists (round-3 postmortem, BENCH_r03): the block pickers model
    Mosaic's VMEM stack analytically, and an under-estimate surfaces only as
    a scoped-VMEM OOM at *outer-program* compile time — crashing the whole
    fused cascade for a kernel that has a perfectly good XLA fallback. The
    probe compiles the standalone kernel once per distinct shape (cached for
    the process; the persistent compilation cache makes repeats cheap across
    processes) BEFORE the router commits to it; a failure routes that shape
    to XLA instead of poisoning the enclosing program.

    ``arg_shapes``: jax.ShapeDtypeStruct per positional arg. Probing is
    skipped (returns True) off-TPU and under CD_TPU_PALLAS_PROBE=0 — the
    interpret-mode CPU tests never hit Mosaic."""
    if jax.default_backend() != "tpu":
        return True
    if os.environ.get("CD_TPU_PALLAS_PROBE", "1").strip().lower() in (
            "0", "off", "false"):
        return True
    key = (getattr(jitted, "__name__", str(jitted)),
           tuple((tuple(a.shape), str(a.dtype)) for a in arg_shapes),
           tuple(sorted(statics.items())))
    hit = _PROBE_CACHE.get(key)
    if hit is not None:
        return hit
    try:
        jitted.lower(*arg_shapes, **statics).compile()
        ok = True
    except Exception as e:  # noqa: BLE001 — any lowering failure means "use XLA"
        warnings.warn(
            f"Pallas kernel {key[0]} failed to compile at "
            f"{[tuple(a.shape) for a in arg_shapes]} {statics} "
            f"({type(e).__name__}: {str(e)[:300]}); routing this shape to "
            f"the XLA conv path", RuntimeWarning)
        ok = False
    _PROBE_CACHE[key] = ok
    return ok


def _vmem_estimate(bh: int, wp: int, cin: int, cout: int,
                   in_itemsize: int, out_itemsize: int,
                   staged: bool = True) -> int:
    li, lo = _lanes(cin), _lanes(cout)
    win = 2 * (bh + 2) * (wp + 2 * _EDGE) * li * in_itemsize
    stage = 2 * (bh + 2) * _EDGE * li * in_itemsize
    shift = (bh + 2) * wp * li * in_itemsize if staged else 0
    acc = bh * wp * lo * 4
    out = 2 * bh * wp * lo * out_itemsize
    w = 9 * li * lo * in_itemsize
    return win + stage + shift + acc + out + w


def pick_block_h(h: int, wp: int, cin: int, cout: int,
                 in_itemsize: int, out_itemsize: int,
                 staged: bool = True) -> int | None:
    """Largest row-block in {16, 8, 4, 2, 1} that divides ``h`` and fits the
    VMEM budget; None when even 1 row does not fit (W too large)."""
    for bh in (16, 8, 4, 2, 1):
        if h % bh == 0 and _vmem_estimate(
                bh, wp, cin, cout, in_itemsize, out_itemsize,
                staged) <= _VMEM_BUDGET:
            return bh
    return None


def supported(h: int, wp: int, cin: int, cout: int,
              itemsize: int) -> tuple[int, bool] | None:
    """Return ``(row_block, staged)`` when the kernel handles this shape,
    else None. Requirements: channels within one lane tile, W a multiple of
    the sublane tile (the aligned center-tap view and the DMA destination
    need it), enough rows for the reflect halo, and a VMEM-feasible block.

    ``staged=True`` (preferred) copies the misaligned +-1 column taps into a
    shift scratch once per block (measured 7.8 vs 22.7 ms at the full-res
    UHD shape). When that scratch does not fit — f32 at wp=2560, the
    full-res stage-1 maps — the LAZY variant drops it and re-materializes
    the shifts per dot: slower than staged, but still well ahead of the
    XLA fallback conv (45 ms + pad/relayout plumbing at that shape, r3
    trace)."""
    sub = 8 if itemsize == 4 else 16
    if cin > _LANES or cout > _LANES or wp % sub or wp < 4 or h < 2:
        return None
    bh = pick_block_h(h, wp, cin, cout, itemsize, itemsize, staged=True)
    if bh is not None:
        return bh, True
    bh = pick_block_h(h, wp, cin, cout, itemsize, itemsize, staged=False)
    if bh is not None:
        return bh, False
    return None


def make_pad_columns(x: jax.Array, f: int) -> jax.Array:
    """(H, W, C) map -> (H+2, 16, C) pad-column array: col 0 = the packed-
    reflect LEFT pad column, col 1 = RIGHT, rows H-reflect-padded.

    Mirrors ops/packed.py:_reflect_pad_w_packed: for f > 1 only one phase
    block of each pad column is ever read by the taps (left: phase f-1 <-
    interior col 0 phase 1; right: phase 0 <- interior col W-1 phase f-2);
    for f == 1 the pads are the plain reflection columns. O(H) work — the
    whole point is that no full-map pad is ever materialised.
    """
    h, wp, fc = x.shape
    if f == 1:
        lp = x[:, 1:2, :]
        rp = x[:, wp - 2:wp - 1, :]
    else:
        c = fc // f
        lp = jnp.zeros((h, 1, fc), x.dtype)
        lp = lp.at[:, :, (f - 1) * c:].set(x[:, 0:1, c:2 * c])
        rp = jnp.zeros((h, 1, fc), x.dtype)
        rp = rp.at[:, :, :c].set(x[:, wp - 1:wp, (f - 2) * c:(f - 1) * c])
    plr = jnp.concatenate([lp, rp], axis=1)                      # (H, 2, C)
    plr = jnp.concatenate([plr[1:2], plr, plr[h - 2:h - 1]], axis=0)
    return jnp.pad(plr, ((0, 0), (0, _EDGE - 2), (0, 0)))


def _conv_kernel(x_hbm, plr_hbm, w_ref, b_ref, o_ref, xwin, pstage, *scratch,
                 bh: int, wp: int, h: int, relu: bool, staged: bool):
    if staged:
        xs, sems = scratch
    else:
        xs, (sems,) = None, scratch
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    cout = o_ref.shape[-1]

    def dmas(slot, blk):
        # padded rows [blk*bh, blk*bh + bh + 2): core rows + 1-row reflect
        # halos (edge blocks re-read the mirrored interior row), plus the
        # pad-column rows for the same padded range.
        top = jnp.where(blk == 0, 1, blk * bh - 1)
        bot = jnp.where(blk == nb - 1, h - 2, blk * bh + bh)
        return (
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(blk * bh, bh)],
                xwin.at[slot, pl.ds(1, bh), pl.ds(_EDGE, wp)],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(top, 1)],
                xwin.at[slot, pl.ds(0, 1), pl.ds(_EDGE, wp)],
                sems.at[slot, 1]),
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(bot, 1)],
                xwin.at[slot, pl.ds(bh + 1, 1), pl.ds(_EDGE, wp)],
                sems.at[slot, 2]),
            pltpu.make_async_copy(
                plr_hbm.at[pl.ds(blk * bh, bh + 2)],
                pstage.at[slot],
                sems.at[slot, 3]),
        )

    @pl.when(i == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    @pl.when(i + 1 < nb)
    def _():
        for d in dmas((i + 1) % 2, i + 1):
            d.start()

    slot = i % 2
    for d in dmas(slot, i):
        d.wait()

    # compose the pad columns flush against the interior: left at _EDGE-1,
    # right at _EDGE+wp (single-column VPU stores — small)
    xwin[slot, :, _EDGE - 1:_EDGE, :] = pstage[slot, :, 0:1, :]
    xwin[slot, :, _EDGE + wp:_EDGE + wp + 1, :] = pstage[slot, :, 1:2, :]

    xb = xwin[slot]  # (bh+2, wp+32, cin)
    # dx-tap staging. The center tap is sublane-aligned — a free view (its
    # (bh, wp) -> (bh*wp) merge is a pure relabeling because wp is a
    # multiple of the sublane tile). dx=+-1 are misaligned sublane shifts:
    # copy each ONCE into scratch — left as lazy slices, Mosaic re-
    # materializes the shift per dot (measured 22.7 ms vs 7.8 ms for the
    # whole conv at the full-res UHD shape). ONE scratch, reused: each
    # tap's dots complete before the next staging write, and a second
    # buffer tipped Mosaic's stack over the 16 MB scoped-VMEM limit at
    # bh=4. DMA-engine shifts are not an option: Mosaic requires DMA
    # slice offsets to be tile-aligned.
    cin = xb.shape[-1]
    acc = jnp.zeros((bh * wp, cout), jnp.float32)
    for kx in range(3):
        if kx == 1:
            v3 = xb[:, _EDGE:_EDGE + wp, :]
        elif staged:
            xs[:] = xb[:, _EDGE - 1 + kx:_EDGE - 1 + kx + wp, :]
            v3 = xs[:]
        else:
            # lazy slice: Mosaic re-materializes the sublane shift per dot
            # (VMEM-tight shapes only — see supported())
            v3 = xb[:, _EDGE - 1 + kx:_EDGE - 1 + kx + wp, :]
        for ky in range(3):
            v = v3[ky:ky + bh].reshape(bh * wp, cin)
            acc += jnp.dot(v, w_ref[3 * ky + kx],
                           preferred_element_type=jnp.float32)
    acc = acc + b_ref[0]
    if relu:
        acc = jnp.maximum(acc, 0)
    o_ref[:] = acc.reshape(bh, wp, cout).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("relu", "block_h", "staged", "interpret"))
def conv3x3_lane128(x: jax.Array, plr: jax.Array, w9: jax.Array,
                    b: jax.Array | None, *, relu: bool = True, block_h: int,
                    staged: bool = True, interpret: bool = False) -> jax.Array:
    """Reflect-padded 3x3 conv on an UNPADDED (H, W, Cin) map -> (H, W, Cout).

    ``plr``: the (H+2, 16, Cin) pad-column array from :func:`make_pad_columns`.
    ``w9``: (9, Cin, Cout) tap-major (ky*3+kx) weights; ``b``: (Cout,) or
    None. Accumulates in f32 on the MXU, emits ``x.dtype`` (the conv2d
    contract: bf16 in -> bf16 out with f32 accumulation inside).
    """
    h, wp, cin = x.shape
    _, wcin, cout = w9.shape
    assert w9.shape[0] == 9 and wcin == cin, (x.shape, w9.shape)
    assert plr.shape == (h + 2, _EDGE, cin), plr.shape
    assert h % block_h == 0, (h, block_h)
    bias = (jnp.zeros((1, cout), jnp.float32) if b is None
            else b.reshape(1, cout).astype(jnp.float32))
    kernel = functools.partial(_conv_kernel, bh=block_h, wp=wp, h=h,
                               relu=relu, staged=staged)
    scratch = [
        pltpu.VMEM((2, block_h + 2, wp + 2 * _EDGE, cin), x.dtype),
        pltpu.VMEM((2, block_h + 2, _EDGE, cin), x.dtype),
    ]
    if staged:
        scratch.append(pltpu.VMEM((block_h + 2, wp, cin), x.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2, 4)))
    return pl.pallas_call(
        kernel,
        grid=(h // block_h,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),      # pad columns, HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # 9 weight tiles
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec((block_h, wp, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, wp, cout), x.dtype),
        scratch_shapes=scratch,
        name="conv3x3_lane128",
        interpret=interpret,
    )(x, plr.astype(x.dtype), w9.astype(x.dtype), bias)


def _conv1x1_kernel(x_ref, w_ref, b_ref, o_ref, *, relu: bool):
    bh, bw, cin = x_ref.shape
    # f32 inputs: HIGHEST — the 1x1 is HBM-bound (85 GFLOP vs a ~6 ms map
    # read at the largest cascade shape), so the extra MXU passes are free
    # and the WCT-apply keeps the exact-GEMM contract of the XLA path it
    # replaced (models/packed_vgg.py:packed_wct_apply; default-precision
    # A/B measured 2e-3 relative error). bf16 inputs keep the bf16 pass.
    prec = (jax.lax.Precision.HIGHEST if x_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y = jnp.dot(x_ref[:].reshape(bh * bw, cin), w_ref[:], precision=prec,
                preferred_element_type=jnp.float32) + b_ref[0]
    if relu:
        y = jnp.maximum(y, 0)
    o_ref[:] = y.reshape(bh, bw, o_ref.shape[-1]).astype(o_ref.dtype)


def _vmem_estimate_1x1(bh: int, wp: int, itemsize: int) -> int:
    """Mosaic VMEM model for the 1x1 kernel, calibrated against the one
    measured compiler data point we have (BENCH_r03's scoped-VMEM OOM):
    bh=4, wp=1280, f32 -> "18.45M" actual Mosaic stack = 19.35 MB (XLA's
    HumanReadableNumBytes "M" is MiB; the "16.00M" limit is the 16 MiB
    scoped-VMEM default). Analytic components, in block elements
    (bh*wp*128):

      2 pipelined input blocks        2*itemsize
      2 pipelined output blocks       2*itemsize
      x_ref[:] load/reshape copy      itemsize
      f32 dot output                  4
      HIGHEST multi-pass staging      4   (f32 inputs only — bf16 runs one
                                           DEFAULT-precision pass)

    f32: 28 B/elem analytic -> 18.48 MB at the crash shape; the compiler's
    measured stack is 19.35 MB, so a flat 5% Mosaic-overhead factor is
    applied on top (19.41 MB modeled >= 19.35 measured, within 0.4%). The
    round-3 model (20 B/elem, no overhead) predicted 13.1 MB there and
    shipped the crash; this one picks bh=2 (9.6 MB) at that shape. The AOT
    compile probe in try_conv1x1_pallas backstops any residual miss."""
    per = 2 * itemsize + 2 * itemsize + itemsize + 4 + (4 if itemsize == 4 else 0)
    analytic = bh * wp * _LANES * per + 2 * _LANES * (_LANES * itemsize + 4)
    return int(analytic * 1.05)


def pick_block_h_1x1(h: int, wp: int, itemsize: int) -> tuple[int, int] | None:
    """(block_h, block_w) for the 1x1 kernel, or None.

    The 1x1 needs no halos, so W blocking is a free second axis: wide maps
    (the f=2-packed teacher's wp=5120 full-res rows, which no whole-row
    block fits) split into sublane-aligned column blocks instead of falling
    back to XLA. Whole rows are preferred (fewer grid steps)."""
    sub = 8 if itemsize == 4 else 16
    bws = [wp] + [wp // d for d in (2, 4, 8)
                  if wp % d == 0 and (wp // d) % sub == 0]
    for bw in bws:
        for bh in (16, 8, 4, 2, 1):
            if h % bh == 0 and _vmem_estimate_1x1(bh, bw, itemsize) <= _VMEM_BUDGET:
                return bh, bw
    return None


@functools.partial(jax.jit, static_argnames=(
    "relu", "block_h", "block_w", "interpret"))
def conv1x1_lane128(x: jax.Array, w: jax.Array, b: jax.Array | None, *,
                    relu: bool = False, block_h: int, block_w: int = 0,
                    interpret: bool = False) -> jax.Array:
    """1x1 conv (pure per-pixel matmul) on a (H, W, 128) map.

    Covers the encoders' packed ``conv0`` preprocessing layer (reference
    model_original.py conv0, kron-packed in models/packed_vgg.py), which XLA
    otherwise runs as a convolution in its exotic {3,0,2,1} layout — forcing
    ~12 ms transpose copies against the Pallas 3x3 calls on either side.
    Channels must be lane-dense (pad to 128 outside, like packed_conv3x3).
    ``block_w``: column-block size (0 = whole rows); a 1x1 has no halos, so
    W blocking is exact — it is what fits the f=2-packed teacher's wp=5120
    full-res maps.

    Sub-dense channel counts (96/64/24 — the 16x stage-1 boundary widths)
    are accepted natively: unlike the 3x3 kernels, every buffer here moves
    through BlockSpec pipelines (no manual DMA), and Mosaic handles sub-
    lane-tile minor dims there the same way the fused stats kernel already
    relies on (ops/pallas/stats.py). That removes the 128-lane zero-pad +
    slice-back copies entirely for the stage-1 WCT apply.
    """
    h, wp, cin = x.shape
    cout = w.shape[-1]
    bw = block_w or wp
    sub = 8 if x.dtype.itemsize == 4 else 16
    assert cin <= _LANES and cin % sub == 0, (x.shape,)
    assert cout <= _LANES and cout % sub == 0, (w.shape,)
    assert h % block_h == 0 and wp % bw == 0, (x.shape, block_h, bw)
    bias = (jnp.zeros((1, cout), jnp.float32) if b is None
            else b.reshape(1, cout).astype(jnp.float32))
    return pl.pallas_call(
        functools.partial(_conv1x1_kernel, relu=relu),
        grid=(h // block_h, wp // bw),
        in_specs=[
            pl.BlockSpec((block_h, bw, cin), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_h, bw, cout), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, wp, cout), x.dtype),
        name="conv1x1_lane128",
        interpret=interpret,
    )(x, w.astype(x.dtype), bias)


def try_conv1x1_pallas(x: jax.Array, w: jax.Array, b: jax.Array | None,
                       *, relu: bool = False) -> jax.Array | None:
    """Shared router for every Pallas 1x1-conv candidate (the single gate
    the round-3 advisor asked for — ops/packed.py:packed_conv1x1 and
    models/packed_vgg.py:packed_wct_apply previously duplicated it).

    ``x``: (1, H, Wp, FC) single-image map; ``w``: (FC, FCo); ``b``: (FCo,)
    or None. Returns the (1, H, Wp, FCo) result, or None when the kernel
    does not apply (wrong backend, kill switch, batch > 1, channels beyond
    one lane tile, misaligned W, no VMEM-feasible block, or the AOT compile
    probe rejected the shape) — the caller then uses the XLA conv lowering.

    Sub-lane-tile channel counts that are sublane-aligned (96/64/24 at f32)
    run natively — no pad, no slice (see conv1x1_lane128); anything else
    is zero-padded to the 128-lane tile around the kernel (zero weight
    columns keep the math exact)."""
    n, h, wp, fc = x.shape
    fco = w.shape[-1]
    if not (n == 1 and fc <= _LANES and fco <= _LANES
            and pallas_conv_enabled() and jax.default_backend() == "tpu"):
        return None
    sub = 8 if x.dtype.itemsize == 4 else 16
    if wp % sub:
        return None
    plan = pick_block_h_1x1(h, wp, x.dtype.itemsize)
    if plan is None:
        return None
    bh, bw = plan
    ci_pad = 0 if fc % sub == 0 else -fc % _LANES
    co_pad = 0 if fco % sub == 0 else -fco % _LANES
    ci, co = fc + ci_pad, fco + co_pad
    if not kernel_compiles(
            conv1x1_lane128,
            (jax.ShapeDtypeStruct((h, wp, ci), x.dtype),
             jax.ShapeDtypeStruct((ci, co), x.dtype),
             jax.ShapeDtypeStruct((co,), jnp.float32)),
            relu=relu, block_h=bh, block_w=bw):
        return None
    xk = x[0]
    wk = w.reshape(fc, fco)
    bk = None if b is None else b.reshape(fco)
    if ci_pad:
        xk = jnp.pad(xk, ((0, 0), (0, 0), (0, ci_pad)))
        wk = jnp.pad(wk, ((0, ci_pad), (0, 0)))
    if co_pad:
        wk = jnp.pad(wk, ((0, 0), (0, co_pad)))
        if bk is not None:
            bk = jnp.pad(bk, (0, co_pad))
    if bk is None:
        bk = jnp.zeros((co,), jnp.float32)
    y = conv1x1_lane128(xk, wk, bk.astype(jnp.float32), relu=relu,
                        block_h=bh, block_w=bw)
    if co_pad:
        y = y[..., :fco]
    return y[None]


# ---------------------------------------------------------------------------
# General tiled direct conv — the teacher (original-VGG) widths.
#
# conv3x3_lane128 above holds whole (H, W) rows in VMEM and one lane tile of
# channels, which covers every *width-packed student* map but nothing the
# unpacked teacher cascade produces: its maps run up to (H, 10240, 64) at
# full res and (H/8, 1280, 512) at depth (reference model_original.py widths
# 64/128/256/512). This kernel tiles all three axes:
#
#   grid = (H/bh, W/bw, Cout/co_t, Cin/ci_t)   (ci fastest)
#
# * W blocks carry a ``sub``-column halo chunk on each side, fetched as
#   sublane-ALIGNED DMAs (Mosaic requires tile-aligned DMA offsets, so a
#   plain +-1-column fetch is impossible); only the single column adjacent
#   to the interior is ever read by the taps, and at the true image edges
#   that column is rewritten in-kernel with the reflect column (original
#   col 1 / W-2) — same padless contract as the lane128 kernel.
# * Cin tiles accumulate into an f32 VMEM scratch across the fastest grid
#   axis; the output block is written once, on the last Cin tile.
# * Cout tiles re-read the input window (nco passes over the map). In the
#   VGG ladder every nco>1 layer also has nci>1, so the re-read rides the
#   same DMAs the Cin loop needs anyway; co_t=256 is preferred when VMEM
#   allows to halve the passes.
#
# Reference math: ReflectionPad2d + Conv2d(3x3) + optional ReLU
# (model_original.py:434-450), bit-matched against ops/conv.py:conv3x3 in
# tests/test_pallas_conv.py.
# ---------------------------------------------------------------------------


def _vmem_estimate_tiled(bh: int, bw: int, sub: int, ci_t: int, co_t: int,
                         itemsize: int, nci: int = 1) -> int:
    li, lo = _lanes(ci_t), _lanes(co_t)
    win = 2 * (bh + 2) * (bw + 2 * sub) * li * itemsize
    pstage = 2 * (bh + 2) * _EDGE * li * itemsize
    stage = (bh + 2) * bw * li * itemsize
    # f32 accumulation values: nci == 1 holds one live block (`part`);
    # nci > 1 holds three (`part`, the `total` select, and the `acc`
    # scratch). Calibrated on-chip: at (272, 2560, 256 -> 128) bf16 the
    # bh*bw = 5120 configs (one-buffer model: 13.6 MB <= budget) crash the
    # compiler while every bh*bw = 2560 config compiles — exactly the
    # three-buffer model's cut line (19.6 vs 11.3 MB).
    acc = (3 if nci > 1 else 1) * bh * bw * lo * 4
    out = 2 * bh * bw * lo * itemsize
    wts = 2 * 9 * li * lo * itemsize
    # 15% Mosaic-stack margin (the round-3 lesson: model the compiler's
    # overhead, don't trust the raw buffer sum); kernel_compiles() backstops.
    return int((win + pstage + stage + acc + out + wts) * 1.15)


def pick_tiles_3x3(h: int, w: int, cin: int, cout: int,
                   itemsize: int) -> tuple[int, int, int, int] | None:
    """Choose ``(block_h, block_w, ci_tile, co_tile)`` for conv3x3_tiled,
    or None when the shape is out of scope (lane-sparse channels, misaligned
    W, or nothing fits VMEM)."""
    sub = 8 if itemsize == 4 else 16
    if h < 2 or w < 2 * sub or w % sub:
        return None
    # Mosaic's lane-alignment restriction ("slice shape along dimension 2
    # must be aligned to tiling (128)") binds only DMA lane-dim SLICES —
    # which this kernel issues only on multi-tile cin (nci > 1). Sub-dense
    # channel counts (cin/cout < 128: the packed pipeline's 12/24/64/96
    # transition maps) therefore run NATIVELY as single sub-dense tiles:
    # every DMA copies the whole minor dim, VMEM physically pads the lane
    # tile for free, and no full-map channel pad/slice is materialised in
    # HBM (those pads were 20% of the r4 UHD trace). Multi-tile channel
    # counts must stay whole-lane-tile multiples.
    if (cin % 128 and cin > 128) or (cout % 128 and cout > 128):
        return None
    ci_t = min(cin, 128)
    if cout % 128:
        co_opts = [cout]
    elif cout % 256 == 0 and cin >= 256:
        co_opts = [256, 128]
    else:
        co_opts = [min(cout, 128)]
    bws = [d for d in range(sub, min(w, 2560) + 1, sub) if w % d == 0]
    fallback = None
    for co_t in co_opts:
        cand = None
        for bw in bws:
            for bh in (16, 8, 4, 2, 1):
                if h % bh == 0 and _vmem_estimate_tiled(
                        bh, bw, sub, ci_t, co_t, itemsize,
                        nci=cin // ci_t) <= _VMEM_BUDGET:
                    if cand is None or (bh * bw, bw) > (cand[0] * cand[1], cand[1]):
                        cand = (bh, bw)
                    break  # bh descending: first fit is the largest for this bw
        if cand is not None:
            if cand[0] * cand[1] >= 1024:
                return (cand[0], cand[1], ci_t, co_t)
            if fallback is None:
                fallback = (cand[0], cand[1], ci_t, co_t)
    return fallback


def _tiled_kernel(x_hbm, plr_hbm, w_ref, b_ref, o_ref, *refs, bh: int, bw: int,
                  h: int, w: int, sub: int, ci_t: int, nci: int, relu: bool):
    if nci > 1:
        xwin, pstage, xs, acc, sems = refs
    else:
        xwin, pstage, xs, sems = refs
        acc = None
    hb, wb, co, ci = (pl.program_id(i) for i in range(4))
    nh, nw, nco = pl.num_programs(0), pl.num_programs(1), pl.num_programs(2)
    flat = ((hb * nw + wb) * nco + co) * nci + ci
    nsteps = nh * nw * nco * nci

    def dmas(slot, hb2, wb2, ci2):
        # 3 row ranges (core + 1-row reflect halos, edge blocks re-read the
        # mirrored interior row) x 3 col ranges (core + sub-wide aligned halo
        # chunks; at W edges the chunk content is a placeholder re-read of a
        # valid aligned range — only its tap column is read, and that column
        # is rewritten with the precomputed pad column in-kernel below).
        top = jnp.where(hb2 == 0, 1, hb2 * bh - 1)
        bot = jnp.where(hb2 == nh - 1, h - 2, hb2 * bh + bh)
        # W offsets are computed in sublane-tile units and multiplied out so
        # Mosaic can PROVE divisibility by the tiling (a jnp.where of two
        # multiples is not provably a multiple; "failed to prove that a tile
        # index in dimension 1 is divisible by the tiling (8)")
        lsrc = jnp.where(wb2 == 0, 0, wb2 * (bw // sub) - 1) * sub
        rsrc = jnp.where(wb2 == nw - 1, w // sub - 1,
                         wb2 * (bw // sub) + bw // sub) * sub
        rows = ((pl.ds(hb2 * bh, bh), pl.ds(1, bh)),
                (pl.ds(top, 1), pl.ds(0, 1)),
                (pl.ds(bot, 1), pl.ds(bh + 1, 1)))
        cols = ((pl.ds(wb2 * bw, bw), pl.ds(sub, bw)),
                (pl.ds(lsrc, sub), pl.ds(0, sub)),
                (pl.ds(rsrc, sub), pl.ds(sub + bw, sub)))
        out, k = [], 0
        for rs, rd in rows:
            for csrc, cdst in cols:
                # Mosaic requires lane-dim DMA slices to be 128-aligned in
                # size, so sub-tile ci (64) must copy the WHOLE minor dim —
                # only multi-tile cin (ci_t=128, aligned) slices it.
                src = (x_hbm.at[rs, csrc] if nci == 1
                       else x_hbm.at[rs, csrc, pl.ds(ci2 * ci_t, ci_t)])
                out.append(pltpu.make_async_copy(
                    src, xwin.at[slot, rd, cdst], sems.at[slot, k]))
                k += 1
        # pad columns for the same padded row range (left/right image-edge
        # columns; packed-reflect-aware — see make_pad_columns)
        psrc = (plr_hbm.at[pl.ds(hb2 * bh, bh + 2)] if nci == 1
                else plr_hbm.at[pl.ds(hb2 * bh, bh + 2), :,
                                pl.ds(ci2 * ci_t, ci_t)])
        out.append(pltpu.make_async_copy(psrc, pstage.at[slot],
                                         sems.at[slot, k]))
        return out

    @pl.when(flat == 0)
    def _():
        for d in dmas(0, 0, 0, 0):
            d.start()

    @pl.when(flat + 1 < nsteps)
    def _():
        nxt = flat + 1
        ci2 = nxt % nci
        r = nxt // nci
        r = r // nco        # co of the next step does not change its window
        wb2 = r % nw
        hb2 = r // nw
        for d in dmas(nxt % 2, hb2, wb2, ci2):
            d.start()

    slot = flat % 2
    for d in dmas(slot, hb, wb, ci):
        d.wait()

    # compose the precomputed pad columns at the true image edges
    # (single-column VPU stores; packed maps get the packed-reflect phase
    # structure, f=1 maps the plain reflection — make_pad_columns builds both)
    @pl.when(wb == 0)
    def _():
        xwin[slot, :, sub - 1:sub, :] = pstage[slot, :, 0:1, :]

    @pl.when(wb == nw - 1)
    def _():
        xwin[slot, :, sub + bw:sub + bw + 1, :] = pstage[slot, :, 1:2, :]

    xb = xwin[slot]  # (bh+2, bw+2*sub, ci_t)
    co_t = o_ref.shape[-1]
    part = jnp.zeros((bh * bw, co_t), jnp.float32)
    for kx in range(3):
        if kx == 1:
            v3 = xb[:, sub:sub + bw, :]  # aligned center tap: free view
        else:
            xs[:] = xb[:, sub - 1 + kx:sub - 1 + kx + bw, :]
            v3 = xs[:]
        for ky in range(3):
            v = v3[ky:ky + bh].reshape(bh * bw, ci_t)
            part = part + jnp.dot(v, w_ref[3 * ky + kx],
                                  preferred_element_type=jnp.float32)

    if nci > 1:
        total = jnp.where(ci == 0, part, acc[:] + part)

        @pl.when(ci + 1 < nci)
        def _():
            acc[:] = total
    else:
        total = part

    @pl.when(ci + 1 == nci)
    def _():
        y = total + b_ref[0].astype(jnp.float32)
        if relu:
            y = jnp.maximum(y, 0)
        o_ref[:] = y.reshape(bh, bw, co_t).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "relu", "block_h", "block_w", "ci_tile", "co_tile", "interpret"))
def conv3x3_tiled(x: jax.Array, plr: jax.Array, w9: jax.Array,
                  b: jax.Array | None, *,
                  relu: bool = True, block_h: int, block_w: int,
                  ci_tile: int, co_tile: int,
                  interpret: bool = False) -> jax.Array:
    """Reflect-padded 3x3 conv on an UNPADDED (H, W, Cin) map -> (H, W, Cout),
    tiled over H, W, Cin and Cout (teacher widths; see the section comment).

    ``plr``: the (H+2, 16, Cin) pad-column array from :func:`make_pad_columns`
    — plain reflection columns for unpacked maps (f=1), the packed-reflect
    phase structure for width-packed maps (f>1), so this kernel serves both
    the unpacked teacher cascade and the packed pipeline's wide shapes the
    whole-row kernel cannot hold.
    ``w9``: (9, Cin, Cout) tap-major (ky*3+kx); ``b``: (Cout,) or None.
    f32 accumulation on the MXU across all Cin tiles; emits ``x.dtype``.
    """
    h, w_, cin = x.shape
    _, wcin, cout = w9.shape
    assert w9.shape[0] == 9 and wcin == cin, (x.shape, w9.shape)
    assert plr.shape == (h + 2, _EDGE, cin), (plr.shape, x.shape)
    assert h % block_h == 0 and w_ % block_w == 0, (x.shape, block_h, block_w)
    assert cin % ci_tile == 0 and cout % co_tile == 0, (cin, cout, ci_tile, co_tile)
    sub = 8 if x.dtype.itemsize == 4 else 16
    nci = cin // ci_tile
    bias = (jnp.zeros((1, cout), jnp.float32) if b is None
            else b.reshape(1, cout).astype(jnp.float32))
    kernel = functools.partial(_tiled_kernel, bh=block_h, bw=block_w, h=h,
                               w=w_, sub=sub, ci_t=ci_tile, nci=nci, relu=relu)
    scratch = [
        pltpu.VMEM((2, block_h + 2, block_w + 2 * sub, ci_tile), x.dtype),
        pltpu.VMEM((2, block_h + 2, _EDGE, ci_tile), x.dtype),
        pltpu.VMEM((block_h + 2, block_w, ci_tile), x.dtype),
    ]
    if nci > 1:
        scratch.append(pltpu.VMEM((block_h * block_w, co_tile), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2, 10)))
    return pl.pallas_call(
        kernel,
        grid=(h // block_h, w_ // block_w, cout // co_tile, nci),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),      # pad columns, HBM
            pl.BlockSpec((9, ci_tile, co_tile),
                         lambda hb, wb, co, ci: (0, ci, co),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_tile), lambda hb, wb, co, ci: (0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_h, block_w, co_tile),
                               lambda hb, wb, co, ci: (hb, wb, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w_, cout), x.dtype),
        scratch_shapes=scratch,
        name="conv3x3_tiled",
        interpret=interpret,
    )(x, plr.astype(x.dtype), w9.astype(x.dtype), bias)


def try_conv3x3_tiled(x: jax.Array, w: jax.Array, b: jax.Array | None, *,
                      relu: bool = True, f: int = 1,
                      pad_channels: bool = False) -> jax.Array | None:
    """Router for the tiled kernel: NHWC single-image reflect-pad 3x3 convs
    — the unpacked teacher cascade's shape universe (f=1), plus the width-
    packed pipeline's wide maps the whole-row kernel cannot hold (f>1, e.g.
    the f=2-packed teacher's wp=5120 full-res rows). Returns the
    (1, H, W, Cout) result or None (caller falls back to the XLA lowering).

    ``pad_channels``: zero-pad sub-128 Cin/Cout to the lane tile around the
    kernel (zero weight rows/cols keep the math exact). Only the packed
    pipeline requests this — there the surrounding ops already hold the map
    in the C-minor (H, W, C) layout, so the pad is one lane-local copy; on
    an unpacked map XLA typically holds skinny-C tensors in W-minor layouts
    where the same pad would force a full relayout (the r4 teacher-trace
    lesson: layout coherence, not per-op speed, decides the win).

    Opt-in from inference paths only (pallas_call has no autodiff rule, so
    training call sites never route here — ops/conv.py:conv3x3 ``pallas``
    keyword)."""
    n, h, w_, cin = x.shape
    kh, kw_, wcin, cout = w.shape
    if not (n == 1 and kh == 3 and kw_ == 3 and wcin == cin
            and pallas_conv_enabled()
            and jax.default_backend() == "tpu"
            and x.dtype in (jnp.float32, jnp.bfloat16)):
        return None
    if not pad_channels and (cin % _LANES or cout % _LANES):
        # unpacked callers (ops/conv.py): XLA holds skinny-C maps W-minor,
        # where even a native sub-dense kernel call forces a full relayout
        # — the r4 teacher-trace lesson. Sub-dense routes are packed-only.
        return None
    ci_pad = (-cin % _LANES) if pad_channels else 0
    co_pad = (-cout % _LANES) if pad_channels else 0
    if ci_pad and _subdense_enabled():
        # Sub-dense INPUT: read the map natively via the BlockSpec-pipelined
        # kernel — the full-map zero-pad to 128 lanes this replaces was
        # EVERY pad in the r5 HEAD UHD trace (90 ms of 591 ms).
        plan = pick_subin(h, w_, cin, cout, x.dtype.itemsize)
        if plan is not None:
            bh2, bw2 = plan
            nh2 = h // bh2
            if kernel_compiles(
                    conv3x3_subin,
                    (jax.ShapeDtypeStruct((h, w_, cin), x.dtype),
                     jax.ShapeDtypeStruct((h + 2, _EDGE, cin), x.dtype),
                     jax.ShapeDtypeStruct((9, cin, cout), x.dtype),
                     jax.ShapeDtypeStruct((cout,), jnp.float32)),
                    relu=relu, block_h=bh2, block_w=bw2):
                xk = x[0]
                plr = make_pad_columns(xk, f)
                return conv3x3_subin(
                    xk, plr, w.reshape(9, cin, cout),
                    None if b is None else b.reshape(cout).astype(jnp.float32),
                    relu=relu, block_h=bh2, block_w=bw2)[None]
    if co_pad and _subdense_enabled():
        # Native sub-dense OUTPUT: the kernel emits cout < 128 as a single
        # sub-dense tile (see pick_tiles_3x3), killing the full-map
        # `y[..., :cout]` slice-back (plus the zero weight columns) on every
        # decoder narrowing conv — part of the 20%-pads/13%-copies third of
        # the r4 UHD trace. INPUT stays zero-padded to the lane tile: probed
        # on-chip (r5), every sub-128-lane manual-DMA window (ci_tile 24/64/
        # 96) crashes the Mosaic compiler subprocess, while every sub-dense
        # co_tile compiles — the restriction is the x-window DMA, not the
        # store. (The probe guards the attempt anyway.)
        tiles = pick_tiles_3x3(h, w_, cin + ci_pad, cout, x.dtype.itemsize)
        if tiles is not None:
            bh, bw, ci_t, co_t = tiles
            if kernel_compiles(
                    conv3x3_tiled,
                    (jax.ShapeDtypeStruct((h, w_, cin + ci_pad), x.dtype),
                     jax.ShapeDtypeStruct((h + 2, _EDGE, cin + ci_pad), x.dtype),
                     jax.ShapeDtypeStruct((9, cin + ci_pad, cout), x.dtype),
                     jax.ShapeDtypeStruct((cout,), jnp.float32)),
                    relu=relu, block_h=bh, block_w=bw,
                    ci_tile=ci_t, co_tile=co_t):
                co_pad = 0
    ci, co = cin + ci_pad, cout + co_pad
    tiles = pick_tiles_3x3(h, w_, ci, co, x.dtype.itemsize)
    if tiles is None:
        return None
    bh, bw, ci_t, co_t = tiles
    if not kernel_compiles(
            conv3x3_tiled,
            (jax.ShapeDtypeStruct((h, w_, ci), x.dtype),
             jax.ShapeDtypeStruct((h + 2, _EDGE, ci), x.dtype),
             jax.ShapeDtypeStruct((9, ci, co), x.dtype),
             jax.ShapeDtypeStruct((co,), jnp.float32)),
            relu=relu, block_h=bh, block_w=bw, ci_tile=ci_t, co_tile=co_t):
        return None
    xk = x[0]
    # pad columns reflect the ORIGINAL packed phase structure (fc = f*C) —
    # build them before any channel padding, then pad their lanes to match
    plr = make_pad_columns(xk, f)
    w9 = w.reshape(9, cin, cout)
    bk = None if b is None else b.reshape(cout).astype(jnp.float32)
    if ci_pad:
        xk = jnp.pad(xk, ((0, 0), (0, 0), (0, ci_pad)))
        plr = jnp.pad(plr, ((0, 0), (0, 0), (0, ci_pad)))
        w9 = jnp.pad(w9, ((0, 0), (0, ci_pad), (0, 0)))
    if co_pad:
        w9 = jnp.pad(w9, ((0, 0), (0, 0), (0, co_pad)))
        if bk is not None:
            bk = jnp.pad(bk, (0, co_pad))
    y = conv3x3_tiled(xk, plr, w9, bk, relu=relu, block_h=bh, block_w=bw,
                      ci_tile=ci_t, co_tile=co_t)
    if co_pad:
        y = y[..., :cout]
    return y[None]


# ---------------------------------------------------------------------------
# Sub-dense-INPUT 3x3 conv: BlockSpec-pipelined halo delivery.
#
# The cascade's encoder-side transition convs read sub-dense maps (the f=4
# packed image at 12 lanes, encoder firsts at 24, post-pool maps at 64, the
# stage-1 WCT-applied map at 96). The manual-DMA kernels above cannot take
# them — probed on-chip (r5): every make_async_copy touching a sub-128-lane
# array crashes the Mosaic compiler subprocess — so the router used to
# zero-pad the input map to 128 lanes, a full-map HBM pad that the r5 HEAD
# trace puts at 90 ms of the 591 ms UHD cascade (pads of [4096,2560,12],
# [4096,1280,24], [2048,1280,64], ... — every single pad in the trace is
# one of these). BlockSpec pipelines, by contrast, deliver sub-dense refs
# natively (the conv1x1 kernel has always run 96 lanes), and the other
# primitives this kernel needs all compile on sub-dense refs (probed):
# major-dim merges ((bh, bw, c) -> (bh*bw, c)), sublane-shift staged
# copies, single-column VPU stores, and MXU dots with K < 128.
#
# Structure: grid (nh, nw); the core block plus eight halo neighbors (N, S,
# W, E, four corners) and the per-block pad-column rows arrive as separate
# BlockSpec inputs (overlapping windows are impossible in one BlockSpec, so
# the halo is decomposed into clamped single-row / sub-wide-column blocks);
# the kernel composes them into a (bh+2, bw+2*sub, c) VMEM window, then
# runs the same 9-shifted-dot tap loop as the kernels above. At W-edge
# blocks the edge halo chunk is a placeholder re-read of a valid aligned
# range — only its tap column is read, and that column is overwritten with
# the precomputed packed-reflect pad column, exactly like the DMA kernels.
# ---------------------------------------------------------------------------


def _vmem_estimate_subin(bh: int, bw: int, sub: int, cin: int, cout: int,
                         itemsize: int) -> int:
    li, lo = _lanes(cin), _lanes(cout)
    core = 2 * bh * bw * li * itemsize
    ns = 4 * bw * li * itemsize
    we = 4 * bh * sub * li * itemsize
    corners = 8 * sub * li * itemsize
    plrb = 2 * (bh + 2) * 8 * li * itemsize
    wts = 9 * -(-cin // 8) * 8 * lo * itemsize
    xwin = (bh + 2) * (bw + 2 * sub) * li * itemsize
    xs = (bh + 2) * bw * li * itemsize
    out = 2 * bh * bw * lo * itemsize
    acc = bh * bw * lo * 4
    return int((core + ns + we + corners + plrb + wts + xwin + xs + out
                + acc) * 1.15)


def pick_subin(h: int, w: int, cin: int, cout: int,
               itemsize: int) -> tuple[int, int] | None:
    """(block_h, block_w) for conv3x3_subin, or None when out of scope
    (dense input should use the DMA kernels; cout must be one lane tile)."""
    sub = 8 if itemsize == 4 else 16
    if not (0 < cin < _LANES and 0 < cout <= _LANES):
        return None
    if h < 2 or w < 2 * sub or w % sub:
        return None
    best = None
    bws = [d for d in range(sub, min(w, 2048) + 1, sub) if w % d == 0]
    for bw in bws:
        for bh in (16, 8, 4, 2, 1):
            if h % bh == 0 and _vmem_estimate_subin(
                    bh, bw, sub, cin, cout, itemsize) <= _VMEM_BUDGET:
                # equal block area -> prefer the TALLER block: the N/S halo
                # rows are re-fetched per block, an overhead of 2/bh of the
                # core read traffic (50% at bh=4, 25% at bh=8)
                if best is None or (bh * bw, bh) > (best[0] * best[1], best[0]):
                    best = (bh, bw)
                break
    return best


def _subin_kernel(core, xn, xs_, xw, xe, cnw, cne, csw, cse, plrb, w_ref,
                  b_ref, o_ref, xwin, stg, *, bh: int, bw: int, sub: int,
                  relu: bool):
    nw_ = pl.num_programs(1)
    wb = pl.program_id(1)
    cin = core.shape[-1]
    cout = o_ref.shape[-1]
    # compose the padded window: interior at column offset `sub`
    xwin[1:bh + 1, sub:sub + bw] = core[:]
    xwin[0:1, sub:sub + bw] = xn[:]
    xwin[bh + 1:bh + 2, sub:sub + bw] = xs_[:]
    xwin[1:bh + 1, 0:sub] = xw[:]
    xwin[1:bh + 1, sub + bw:sub + bw + sub] = xe[:]
    xwin[0:1, 0:sub] = cnw[:]
    xwin[0:1, sub + bw:sub + bw + sub] = cne[:]
    xwin[bh + 1:bh + 2, 0:sub] = csw[:]
    xwin[bh + 1:bh + 2, sub + bw:sub + bw + sub] = cse[:]

    @pl.when(wb == 0)
    def _():
        xwin[:, sub - 1:sub, :] = plrb[0, :, 0:1, :]

    @pl.when(wb == nw_ - 1)
    def _():
        xwin[:, sub + bw:sub + bw + 1, :] = plrb[0, :, 1:2, :]

    xb = xwin[:]
    acc = jnp.zeros((bh * bw, cout), jnp.float32)
    for kx in range(3):
        if kx == 1:
            v3 = xb[:, sub:sub + bw, :]
        else:
            stg[:] = xb[:, sub - 1 + kx:sub - 1 + kx + bw, :]
            v3 = stg[:]
        for ky in range(3):
            v = v3[ky:ky + bh].reshape(bh * bw, cin)
            acc = acc + jnp.dot(v, w_ref[3 * ky + kx],
                                preferred_element_type=jnp.float32)
    y = acc + b_ref[0].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0)
    o_ref[:] = y.reshape(bh, bw, cout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "relu", "block_h", "block_w", "interpret"))
def conv3x3_subin(x: jax.Array, plr: jax.Array, w9: jax.Array,
                  b: jax.Array | None, *, relu: bool = True, block_h: int,
                  block_w: int, interpret: bool = False) -> jax.Array:
    """Reflect-padded 3x3 conv on an UNPADDED sub-dense (H, W, Cin<128) map
    -> (H, W, Cout<=128), channels taken natively (no lane zero-pad
    anywhere). Same contract as :func:`conv3x3_tiled` otherwise; ``plr``
    from :func:`make_pad_columns`.

    ``x`` is passed as NINE pallas operands (core + 8 halo views of the
    same array). Inside a larger jitted program XLA aliases them to one
    buffer (the fused UHD cascade runs this kernel at 4 GB shapes), but a
    STANDALONE call at such shapes can ResourceExhaust — the standalone
    executable materialises operand copies. Embed in a jit (as every
    production path does) for huge maps."""
    h, w_, cin = x.shape
    _, wcin, cout = w9.shape
    assert w9.shape[0] == 9 and wcin == cin, (x.shape, w9.shape)
    assert plr.shape == (h + 2, _EDGE, cin), (plr.shape, x.shape)
    bh, bw = block_h, block_w
    assert h % bh == 0 and w_ % bw == 0, (x.shape, bh, bw)
    sub = 8 if x.dtype.itemsize == 4 else 16
    nh, nw_ = h // bh, w_ // bw
    nwsub = bw // sub
    bias = (jnp.zeros((1, cout), jnp.float32) if b is None
            else b.reshape(1, cout).astype(jnp.float32))
    # per-block pad-column rows: plrb[hb] = plr[hb*bh : hb*bh + bh + 2, :2]
    rows = (jnp.arange(nh)[:, None] * bh + jnp.arange(bh + 2)[None, :])
    plrb = plr[:, :2].astype(x.dtype)[rows]            # (nh, bh+2, 2, cin)

    def row_n(i):
        return jnp.where(i == 0, 1, i * bh - 1)

    def row_s(i):
        return jnp.where(i == nh - 1, h - 2, i * bh + bh)

    def col_w(j):
        return jnp.where(j == 0, 0, j * nwsub - 1)

    def col_e(j):
        return jnp.where(j == nw_ - 1, w_ // sub - 1, (j + 1) * nwsub)

    specs = [
        pl.BlockSpec((bh, bw, cin), lambda i, j: (i, j, 0)),          # core
        pl.BlockSpec((1, bw, cin), lambda i, j: (row_n(i), j, 0)),    # N
        pl.BlockSpec((1, bw, cin), lambda i, j: (row_s(i), j, 0)),    # S
        pl.BlockSpec((bh, sub, cin), lambda i, j: (i, col_w(j), 0)),  # W
        pl.BlockSpec((bh, sub, cin), lambda i, j: (i, col_e(j), 0)),  # E
        pl.BlockSpec((1, sub, cin),
                     lambda i, j: (row_n(i), col_w(j), 0)),           # NW
        pl.BlockSpec((1, sub, cin),
                     lambda i, j: (row_n(i), col_e(j), 0)),           # NE
        pl.BlockSpec((1, sub, cin),
                     lambda i, j: (row_s(i), col_w(j), 0)),           # SW
        pl.BlockSpec((1, sub, cin),
                     lambda i, j: (row_s(i), col_e(j), 0)),           # SE
        pl.BlockSpec((1, bh + 2, 2, cin), lambda i, j: (i, 0, 0, 0)),  # plrb
        pl.BlockSpec(memory_space=pltpu.VMEM),                        # w9
        pl.BlockSpec(memory_space=pltpu.VMEM),                        # bias
    ]
    kernel = functools.partial(_subin_kernel, bh=bh, bw=bw, sub=sub,
                               relu=relu)
    xd = x
    return pl.pallas_call(
        kernel,
        grid=(nh, nw_),
        in_specs=specs,
        out_specs=pl.BlockSpec((bh, bw, cout), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((h, w_, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, bw + 2 * sub, cin), x.dtype),
            pltpu.VMEM((bh + 2, bw, cin), x.dtype),
        ],
        name="conv3x3_subin",
        interpret=interpret,
    )(xd, xd, xd, xd, xd, xd, xd, xd, xd, plrb,
      w9.astype(x.dtype), bias)
