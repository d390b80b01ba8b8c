"""Equivalence tests for the Pallas direct 3x3 conv (ops/pallas/conv.py).

The kernel replaces XLA's conv lowering for every single-image 3x3 conv in
the packed cascade (reference math: model/model_original.py:434-450 —
ReflectionPad2d + Conv2d + ReLU, here in width-packed space). These tests
pin it against the XLA packed path in interpret mode, covering the shape
classes the UHD cascade actually produces: lane-dense 128->128 maps plus
the sub-dense transition layers (RGB in, RGB out, width doublings/halvings)
that route through the channel-padding wrapper in ops/packed.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from collaborative_distillation_tpu.ops.packed import (
    _reflect_pad_w_packed,
    pack_conv3x3_weights,
)
from collaborative_distillation_tpu.ops.pallas.conv import (
    conv3x3_lane128,
    make_pad_columns,
    pick_block_h,
    supported,
)


def _xla_packed_conv(x, wp_, bp, f, relu):
    xr = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="reflect")
    xr = _reflect_pad_w_packed(xr, f)
    y = lax.conv_general_dilated(
        xr, jnp.asarray(wp_), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + jnp.asarray(bp)
    return jnp.maximum(y, 0) if relu else y


CASES = [
    # (H, Wp, Cin, Cout, f) — all four cascade resolutions' shape classes
    (8, 16, 16, 16, 8),     # lane-dense full-res class
    (12, 32, 128, 128, 1),  # deepest level, unpacked
    (6, 48, 64, 64, 2),
    (4, 16, 32, 32, 4),
    (2, 8, 16, 16, 8),      # single-block: both H-edge specials in one block
    (8, 16, 3, 16, 8),      # encoder conv1_1: packed RGB in (fc=24)
    (8, 16, 16, 3, 8),      # decoder final conv: RGB out
    (6, 32, 32, 64, 2),     # width doubling (half-dense input)
    (6, 32, 64, 32, 2),     # width halving
    (4, 24, 24, 24, 4),     # stage-1 SE width (96 lanes)
]


@pytest.mark.parametrize("case", CASES, ids=[str(c) for c in CASES])
@pytest.mark.parametrize("relu", [True, False])
def test_matches_xla_packed_conv(case, relu, rng):
    h, wp, ci, co, f = case
    x = jnp.asarray(rng.standard_normal((1, h, wp, f * ci)), jnp.float32)
    w = rng.standard_normal((3, 3, ci, co)).astype(np.float32) * 0.2
    b = rng.standard_normal(co).astype(np.float32)
    wp_, bp = pack_conv3x3_weights(w, b, f)
    ref = _xla_packed_conv(x, wp_, bp, f, relu)

    plan = supported(h, wp, f * ci, f * co, 4)
    assert plan is not None
    bh, staged = plan
    got = conv3x3_lane128(
        x[0], make_pad_columns(x[0], f),
        jnp.asarray(wp_).reshape(9, f * ci, f * co), jnp.asarray(bp),
        relu=relu, block_h=bh, staged=staged, interpret=True)
    # the lazy (VMEM-tight) variant must compute the same conv
    got_lazy = conv3x3_lane128(
        x[0], make_pad_columns(x[0], f),
        jnp.asarray(wp_).reshape(9, f * ci, f * co), jnp.asarray(bp),
        relu=relu, block_h=bh, staged=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got_lazy))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[0]),
                               atol=2e-4, rtol=2e-4)


def test_routing_gate():
    """supported() rejects what the kernel can't take and the XLA fallback
    must absorb: wide channels, misaligned W, sub-reflect heights."""
    assert supported(4096, 1280, 128, 128, 2) is not None
    assert supported(4096, 1280, 256, 128, 2) is None      # > one lane tile
    assert supported(4096, 1281, 128, 128, 4) is None      # W % 8
    assert supported(4096, 1282, 128, 128, 2) is None      # W % 16 (bf16)
    assert supported(1, 1280, 128, 128, 4) is None         # no reflect row
    # odd H still routes via bh=1
    assert supported(4097, 1280, 128, 128, 4) == (1, True)
    # f32 at the full-res stage-1 width: the shift scratch does not fit,
    # the LAZY variant must take it instead of falling back to XLA
    assert supported(4096, 2560, 12, 96, 4) == (1, False)
    assert supported(4096, 2560, 128, 128, 4) == (1, False)
    # bf16 halves the window: staged fits at wp=2560
    assert supported(4096, 2560, 128, 128, 2)[1] is True


@pytest.mark.quick
def test_block_picker_respects_vmem():
    # UHD full-res width: bh=4 fits, bh=8 would blow scoped VMEM
    assert pick_block_h(4096, 1280, 128, 128, 2, 2) == 4
    # tiny maps take the largest divisor
    assert pick_block_h(32, 32, 128, 128, 4, 4) == 16


@pytest.mark.quick
def test_1x1_picker_anchored_to_measured_compiler_point():
    """The 1x1 VMEM model is calibrated against the one REAL Mosaic data
    point we have — BENCH_r03's scoped-VMEM OOM: bh=4, wp=1280, f32 was
    18.45 MB actual stack (vs the 16 MB limit). The round-3 model predicted
    13.1 MB there and shipped a crash; this test anchors the estimator to
    the compiler's number, not to itself."""
    from collaborative_distillation_tpu.ops.pallas.conv import (
        _vmem_estimate_1x1, pick_block_h_1x1)
    measured = int(18.45 * 2**20)
    est = _vmem_estimate_1x1(4, 1280, 4)
    assert est >= measured, (est, measured)          # never under-predict it
    assert est <= int(measured * 1.02), est          # calibrated, not padded
    # consequences at the UHD cascade shapes (whole rows preferred):
    assert pick_block_h_1x1(4096, 1280, 4) == (2, 1280)  # the r3 crash shape
    assert pick_block_h_1x1(4096, 1280, 2) == (4, 1280)  # bf16: one less pass
    assert pick_block_h_1x1(4096, 2560, 4) == (1, 2560)  # full-res f32 stage-1
    assert pick_block_h_1x1(512, 1280, 4) == (2, 1280)
    # wp=5120 (f=2-packed teacher full res): no whole-row block fits f32;
    # the free W axis splits instead of losing the shape to XLA
    bh, bw = pick_block_h_1x1(4096, 5120, 4)
    assert bw < 5120 and 5120 % bw == 0 and bw % 8 == 0


@pytest.mark.quick
def test_pallas_conv_kill_switch(monkeypatch):
    """CD_TPU_PALLAS / CD_TPU_PALLAS_CONV env knobs and the runtime
    disable_pallas_conv() (the engine's degradation ladder) all force the
    XLA route."""
    from collaborative_distillation_tpu.ops.pallas import conv

    monkeypatch.setattr(conv, "_FORCE_OFF", False)
    monkeypatch.delenv("CD_TPU_PALLAS", raising=False)
    monkeypatch.delenv("CD_TPU_PALLAS_CONV", raising=False)
    assert conv.pallas_conv_enabled()
    monkeypatch.setenv("CD_TPU_PALLAS", "0")
    assert not conv.pallas_conv_enabled()
    monkeypatch.delenv("CD_TPU_PALLAS")
    monkeypatch.setenv("CD_TPU_PALLAS_CONV", "off")
    assert not conv.pallas_conv_enabled()
    monkeypatch.delenv("CD_TPU_PALLAS_CONV")
    with pytest.warns(RuntimeWarning, match="disabled"):
        conv.disable_pallas_conv("test")
    assert not conv.pallas_conv_enabled()


@pytest.mark.quick
def test_try_conv1x1_routing(monkeypatch, rng):
    """The shared router: gated off-CPU; with the backend faked to TPU, a
    probe rejection falls through to None (XLA), and an accepted route pads
    sub-dense channels to the lane tile correctly."""
    from collaborative_distillation_tpu.ops.pallas import conv

    x = jnp.asarray(rng.standard_normal((1, 8, 16, 96)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((96, 64)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(64), jnp.float32)

    # CPU backend: router must decline
    assert conv.try_conv1x1_pallas(x, w, b, relu=True) is None

    monkeypatch.setattr(conv.jax, "default_backend", lambda: "tpu")
    # probe rejects the shape -> None
    monkeypatch.setattr(conv, "kernel_compiles", lambda *a, **k: False)
    assert conv.try_conv1x1_pallas(x, w, b, relu=True) is None

    # probe accepts; swap the kernel for an XLA equivalent so the padding
    # and unpadding logic is exercised on the CPU test platform
    monkeypatch.setattr(conv, "kernel_compiles", lambda *a, **k: True)

    def fake_kernel(xk, wk, bk, *, relu, block_h, block_w=0, interpret=False):
        y = xk.reshape(-1, xk.shape[-1]) @ wk + bk.reshape(1, -1)
        if relu:
            y = jnp.maximum(y, 0)
        return y.reshape(*xk.shape[:2], wk.shape[-1]).astype(xk.dtype)

    monkeypatch.setattr(conv, "conv1x1_lane128", fake_kernel)
    got = conv.try_conv1x1_pallas(x, w, b, relu=True)
    assert got is not None and got.shape == (1, 8, 16, 64)
    ref = jnp.maximum(
        jnp.einsum("nhwc,cd->nhwd", x, w) + b, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_pad_columns_match_packed_reflect(rng):
    """make_pad_columns == the pad columns _reflect_pad_w_packed builds."""
    for f, fc in [(8, 128), (1, 128), (4, 96), (8, 24)]:
        x = jnp.asarray(rng.standard_normal((6, 16, fc)), jnp.float32)
        full = _reflect_pad_w_packed(
            jnp.pad(x[None], ((0, 0), (1, 1), (0, 0), (0, 0)), mode="reflect"), f)[0]
        plr = make_pad_columns(x, f)
        np.testing.assert_array_equal(np.asarray(plr[:, 0, :]),
                                      np.asarray(full[:, 0, :]))
        np.testing.assert_array_equal(np.asarray(plr[:, 1, :]),
                                      np.asarray(full[:, -1, :]))


def test_wct_apply_pallas_route_matches_xla(rng):
    """packed_wct_apply's Pallas 1x1 route (TPU-gated in production) must
    equal its XLA branch. The kernel is driven in interpret mode with the
    exact (M, beta) affine the function folds; the XLA branch is the CPU
    result of packed_wct_apply itself."""
    from collaborative_distillation_tpu.models.packed_vgg import packed_wct_apply
    from collaborative_distillation_tpu.ops.pallas.conv import (
        conv1x1_lane128, pick_block_h_1x1)

    f, c = 4, 32
    xp = jnp.asarray(rng.standard_normal((1, 16, 32, f * c)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((c, c)), jnp.float32) * 0.3
    cm = jnp.asarray(rng.standard_normal(c), jnp.float32)
    sm = jnp.asarray(rng.standard_normal(c), jnp.float32)
    alpha = 0.8
    ref = packed_wct_apply(xp, f, c, t, cm, sm, alpha)  # XLA branch (CPU)

    a = jnp.float32(alpha)
    m = a * t.T + (1 - a) * jnp.eye(c)
    beta = a * (sm - cm @ t.T)
    m = jnp.kron(jnp.eye(f), m)
    beta = jnp.tile(beta, f)
    bh, bw = pick_block_h_1x1(16, 32, 4)
    got = conv1x1_lane128(xp[0], m, beta, relu=False, block_h=bh, block_w=bw,
                          interpret=True)[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_conv1x1_subdense_native(rng):
    """Sub-lane-tile channel counts (the 16x stage-1 boundary: fc=96) run
    through the 1x1 kernel natively — no 128-pad, no slice — like the fused
    stats kernel's C%8 contract. Pinned against the plain matmul."""
    from collaborative_distillation_tpu.ops.pallas.conv import conv1x1_lane128
    for fc, fco in [(96, 96), (24, 96), (96, 24), (64, 128)]:
        x = jnp.asarray(rng.standard_normal((8, 16, fc)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((fc, fco)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal(fco), jnp.float32)
        got = conv1x1_lane128(x, w, b, relu=True, block_h=4, block_w=16,
                              interpret=True)
        ref = jnp.maximum(jnp.einsum("hwc,cd->hwd", x, w) + b, 0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# conv3x3_tiled: the teacher-width kernel (W-tiled + Cin/Cout channel tiles)
# ---------------------------------------------------------------------------

from collaborative_distillation_tpu.ops.conv import conv3x3 as _xla_conv3x3
from collaborative_distillation_tpu.ops.pallas.conv import (
    conv3x3_subin,
    conv3x3_tiled,
    pick_tiles_3x3,
    try_conv3x3_tiled,
)

TILED_CASES = [
    # (H, W, Cin, Cout, bh, bw, ci_t, co_t) — teacher shape classes scaled down
    (8, 32, 64, 64, 4, 8, 64, 64),       # L1 class: multi-H/W blocks, C=64
    (6, 32, 64, 128, 2, 16, 64, 128),    # width doubling (conv2_1 class)
    (4, 16, 128, 128, 4, 8, 128, 128),   # L2 class
    (4, 16, 256, 256, 2, 8, 128, 128),   # L3 class: nci=2, nco=2
    (4, 16, 256, 512, 4, 16, 128, 256),  # co_t=256, single W block
    (3, 24, 512, 64, 1, 8, 128, 64),     # decoder narrowing, bh=1, nci=4
    (2, 16, 64, 64, 2, 16, 64, 64),      # single block: all edges in one
]


@pytest.mark.parametrize("case", TILED_CASES, ids=[str(c) for c in TILED_CASES])
@pytest.mark.parametrize("relu", [True, False])
def test_tiled_matches_xla_conv(case, relu, rng):
    h, w, ci, co, bh, bw, ci_t, co_t = case
    x = jnp.asarray(rng.standard_normal((1, h, w, ci)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
    ref = _xla_conv3x3(x, wgt, b, relu=relu)
    got = conv3x3_tiled(x[0], make_pad_columns(x[0], 1),
                        wgt.reshape(9, ci, co), b, relu=relu,
                        block_h=bh, block_w=bw, ci_tile=ci_t, co_tile=co_t,
                        interpret=True)[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_tiled_bf16_matches_xla(rng):
    h, w, ci, co = 6, 64, 128, 128  # bf16 sublane tile is 16
    x = jnp.asarray(rng.standard_normal((1, h, w, ci)), jnp.bfloat16)
    wgt = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
    ref = _xla_conv3x3(x, wgt, b.astype(jnp.bfloat16), relu=True)
    got = conv3x3_tiled(x[0], make_pad_columns(x[0], 1),
                        wgt.reshape(9, ci, co), b, relu=True,
                        block_h=2, block_w=32, ci_tile=128, co_tile=128,
                        interpret=True)[None]
    err = np.max(np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32)))
    scale = np.max(np.abs(np.asarray(ref, np.float32))) + 1e-6
    assert err / scale < 2e-2, (err, scale)


def test_tiled_picker_scope():
    # teacher UHD shape classes all get a plan...
    for h, w, ci, co in [(512, 5120, 128, 128),
                         (256, 2560, 256, 256), (128, 1280, 512, 512),
                         (128, 1280, 512, 256)]:
        plan = pick_tiles_3x3(h, w, ci, co, 4)
        assert plan is not None, (h, w, ci, co)
        bh, bw, ci_t, co_t = plan
        assert h % bh == 0 and w % bw == 0 and bw % 8 == 0
        assert ci % ci_t == 0 and co % co_t == 0
        from collaborative_distillation_tpu.ops.pallas.conv import (
            _VMEM_BUDGET, _vmem_estimate_tiled)
        assert _vmem_estimate_tiled(bh, bw, 8, ci_t, co_t, 4,
                                    nci=ci // ci_t) <= _VMEM_BUDGET
    # sub-dense channel counts (< 128) are single sub-dense tiles now — the
    # Mosaic lane-alignment restriction binds only DMA lane-dim SLICES
    # (nci > 1), so these run natively with NO full-map channel pad/slice
    # (they were 20% of the r4 UHD trace)
    for h, w, ci, co in [(64, 64, 16, 16), (1024, 10240, 64, 64),
                         (512, 5120, 64, 128), (4096, 2560, 12, 96),
                         (4096, 1280, 128, 24)]:
        plan = pick_tiles_3x3(h, w, ci, co, 4)
        assert plan is not None, (h, w, ci, co)
        bh, bw, ci_t, co_t = plan
        assert ci_t == min(ci, 128) and co % co_t == 0, plan
    # ...while misaligned MULTI-tile channels and degenerate shapes decline
    assert pick_tiles_3x3(64, 64, 192, 128, 4) is None     # cin > 128, % 128
    assert pick_tiles_3x3(64, 64, 128, 200, 4) is None     # cout > 128, % 128
    assert pick_tiles_3x3(64, 60, 128, 128, 4) is None     # W % sublane != 0
    assert pick_tiles_3x3(1, 64, 128, 128, 4) is None      # H too small


def test_tiled_vmem_model_anchored_to_probed_compiler_points():
    """The nci>1 accumulator path holds THREE f32 block values (part, the
    total select, the acc scratch), not one — anchored to the on-chip probe
    sweep at (272, 2560, 256 -> 128) bf16: every bh*bw = 5120 config
    crashed the remote compiler, every bh*bw = 2560 config compiled."""
    from collaborative_distillation_tpu.ops.pallas.conv import (
        _VMEM_BUDGET, _vmem_estimate_tiled, pick_tiles_3x3)

    for bh, bw, ok in [(4, 1280, False), (2, 2560, False),
                       (2, 1280, True), (1, 2560, True),
                       (4, 640, True), (8, 320, True)]:
        est = _vmem_estimate_tiled(bh, bw, 16, 128, 128, 2, nci=2)
        assert (est <= _VMEM_BUDGET) == ok, (bh, bw, est)
    # the picker must now pick a compiling config at the crash shape
    plan = pick_tiles_3x3(272, 2560, 256, 128, 2)
    assert plan is not None
    bh, bw, ci_t, co_t = plan
    assert bh * bw <= 2560, plan


def test_tiled_router_gates(monkeypatch, rng):
    x = jnp.zeros((1, 8, 32, 64), jnp.float32)
    w = jnp.zeros((3, 3, 64, 64), jnp.float32)
    # off-TPU: declined regardless of shape
    assert try_conv3x3_tiled(x, w, None) is None
    # kill switch honored even if the backend were TPU
    monkeypatch.setenv("CD_TPU_PALLAS", "0")
    assert try_conv3x3_tiled(x, w, None) is None


SUBDENSE_TILED_CASES = [
    # (H, Wp, fc_in, fc_out, f) — the cascade's 26 sub-dense transition
    # convs, scaled down: packed image ingress (12->96), encoder firsts
    # (24->128), post-pool halves (64->128), decoder narrowings (128->64,
    # 128->24), decoder egress (96->12). Native single sub-dense tiles —
    # no channel pad/slice anywhere.
    (32, 64, 12, 96, 4),
    (16, 32, 24, 128, 8),
    (16, 32, 128, 64, 4),
    (8, 32, 64, 128, 2),
    (8, 16, 128, 24, 8),
    (16, 64, 96, 12, 4),
]


@pytest.mark.parametrize("case", SUBDENSE_TILED_CASES,
                         ids=[str(c) for c in SUBDENSE_TILED_CASES])
def test_tiled_subdense_native_matches_xla(case, rng):
    """Sub-dense (cin/cout < 128) maps run the tiled kernel NATIVELY —
    parity against the XLA packed conv with the packed-reflect pad
    structure, no zero-padding to the lane tile anywhere."""
    h, wp, fc, fco, f = case
    x = jnp.asarray(rng.standard_normal((h, wp, fc)), jnp.float32)
    w9 = jnp.asarray(rng.standard_normal((9, fc, fco)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal(fco), jnp.float32)
    plan = pick_tiles_3x3(h, wp, fc, fco, 4)
    assert plan is not None and plan[2] == min(fc, 128), plan
    bh, bw, ci_t, co_t = plan
    xp = jnp.pad(x[None], ((0, 0), (1, 1), (0, 0), (0, 0)), mode="reflect")
    xp = _reflect_pad_w_packed(xp, f)
    ref = jax.lax.conv_general_dilated(
        xp, w9.reshape(3, 3, fc, fco), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    ref = jnp.maximum(ref + b, 0)[0]
    got = conv3x3_tiled(x, make_pad_columns(x, f), w9, b, relu=True,
                        block_h=bh, block_w=bw, ci_tile=ci_t, co_tile=co_t,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


SUBIN_CASES = [
    # (H, Wp, fc_in, fc_out, f, bh, bw) — the sub-dense-INPUT classes the
    # BlockSpec kernel serves natively (multi-block grids in both dims so
    # every halo path — N/S rows, W/E chunks, corners, pad columns — runs)
    (32, 64, 12, 96, 4, 8, 16),    # s1 packed-image ingress
    (16, 48, 24, 128, 8, 4, 16),   # encoder-first class
    (16, 32, 64, 128, 2, 8, 8),    # post-pool class
    (8, 32, 96, 12, 4, 2, 16),     # s1 decoder egress (sub in AND out)
    (4, 16, 12, 96, 4, 4, 16),     # single row-block
]


@pytest.mark.parametrize("case", SUBIN_CASES, ids=[str(c) for c in SUBIN_CASES])
def test_subin_matches_xla_packed_conv(case, rng):
    """conv3x3_subin (BlockSpec halo delivery, native sub-dense channels)
    == the XLA packed conv. This kernel replaces the full-map 128-lane
    input zero-pads that were every pad in the r5 HEAD UHD trace (90 ms);
    manual-DMA kernels cannot take sub-dense arrays (Mosaic crash, probed)."""
    h, wp, fc, fco, f, bh, bw = case
    x = jnp.asarray(rng.standard_normal((h, wp, fc)), jnp.float32)
    w9 = jnp.asarray(rng.standard_normal((9, fc, fco)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal(fco), jnp.float32)
    xp = jnp.pad(x[None], ((0, 0), (1, 1), (0, 0), (0, 0)), mode="reflect")
    xp = _reflect_pad_w_packed(xp, f)
    ref = jax.lax.conv_general_dilated(
        xp, w9.reshape(3, 3, fc, fco), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    ref = jnp.maximum(ref + b, 0)[0]
    got = conv3x3_subin(x, make_pad_columns(x, f), w9, b, relu=True,
                        block_h=bh, block_w=bw, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_subin_picker_scope():
    from collaborative_distillation_tpu.ops.pallas.conv import (
        _VMEM_BUDGET, _vmem_estimate_subin, pick_subin)
    # every sub-dense-input cascade class gets a plan that fits the budget
    for h, w, ci, co in [(4096, 2560, 12, 96), (4096, 1280, 24, 128),
                         (2048, 1280, 64, 128), (1024, 1280, 64, 128),
                         (512, 1280, 64, 128), (4096, 2560, 96, 12),
                         (2048, 256, 24, 128)]:
        plan = pick_subin(h, w, ci, co, 4)
        assert plan is not None, (h, w, ci, co)
        bh, bw = plan
        assert h % bh == 0 and w % bw == 0 and bw % 8 == 0
        assert _vmem_estimate_subin(bh, bw, 8, ci, co, 4) <= _VMEM_BUDGET
    # dense input or multi-tile output: not this kernel's scope
    assert pick_subin(512, 1280, 128, 64, 4) is None
    assert pick_subin(512, 1280, 64, 256, 4) is None
    assert pick_subin(512, 60, 64, 128, 4) is None   # W % sublane != 0


PACKED_TILED_CASES = [
    # (H, Wp, Cin, Cout, f, bh, bw) — the packed-pipeline shapes that spill
    # past the whole-row kernel: the f=2-packed teacher's wide rows
    (6, 32, 64, 64, 2, 2, 16),    # conv1_2 class (fc=fco=128)
    (4, 32, 64, 64, 2, 4, 8),     # same, multi-W blocks
    (2, 16, 64, 64, 2, 2, 16),    # single block: both W-edge pads in one
    (6, 24, 16, 16, 8, 2, 8),     # student full-res class (fc=128)
    (4, 16, 32, 32, 4, 4, 16),    # f=4 mid class
]


@pytest.mark.parametrize("case", PACKED_TILED_CASES,
                         ids=[str(c) for c in PACKED_TILED_CASES])
def test_tiled_packed_matches_xla_packed_conv(case, rng):
    """conv3x3_tiled with make_pad_columns(f) == the XLA packed conv: the
    W-tiled kernel's pad-column route must reproduce the packed-reflect
    phase structure at the true image edges (this is the path that makes
    the packed teacher pipeline viable at wp=5120)."""
    h, wp, ci, co, f, bh, bw = case
    fc, fco = f * ci, f * co
    x = jnp.asarray(rng.standard_normal((1, h, wp, fc)), jnp.float32)
    w = rng.standard_normal((3, 3, ci, co)).astype(np.float32) * 0.2
    b = rng.standard_normal(co).astype(np.float32)
    wpk, bpk = pack_conv3x3_weights(w, b, f)
    ref = _xla_packed_conv(x, wpk, bpk, f, relu=True)
    got = conv3x3_tiled(x[0], make_pad_columns(x[0], f),
                        jnp.asarray(wpk).reshape(9, fc, fco),
                        jnp.asarray(bpk), relu=True,
                        block_h=bh, block_w=bw, ci_tile=fc, co_tile=fco,
                        interpret=True)[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_packed_pool_lane_matches_xla(rng):
    """The fused Pallas pool == the XLA reduce_window + phase-pair-max chain
    (packed_max_pool_2x2's natural-f/2 branch), incl. f=1 unpacked W pooling
    and sub-dense lane counts."""
    from collaborative_distillation_tpu.ops.packed import packed_max_pool_2x2
    from collaborative_distillation_tpu.ops.pallas.pool import packed_pool_lane

    for h, wp, f, c, bh, bw in [(8, 16, 8, 16, 2, 16), (6, 16, 2, 64, 1, 8),
                                (8, 24, 4, 24, 4, 24), (8, 32, 1, 128, 2, 16),
                                (8, 16, 2, 16, 2, 16)]:
        x = jnp.asarray(rng.standard_normal((1, h, wp, f * c)), jnp.float32)
        want = 1 if f == 1 else f // 2
        ref = packed_max_pool_2x2(x, f, out_f=want)
        got = packed_pool_lane(x[0], f=f, c=c, block_h=bh, block_w=bw,
                               interpret=True)[None]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=str((h, wp, f, c)))


def test_pool_block_model_anchored_to_probed_compiler_points():
    """pick_pool_blocks is anchored to the on-chip probe sweep at
    (2048, 256, 128) f=8: (16, 256) crashed the remote compiler while
    (8, 256), (16, 128) and every smaller config compiled."""
    from collaborative_distillation_tpu.ops.pallas.pool import (
        _VMEM_BUDGET, pick_pool_blocks)

    # model must reject the crash config and accept the probed-good ones
    def need(bh, bw, fc=128, item=4):
        inb = 2 * bh * bw * fc
        half = fc // 2
        return int((2 * inb + inb + bh * bw * fc + 2 * bh * bw * half
                    + 2 * bh * bw * half) * item * 1.15)

    assert need(16, 256) > _VMEM_BUDGET          # crashed on-chip
    assert need(8, 256) <= _VMEM_BUDGET          # compiled
    assert need(16, 128) <= _VMEM_BUDGET         # compiled
    bh, bw = pick_pool_blocks(1024, 256, 128, 4)
    assert (2 * bh * bw) * 256 <= 16 * 256 * 512, (bh, bw)  # below cut line


def test_packed_upsample_lane_matches_xla(rng):
    """The fused Pallas upsample == packed_upsample_nearest_2x's natural
    out_f == 2f branch (in-lane phase duplication), incl. f=1 -> 2."""
    from collaborative_distillation_tpu.ops.packed import packed_upsample_nearest_2x
    from collaborative_distillation_tpu.ops.pallas.pool import packed_upsample_lane

    for h, wp, f, c, bh, bw in [(4, 16, 4, 16, 2, 16), (6, 16, 1, 64, 3, 8),
                                (4, 24, 2, 32, 4, 24), (4, 16, 2, 16, 2, 16)]:
        x = jnp.asarray(rng.standard_normal((1, h, wp, f * c)), jnp.float32)
        ref = packed_upsample_nearest_2x(x, f, out_f=2 * f)
        got = packed_upsample_lane(x[0], f=f, c=c, block_h=bh, block_w=bw,
                                   interpret=True)[None]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=str((h, wp, f, c)))


def test_tiled_router_pads_channels(monkeypatch, rng):
    """pad_channels=True: sub-128 Cin/Cout are zero-padded to the lane tile
    (weights and pad columns included) and the result unpadded — exercised
    with the kernel swapped for an interpret-mode call on CPU."""
    from collaborative_distillation_tpu.ops.pallas import conv

    f, ci, co = 2, 32, 64   # fc=64 -> pad to 128; fco=128 exact
    x = jnp.asarray(rng.standard_normal((1, 6, 32, f * ci)), jnp.float32)
    w = rng.standard_normal((3, 3, ci, co)).astype(np.float32) * 0.2
    b = rng.standard_normal(co).astype(np.float32)
    wpk, bpk = pack_conv3x3_weights(w, b, f)
    ref = _xla_packed_conv(x, wpk, bpk, f, relu=True)

    monkeypatch.setattr(conv.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(conv, "kernel_compiles", lambda *a, **k: True)
    real_tiled, real_subin = conv.conv3x3_tiled, conv.conv3x3_subin
    used = []

    def interp_tiled(*args, **kw):
        kw["interpret"] = True
        used.append("tiled")
        return real_tiled(*args, **kw)

    def interp_subin(*args, **kw):
        kw["interpret"] = True
        used.append("subin")
        return real_subin(*args, **kw)

    monkeypatch.setattr(conv, "conv3x3_tiled", interp_tiled)
    monkeypatch.setattr(conv, "conv3x3_subin", interp_subin)

    # default: the sub-dense INPUT routes to the native BlockSpec kernel
    got = conv.try_conv3x3_tiled(
        x, jnp.asarray(wpk).reshape(3, 3, f * ci, f * co), jnp.asarray(bpk),
        relu=True, f=f, pad_channels=True)
    assert got is not None and got.shape == ref.shape and used == ["subin"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # CD_TPU_SUBDENSE=0: the channel-padded tiled route (the fallback)
    used.clear()
    monkeypatch.setenv("CD_TPU_SUBDENSE", "0")
    got = conv.try_conv3x3_tiled(
        x, jnp.asarray(wpk).reshape(3, 3, f * ci, f * co), jnp.asarray(bpk),
        relu=True, f=f, pad_channels=True)
    assert got is not None and got.shape == ref.shape and used == ["tiled"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    monkeypatch.delenv("CD_TPU_SUBDENSE")

    # without pad_channels the sub-dense shape is declined
    assert conv.try_conv3x3_tiled(
        x, jnp.asarray(wpk).reshape(3, 3, f * ci, f * co), jnp.asarray(bpk),
        relu=True, f=f) is None
