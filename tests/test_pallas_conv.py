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


def test_block_picker_respects_vmem():
    # UHD full-res width: bh=4 fits, bh=8 would blow scoped VMEM
    assert pick_block_h(4096, 1280, 128, 128, 2, 2) == 4
    # tiny maps take the largest divisor
    assert pick_block_h(32, 32, 128, 128, 4, 4) == 16


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
    bh = pick_block_h_1x1(16, 32, 4)
    got = conv1x1_lane128(xp[0], m, beta, relu=False, block_h=bh,
                          interpret=True)[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
