"""Width-packed conv pipeline: exactness vs the unpacked reference ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from collaborative_distillation_tpu.models import (
    apply_decoder,
    apply_encoder,
    decoder_spec,
    encoder_spec,
    init_params,
)
from collaborative_distillation_tpu.models.packed_vgg import (
    apply_decoder_packed,
    apply_encoder_packed,
    pack_stage_params,
    packed_feature_stats,
    packed_wct_apply,
    plan_packing,
)
from collaborative_distillation_tpu.ops import conv3x3, feature_stats, max_pool_2x2, upsample_nearest_2x
from collaborative_distillation_tpu.ops.packed import (
    pack_conv3x3_weights,
    pack_width,
    packed_conv3x3,
    packed_max_pool_2x2,
    packed_upsample_nearest_2x,
    unpack_width,
)


@pytest.mark.parametrize("f", [2, 4, 8])
def test_pack_unpack_roundtrip(rng, f):
    x = jnp.asarray(rng.random((1, 4, 32, 5), dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(unpack_width(pack_width(x, f), f)), np.asarray(x))


@pytest.mark.parametrize("f,c,co", [(2, 16, 16), (4, 8, 12), (8, 3, 16)])
def test_packed_conv_matches_unpacked(rng, f, c, co):
    x = jnp.asarray(rng.random((1, 6, 8 * f, c), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, c, co)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal(co).astype(np.float32))
    ref = conv3x3(x, w, b, relu=True)
    wp, bp = pack_conv3x3_weights(np.asarray(w), np.asarray(b), f)
    out = packed_conv3x3(pack_width(x, f), jnp.asarray(wp), jnp.asarray(bp), f, relu=True)
    np.testing.assert_allclose(np.asarray(unpack_width(out, f)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("f", [2, 4, 8])
def test_packed_pool_matches(rng, f):
    x = jnp.asarray(rng.random((1, 6, 16 * f, 4), dtype=np.float32))
    ref = max_pool_2x2(x)
    out = unpack_width(packed_max_pool_2x2(pack_width(x, f), f), f)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("f", [2, 4, 8])
def test_packed_upsample_matches(rng, f):
    x = jnp.asarray(rng.random((1, 3, 4 * f, 4), dtype=np.float32))
    ref = upsample_nearest_2x(x)
    out = unpack_width(packed_upsample_nearest_2x(pack_width(x, f), f), f)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("family,stage", [("16x", 1), ("16x", 2), ("16x", 5), ("original", 3)])
def test_packed_encoder_matches(rng, family, stage):
    spec = encoder_spec(family, stage, aux=(family == "16x"))
    params = init_params(spec, jax.random.key(0))
    packed = pack_stage_params(params, spec)
    x = jnp.asarray(rng.random((1, 32, 64, 3), dtype=np.float32))
    ref = apply_encoder(params, x, spec)["out"]
    out, f = apply_encoder_packed(packed, x, spec)
    np.testing.assert_allclose(np.asarray(unpack_width(out, f)), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("family,stage", [("16x", 2), ("16x", 5), ("original", 4)])
def test_packed_decoder_matches(rng, family, stage):
    spec = decoder_spec(family, stage)
    params = init_params(spec, jax.random.key(1))
    packed = pack_stage_params(params, spec)
    cin = spec.layers[0].in_ch
    down = 2 ** (stage - 1)
    f_in = plan_packing(spec)[0][1]
    x = jnp.asarray(rng.random((1, 32 // down, max(64 // down, f_in * 2), cin), dtype=np.float32))
    ref = apply_decoder(params, x, spec)["out"]
    out = apply_decoder_packed(packed, pack_width(x, f_in), f_in, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_packed_stats_match(rng):
    f, c = 4, 24
    x = jnp.asarray(rng.random((1, 8, 8 * f, c), dtype=np.float32))
    g_mean, g_cov = feature_stats(x)
    p_mean, p_cov = packed_feature_stats(pack_width(x, f), f, c)
    np.testing.assert_allclose(np.asarray(p_mean), np.asarray(g_mean), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_cov), np.asarray(g_cov), rtol=1e-4, atol=1e-5)


def test_packed_wct_apply_matches(rng):
    from collaborative_distillation_tpu.ops.wct_transform import _mm

    f, c = 4, 16
    x = jnp.asarray(rng.random((1, 8, 8 * f, c), dtype=np.float32))
    t = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.3)
    c_mean = jnp.asarray(rng.random(c, dtype=np.float32))
    s_mean = jnp.asarray(rng.random(c, dtype=np.float32))
    flat = x.reshape(-1, c)
    ref = (0.7 * (_mm(flat - c_mean, t.T) + s_mean) + 0.3 * flat).reshape(x.shape)
    out = packed_wct_apply(pack_width(x, f), f, c, t, c_mean, s_mean, 0.7)
    np.testing.assert_allclose(np.asarray(unpack_width(out, f)), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_plan_packing_lane_density():
    """Every persistent feature map in the plan is <= 128 and >= 64 lanes
    (except the raw image), i.e. padding waste <= 2x everywhere."""
    for family, stage in [("16x", 5), ("16x", 1), ("original", 5)]:
        for kind in ("encoder", "decoder"):
            spec = (encoder_spec if kind == "encoder" else decoder_spec)(
                family, stage, **({"aux": True} if kind == "encoder" and family == "16x" else {}))
            for name, f_in, f_out in plan_packing(spec):
                out_ch = next(l.out_ch for l in spec.layers if l.name == name)
                assert f_out * out_ch <= 128 or f_out == 1
                if out_ch >= 16:
                    assert f_out * out_ch >= 64, (family, stage, kind, name)
