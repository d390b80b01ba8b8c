"""Tiled-vs-untiled equivalence: the core UHD-correctness guarantee.

Runs the row-sharded cascade on a virtual 4-device 'space' mesh and checks it
reproduces the single-device result to f32 tolerance (halo exchange at shard
borders, reflection at global borders, psum'd WCT statistics).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from collaborative_distillation_tpu.models import (
    apply_decoder,
    apply_encoder,
    decoder_spec,
    encoder_spec,
    init_params,
)
from collaborative_distillation_tpu.ops import feature_stats, wct_transform
from collaborative_distillation_tpu.parallel.mesh import make_mesh
from collaborative_distillation_tpu.parallel.spatial import build_tiled_stylize_fn
from collaborative_distillation_tpu.wct.engine import stylize_cascade_fn


def _toy_pyramid(stages, key=0):
    pyramid = {}
    k = jax.random.key(key)
    for s in stages:
        k, k1, k2 = jax.random.split(k, 3)
        espec = encoder_spec("16x", s, aux=True)
        dspec = decoder_spec("16x", s)
        pyramid[s] = {
            "enc_spec": espec, "dec_spec": dspec,
            "enc": init_params(espec, k1),
            "dec": init_params(dspec, k2),
        }
    return pyramid


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(space=4, data=1)


@pytest.mark.parametrize("stage", [1, 2, 3, 5])
def test_tiled_encoder_equals_untiled(rng, mesh, stage):
    """Halo-exchange conv pyramid == plain reflect-pad pyramid, tight f32 tol.

    This pins the halo semantics exactly (shard borders get neighbour rows,
    global borders get reflection) through every conv/pool of the encoder.
    """
    from jax import shard_map
    from collaborative_distillation_tpu.parallel.spatial import apply_encoder_spatial

    spec = encoder_spec("16x", stage, aux=True)
    params = init_params(spec, jax.random.key(7))
    x = jnp.asarray(rng.random((1, 128, 32, 3), dtype=np.float32))
    ref = apply_encoder(params, x, spec)["out"]
    f = shard_map(
        lambda p, xs: apply_encoder_spatial(p, xs, spec, "space")["out"],
        mesh=mesh, in_specs=(P(), P(None, "space", None, None)),
        out_specs=P(None, "space", None, None),
    )
    tiled = f(params, x)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stage", [2, 4])
def test_tiled_decoder_equals_untiled(rng, mesh, stage):
    from jax import shard_map
    from collaborative_distillation_tpu.parallel.spatial import apply_decoder_spatial

    spec = decoder_spec("16x", stage)
    params = init_params(spec, jax.random.key(8))
    cin = spec.layers[0].in_ch
    down = 2 ** (stage - 1)
    x = jnp.asarray(rng.random((1, 128 // down, 16, cin), dtype=np.float32))
    ref = apply_decoder(params, x, spec)["out"]
    f = shard_map(
        lambda p, xs: apply_decoder_spatial(p, xs, spec, "space"),
        mesh=mesh, in_specs=(P(), P(None, "space", None, None)),
        out_specs=P(None, "space", None, None),
    )
    tiled = f(params, x)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stages", [(1,), (3, 2, 1), (5, 4, 3, 2, 1)])
def test_tiled_cascade_close_to_untiled(rng, mesh, stages):
    """Full cascade, moderate tolerance: the WCT eigendecomposition amplifies
    f32 reassociation differences on the random (ill-conditioned) toy weights;
    encoder/decoder equality above pins the halo math tightly."""
    pyramid = _toy_pyramid(stages)
    params = {s: {"enc": pyramid[s]["enc"], "dec": pyramid[s]["dec"]} for s in stages}
    h = 64
    content = jnp.asarray(rng.random((1, h, 48, 3), dtype=np.float32))
    style = jnp.asarray(rng.random((1, h, 48, 3), dtype=np.float32))
    alpha = 0.8

    untiled = stylize_cascade_fn(pyramid, stages=stages)(params, content, style, alpha)
    tiled_fn = build_tiled_stylize_fn(pyramid, mesh, stages=stages)
    tiled = tiled_fn(params, content, style, alpha)
    # eigh on these near-degenerate toy covariances amplifies f32
    # reassociation chaotically for a handful of pixels (pure-f32 summation
    # reorderings alone score ~27 dB PSNR on noise inputs — docs/BENCHMARKS
    # sensitivity study), so bound the *distribution* of the error rather
    # than every element: <=0.5% of pixels past 5e-2, none past 1.5e-1.
    diff = np.abs(np.asarray(tiled) - np.asarray(untiled))
    assert (diff > 5e-2).mean() <= 5e-3, (diff.max(), (diff > 5e-2).mean())
    assert diff.max() <= 1.5e-1, diff.max()


def test_tiled_output_is_sharded(rng, mesh):
    stages = (2, 1)
    pyramid = _toy_pyramid(stages)
    params = {s: {"enc": pyramid[s]["enc"], "dec": pyramid[s]["dec"]} for s in stages}
    content = jnp.asarray(rng.random((1, 128, 32, 3), dtype=np.float32))
    style = jnp.asarray(rng.random((1, 128, 32, 3), dtype=np.float32))
    sharding = NamedSharding(mesh, P(None, "space", None, None))
    content = jax.device_put(content, sharding)
    style = jax.device_put(style, sharding)
    out = build_tiled_stylize_fn(pyramid, mesh, stages=stages)(params, content, style, 1.0)
    assert out.shape == content.shape
    assert out.sharding.spec in (P(None, "space"), P(None, "space", None, None))


def test_psum_stats_match_global(rng, mesh):
    """Sharded feature statistics == unsharded statistics."""
    from jax import shard_map
    from collaborative_distillation_tpu.parallel.spatial import feature_stats_psum

    x = jnp.asarray(rng.standard_normal((1, 64, 8, 16)).astype(np.float32))
    g_mean, g_cov = feature_stats(x)

    f = shard_map(
        lambda xs: feature_stats_psum(xs, "space", 64 * 8),
        mesh=mesh,
        in_specs=P(None, "space", None, None),
        out_specs=(P(), P()),
       
    )
    s_mean, s_cov = f(x)
    np.testing.assert_allclose(np.asarray(s_mean), np.asarray(g_mean), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_cov), np.asarray(g_cov), rtol=1e-4, atol=1e-4)


def test_packed_tiled_close_to_unpacked_tiled(rng, mesh):
    """Width-packed multi-chip cascade == unpacked multi-chip cascade."""
    from collaborative_distillation_tpu.parallel.spatial import build_tiled_stylize_fn_packed

    stages = (2, 1)
    pyramid = _toy_pyramid(stages)
    params = {s: {"enc": pyramid[s]["enc"], "dec": pyramid[s]["dec"]} for s in stages}
    content = jnp.asarray(rng.random((1, 128, 64, 3), dtype=np.float32))
    style = jnp.asarray(rng.random((1, 128, 64, 3), dtype=np.float32))
    ref = build_tiled_stylize_fn(pyramid, mesh, stages=stages)(params, content, style, 0.8)
    fn, packed = build_tiled_stylize_fn_packed(pyramid, mesh, stages=stages)
    out = fn(packed, content, style, 0.8)
    diff = np.abs(np.asarray(out) - np.asarray(ref))
    assert diff.mean() < 5e-3 and diff.max() < 0.1, (diff.mean(), diff.max())


def test_stylize_cli_space_flag(weights_root, tmp_path):
    """The --space CLI path runs on the virtual mesh end to end."""
    import os
    from PIL import Image
    from collaborative_distillation_tpu.cli.stylize import main

    rng = np.random.default_rng(0)
    cdir, sdir = tmp_path / "c", tmp_path / "s"
    cdir.mkdir(); sdir.mkdir()
    Image.fromarray((rng.random((128, 64, 3)) * 255).astype(np.uint8)).save(cdir / "a.jpg")
    Image.fromarray((rng.random((128, 64, 3)) * 255).astype(np.uint8)).save(sdir / "b.jpg")
    outf = str(tmp_path / "out")
    rc = main(["--mode", "16x", "--contentPath", str(cdir), "--stylePath", str(sdir),
               "--outf", outf, "--debug", "--weights_root", weights_root,
               "--space", "4"])
    assert rc == 0
    outs = [f for f in os.listdir(outf) if f.endswith(".jpg")]
    assert len(outs) == 1


def test_per_conv_halo_path_refuses_ultra_resolution(monkeypatch):
    """space>0 without slab_rows keeps full per-shard feature pyramids in
    HBM; at UHD that OOMs exactly like the monolithic single-chip graph.
    The engine must refuse with a pointer to slab_rows, not device-OOM."""
    import jax
    import numpy as np
    import pytest as _pytest

    from collaborative_distillation_tpu.models.specs import (
        decoder_spec, encoder_spec)
    from collaborative_distillation_tpu.models.vgg import init_params
    from collaborative_distillation_tpu.wct import engine as engine_mod

    key = jax.random.key(0)
    espec = encoder_spec("16x", 1, aux=True)
    dspec = decoder_spec("16x", 1)
    pyr = {1: {"enc_spec": espec, "dec_spec": dspec,
               "enc": init_params(espec, key),
               "dec": init_params(dspec, key)}}
    eng = engine_mod.WCTEngine(mode="16x", pyramid=pyr, stages=(1,), space=4)
    monkeypatch.setattr(engine_mod, "_TILED_MAX_SHARD_PIX", 1024)
    big = np.zeros((256, 64, 3), np.float32)  # 4096 px/shard > patched cap
    with _pytest.raises(ValueError, match="slab_rows"):
        eng.stylize(big, big)
    # below the cap still runs
    small = np.zeros((64, 64, 3), np.float32)
    out = eng.stylize(small, small)
    assert out.shape == small.shape
