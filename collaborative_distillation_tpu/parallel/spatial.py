"""Spatially-tiled inference: shard the image H axis over a device mesh.

This is the TPU answer to the reference's ultra-resolution problem. The
reference fits 10240x4096 on one 12 GB GPU by 16x model compression + CPU
float64 SVD + ``torch.cuda.empty_cache()`` after every op (WCT.py:100-105,
util_wct.py:211-222). Here the image's rows are sharded over a ``space`` mesh
axis under ``shard_map``:

* every reflect-pad-3x3-conv exchanges one-row halos with its mesh neighbours
  via ``lax.ppermute`` (ICI traffic, overlapped by XLA with the conv);
* at the two *global* edges the halo falls back to the reference's reflection
  semantics, so tiled == untiled bit-for-bit up to f32 reassociation;
* 2x2 pools and nearest upsamples are shard-local (local H stays even because
  the global H is padded to a multiple of 16 * n_shards);
* the WCT channel statistics are tile-local partial sums ``psum``-ed over the
  mesh — covariance is a sum over pixels, so the tiling is mathematically
  exact — and the C x C coloring matrix is computed replicated, then applied
  tile-locally.

Nothing here assumes a physical chip count: the same code runs on a virtual
CPU mesh (tests) and a v5e slice.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.specs import StageSpec
from ..ops.conv import conv1x1, conv2d, max_pool_2x2, upsample_nearest_2x
from ..ops.wct_transform import _mm, coloring_matrix

__all__ = [
    "halo_exchange_rows",
    "conv3x3_halo",
    "apply_encoder_spatial",
    "apply_decoder_spatial",
    "feature_stats_psum",
    "wct_transform_spatial",
    "build_tiled_stylize_fn",
    "build_tiled_stylize_fn_packed",
    "apply_encoder_spatial_packed",
    "apply_decoder_spatial_packed",
    "packed_conv3x3_halo",
]


def halo_exchange_rows(x: jax.Array, axis_name: str) -> tuple[jax.Array, jax.Array]:
    """(top_halo, bottom_halo): 1-row halos from the H-axis mesh neighbours.

    Global-edge shards get the reference's ReflectionPad2d row instead
    (row 1 at the top edge, row H-2 at the bottom).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    if n == 1:
        return x[:, 1:2], x[:, -2:-1]
    # shard i's last row -> shard i+1's top halo
    top = lax.ppermute(x[:, -1:], axis_name, [(i, i + 1) for i in range(n - 1)])
    # shard i's first row -> shard i-1's bottom halo
    bot = lax.ppermute(x[:, :1], axis_name, [(i + 1, i) for i in range(n - 1)])
    if x.shape[1] >= 2:
        edge_top, edge_bot = x[:, 1:2], x[:, -2:-1]
    else:
        # single-row shards (deep pyramid levels): the global reflect row is
        # the *opposite-direction* halo — for the top shard, global row 1
        # lives on shard 1 and arrives as our bottom halo (and vice versa).
        edge_top, edge_bot = bot, top
    top = jnp.where(idx == 0, edge_top, top)
    bot = jnp.where(idx == n - 1, edge_bot, bot)
    return top, bot


def conv3x3_halo(x: jax.Array, w: jax.Array, b: jax.Array, axis_name: str,
                 *, relu: bool = True) -> jax.Array:
    """Reflect-pad-3x3-conv whose H padding comes from neighbour halos."""
    top, bot = halo_exchange_rows(x, axis_name)
    x = jnp.concatenate([top, x, bot], axis=1)
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
    y = conv2d(x, w, b)
    if relu:
        y = jnp.maximum(y, 0)
    return y


def apply_encoder_spatial(params, x, spec: StageSpec, axis_name: str,
                          *, aux_relu: bool = False):
    """Row-sharded mirror of :func:`..models.vgg.apply_encoder`."""
    assert spec.kind == "encoder"
    outs = {}
    if spec.has_conv0:
        p = params["conv0"]
        x = conv1x1(x, p["w"], p["b"])
    for layer in spec.layers:
        p = params[layer.name]
        x = conv3x3_halo(x, p["w"], p["b"], axis_name, relu=layer.relu)
        if layer.tap:
            outs[layer.tap] = x
        if layer.pool_after:
            x = max_pool_2x2(x)  # local: H_loc is even by construction
    outs["out"] = x
    for layer in spec.aux:
        src = outs[f"relu{layer.name[4]}1"]
        p = params[layer.name]
        outs[layer.tap] = conv1x1(src, p["w"], p["b"], relu=aux_relu)
    return outs


def apply_decoder_spatial(params, x, spec: StageSpec, axis_name: str):
    """Row-sharded mirror of :func:`..models.vgg.apply_decoder`."""
    assert spec.kind == "decoder"
    for layer in spec.layers:
        p = params[layer.name]
        x = conv3x3_halo(x, p["w"], p["b"], axis_name, relu=layer.relu)
        if layer.unpool_after:
            x = upsample_nearest_2x(x)
    return x


def feature_stats_psum(feat: jax.Array, axis_name: str, global_pixels: int):
    """Exact global (mean, cov) from row-shard-local partial sums.

    cov = (sum x xT - P mean meanT) / (P - 1); both terms are tile-local
    GEMMs/sums followed by one psum each — this is the spatial-parallel
    replacement for the reference's single giant C x HW GEMM (util_wct.py:70).
    """
    c = feat.shape[-1]
    x = feat.reshape(-1, c).astype(jnp.float32)
    s1 = lax.psum(jnp.sum(x, axis=0), axis_name)
    s2 = lax.psum(
        lax.dot_general(x, x, (((0,), (0,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32),
        axis_name)
    mean = s1 / global_pixels
    cov = (s2 - global_pixels * jnp.outer(mean, mean)) / (global_pixels - 1)
    return mean, cov


def wct_transform_spatial(content_feat, style_mean, style_cov, alpha,
                          axis_name: str, global_pixels: int, *,
                          method: str = "eigh", eps: float = 1e-8,
                          newton_iters: int = 24):
    """Tile-local WCT application with globally-exact content statistics."""
    shape, dtype = content_feat.shape, content_feat.dtype
    c = shape[-1]
    x = content_feat.reshape(-1, c).astype(jnp.float32)
    c_mean, c_cov = feature_stats_psum(x, axis_name, global_pixels)
    # replicated small-matrix math (every shard computes the same T)
    t = coloring_matrix(c_cov, style_cov.astype(jnp.float32), method=method,
                        eps=eps, newton_iters=newton_iters)
    target = _mm(x - c_mean, t.T) + style_mean.astype(jnp.float32)
    alpha = jnp.asarray(alpha, jnp.float32)
    out = alpha * target + (1.0 - alpha) * x
    return out.reshape(shape).astype(dtype)


def build_tiled_stylize_fn(pyramid, mesh: Mesh, *, stages=(5, 4, 3, 2, 1),
                           method: str = "eigh", newton_iters: int = 24):
    """Jittable row-sharded full cascade over ``mesh``'s ``space`` axis.

    Returns ``f(params, content, style, alpha)``; content/style are
    (N, H, W, 3) with H divisible by 16 * mesh.shape['space']. Style
    statistics are computed from the sharded style image with the same psum
    reduction. The output is sharded like the input.
    """
    n_space = mesh.shape["space"]
    specs = {k: (pyramid[k]["enc_spec"], pyramid[k]["dec_spec"]) for k in stages}

    def per_shard(params, content, style, alpha):
        img = content
        for k in stages:
            enc_spec, dec_spec = specs[k]
            down = 2 ** (k - 1)
            sh, sw = style.shape[1] * n_space // down, style.shape[2] // down
            ch, cw = img.shape[1] * n_space // down, img.shape[2] // down
            s_out = apply_encoder_spatial(params[k]["enc"], style, enc_spec, "space")["out"]
            s_mean, s_cov = feature_stats_psum(s_out, "space", sh * sw * style.shape[0])
            c_out = apply_encoder_spatial(params[k]["enc"], img, enc_spec, "space")["out"]
            csf = wct_transform_spatial(c_out, s_mean, s_cov, alpha, "space",
                                        ch * cw * img.shape[0], method=method,
                                        newton_iters=newton_iters)
            img = apply_decoder_spatial(params[k]["dec"], csf, dec_spec, "space")
        return img

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(None, "space", None, None), P(None, "space", None, None), P()),
        out_specs=P(None, "space", None, None),
       
    )
    return jax.jit(sharded)


# ---- width-packed spatial path: halo exchange operates on rows, packing on
#      columns, so they compose directly ----

def packed_conv3x3_halo(x, w_packed, b_packed, f: int, axis_name: str,
                        *, relu: bool = True):
    """Packed-space reflect-pad conv with H halos from mesh neighbours."""
    from ..ops.packed import _reflect_pad_w_packed
    from ..ops.conv import conv2d

    top, bot = halo_exchange_rows(x, axis_name)
    x = jnp.concatenate([top, x, bot], axis=1)
    x = _reflect_pad_w_packed(x, f)
    y = conv2d(x, w_packed.astype(x.dtype), b_packed)
    if relu:
        y = jnp.maximum(y, 0)
    return y


def apply_encoder_spatial_packed(packed_params, x, spec, axis_name: str):
    """Row-sharded + width-packed encoder: returns (packed feature, f)."""
    from ..models.packed_vgg import plan_packing
    from ..ops.conv import conv1x1
    from ..ops.packed import pack_width, packed_max_pool_2x2, repack

    assert spec.kind == "encoder"
    plan = plan_packing(spec)
    f = plan[0][1]
    x = pack_width(x, f)
    if spec.has_conv0:
        p = packed_params["conv0"]
        x = conv1x1(x, p["w"], p["b"])
    for (name, f_in, f_out), layer in zip(plan, spec.layers):
        p = packed_params[name]
        x = packed_conv3x3_halo(x, p["w"], p["b"], f_in, axis_name, relu=layer.relu)
        if f_out != f_in:
            x = repack(x, f_in, f_out)
        f = f_out
        if layer.pool_after:
            x = packed_max_pool_2x2(x, f)
    return x, f


def apply_decoder_spatial_packed(packed_params, x, f_in: int, spec, axis_name: str):
    """Row-sharded + width-packed decoder -> unpacked image rows."""
    from ..models.packed_vgg import plan_packing
    from ..ops.packed import packed_upsample_nearest_2x, repack, unpack_width

    assert spec.kind == "decoder"
    plan = plan_packing(spec)
    assert plan[0][1] == f_in
    f = f_in
    for (name, fi, fo), layer in zip(plan, spec.layers):
        p = packed_params[name]
        x = packed_conv3x3_halo(x, p["w"], p["b"], fi, axis_name, relu=layer.relu)
        if fo != fi:
            x = repack(x, fi, fo)
        f = fo
        if layer.unpool_after:
            x = packed_upsample_nearest_2x(x, f)
    return unpack_width(x, f)


def build_tiled_stylize_fn_packed(pyramid, mesh: Mesh, *, stages=(5, 4, 3, 2, 1),
                                  method: str = "eigh", newton_iters: int = 24,
                                  eps: float = 1e-8):
    """Width-packed variant of :func:`build_tiled_stylize_fn`: the multi-chip
    UHD path with lane-dense tensors. Statistics use the packed phase-diagonal
    gram decomposition, psum'd over the mesh."""
    from ..models.packed_vgg import pack_stage_params

    n_space = mesh.shape["space"]
    packed = {
        k: {"enc": pack_stage_params(pyramid[k]["enc"], pyramid[k]["enc_spec"]),
            "dec": pack_stage_params(pyramid[k]["dec"], pyramid[k]["dec_spec"])}
        for k in stages}
    specs = {k: (pyramid[k]["enc_spec"], pyramid[k]["dec_spec"]) for k in stages}

    def _stats(xp, f, c, axis_name):
        x2 = xp.reshape(-1, xp.shape[-1]).astype(jnp.float32)
        s1 = lax.psum(jnp.sum(x2, axis=0).reshape(f, c).sum(axis=0), axis_name)
        gram = lax.dot_general(x2, x2, (((0,), (0,)), ((), ())),
                               precision=lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
        if f > 1:
            gram = jnp.einsum("icid->cd", gram.reshape(f, c, f, c),
                              precision=lax.Precision.HIGHEST)
        gram = lax.psum(gram, axis_name)
        n = lax.psum(jnp.float32(x2.shape[0] * f), axis_name)
        mean = s1 / n
        cov = (gram - n * jnp.outer(mean, mean)) / (n - 1)
        return mean, cov

    def per_shard(params, content, style, alpha):
        from ..models.packed_vgg import packed_wct_apply

        img = content
        for k in stages:
            enc_spec, dec_spec = specs[k]
            c = enc_spec.out_channels
            s_out, fs = apply_encoder_spatial_packed(params[k]["enc"], style,
                                                     enc_spec, "space")
            s_mean, s_cov = _stats(s_out, fs, c, "space")
            c_out, fc = apply_encoder_spatial_packed(params[k]["enc"], img,
                                                     enc_spec, "space")
            c_mean, c_cov = _stats(c_out, fc, c, "space")
            t = coloring_matrix(c_cov, s_cov, method=method, eps=eps,
                                newton_iters=newton_iters)
            csf = packed_wct_apply(c_out, fc, c, t, c_mean, s_mean, alpha)
            img = apply_decoder_spatial_packed(params[k]["dec"], csf, fc,
                                               dec_spec, "space")
        return img

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(None, "space", None, None), P(None, "space", None, None), P()),
        out_specs=P(None, "space", None, None),
    )
    return jax.jit(sharded), packed
