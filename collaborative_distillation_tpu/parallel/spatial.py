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
from functools import partial
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.specs import StageSpec
from ..ops.conv import conv1x1, conv2d, max_pool_2x2, upsample_nearest_2x
from ..ops.wct_transform import coloring_matrix

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
    from ..models.packed_vgg import packed_wct_apply

    return packed_wct_apply(content_feat, 1, c, t, c_mean, style_mean, alpha)


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

    down_max = 2 ** (max(stages) - 1)

    def per_shard(params, content, style, alpha):
        img = content
        assert img.shape[1] % down_max == 0 and style.shape[1] % down_max == 0, (
            f"per-shard H {img.shape[1]}/{style.shape[1]} must divide the "
            f"deepest stage's downsample factor {down_max}; pad the global H "
            f"to a multiple of {down_max} * n_space (the engine pads to "
            f"16 * space) so pools/upsamples stay shard-local and the psum'd "
            f"pixel counts are exact")
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
    from ..ops.packed import pack_width, packed_max_pool_2x2, repack

    assert spec.kind == "encoder"
    plan = plan_packing(spec)
    f = plan[0][1]
    x = pack_width(x, f)
    # conv0 is folded into conv1_1 by pack_stage_params — no 1x1 layer here
    for i, ((name, f_in, f_out), layer) in enumerate(zip(plan, spec.layers)):
        p = packed_params[name]
        x = packed_conv3x3_halo(x, p["w"], p["b"], f_in, axis_name, relu=layer.relu)
        if f_out != f_in:
            x = repack(x, f_in, f_out)
        f = f_out
        if layer.pool_after:
            f_next = plan[i + 1][1] if i + 1 < len(plan) else f
            x = packed_max_pool_2x2(x, f, out_f=f_next)
            f = f_next
    return x, f


def apply_decoder_spatial_packed(packed_params, x, f_in: int, spec, axis_name: str):
    """Row-sharded + width-packed decoder -> unpacked image rows."""
    from ..models.packed_vgg import plan_packing
    from ..ops.packed import packed_upsample_nearest_2x, repack, unpack_width

    assert spec.kind == "decoder"
    plan = plan_packing(spec)
    assert plan[0][1] == f_in
    f = f_in
    for i, ((name, fi, fo), layer) in enumerate(zip(plan, spec.layers)):
        p = packed_params[name]
        x = packed_conv3x3_halo(x, p["w"], p["b"], fi, axis_name, relu=layer.relu)
        if fo != fi:
            x = repack(x, fi, fo)
        f = fo
        if layer.unpool_after:
            f_next = plan[i + 1][1] if i + 1 < len(plan) else f
            x = packed_upsample_nearest_2x(x, f, out_f=f_next)
            f = f_next
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

    down_max = 2 ** (max(stages) - 1)

    def per_shard(params, content, style, alpha):
        from ..models.packed_vgg import packed_wct_apply

        img = content
        assert img.shape[1] % down_max == 0 and style.shape[1] % down_max == 0, (
            f"per-shard H {img.shape[1]}/{style.shape[1]} must divide the "
            f"deepest stage's downsample factor {down_max} (pad global H to "
            f"a multiple of {down_max} * n_space)")
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


# ---- fused + HBM-bounded multi-chip cascade: slab streaming INSIDE each
#      row shard. The per-conv-halo tiled paths above hold each shard's full
#      feature maps; this one bounds per-shard HBM by the slab size, so an
#      8-chip mesh holds arbitrarily tall images (the UHD configuration that
#      motivates the reference, README.md:2). ----


def _exchange_row_halos(img: jax.Array, hm: int, axis_name: str) -> jax.Array:
    """Extend a row-shard with ``hm`` rows from each mesh neighbour:
    (N, H_loc, W, C) -> (N, H_loc + 2*hm, W, C). Global-edge shards receive
    ppermute's zero fill in the out-of-image region — callers must never read
    it (the slab index arithmetic below guarantees that)."""
    n = lax.axis_size(axis_name)
    top = lax.ppermute(img[:, -hm:], axis_name, [(i, i + 1) for i in range(n - 1)])
    bot = lax.ppermute(img[:, :hm], axis_name, [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([top, img, bot], axis=1)


def build_tiled_slab_cascade(pyramid, mesh: Mesh, *, stages=(5, 4, 3, 2, 1),
                             slab_rows: int = 1024, method: str = "eigh",
                             newton_iters: int = 24, eps: float = 1e-8,
                             packed: bool = False, data_axis: str | None = None,
                             external_style_stats: bool = False,
                             halo: str = "ppermute"):
    """One compiled program: row shards over ``space``, slab streaming inside
    each shard, WCT statistics psum'd across the mesh.

    Composition of the two ultra-resolution mechanisms:

    * across chips: the image's rows are sharded over the ``space`` mesh axis
      (shard_map); per stage, each shard exchanges ``2*margin`` input rows
      with its neighbours ONCE (one ppermute pair per direction — not one per
      conv like :func:`build_tiled_stylize_fn`), then works independently;
    * within a chip: the shard streams through the stage in overlapping row
      slabs (lax.scan), exactly like :func:`..wct.slab.build_fused_slab_cascade`,
      so per-shard peak HBM is bounded by the slab size — independent of the
      global image height;
    * statistics: slab-partial (sum, gram) accumulate in the scan, then one
      ``psum`` over ``space`` makes them global-exact; every shard computes
      the same replicated C x C coloring matrix.

    Slab-boundary semantics match :class:`..wct.slab.SlabCascade._slabs`:
    interior slab margins come from recompute overlap (here possibly crossing
    into neighbour halos); the global top/bottom edge slabs start at the true
    image boundary so per-conv reflection there is the reference's semantics.

    ``data_axis``: optionally also shard the batch over a second mesh axis
    (combined DP x spatial serving mesh); statistics still psum only over
    ``space``, so every data shard stylizes its own images independently.

    ``halo``: ``"ppermute"`` (default — XLA collective) or ``"pallas"`` (the
    RDMA kernel in ``ops/pallas/halo.py``: two ``make_async_remote_copy``\\ s
    per shard riding ICI neighbour links, mesh-coordinate addressed so it
    composes with ``data_axis``; auto-falls back to the TPU interpret
    simulator off-TPU, so CPU-mesh tests/dryruns execute the same protocol).

    Returns ``(fn, params)``; ``fn(params, img, style, alpha)`` wants global
    H divisible by ``slab_rows * n_space`` (slab_rows is rounded up to the
    pyramid granularity; use ``SlabCascade.pick_slab_rows`` + reflect-pad) and
    the style small enough to encode whole (it is replicated per shard).
    """
    from ..wct.slab import SlabCascade

    n_space = mesh.shape["space"]
    assert n_space >= 2, "use build_fused_slab_cascade for a single chip"
    helper = SlabCascade(pyramid, stages=stages, slab_rows=slab_rows,
                         method=method, newton_iters=newton_iters, eps=eps,
                         packed=packed)
    if helper.slab_rows < 2 * helper.margin:
        # edge slabs must share the mid-slab shape: round the request up to
        # the geometric minimum instead of crashing (callers read the
        # effective size back from ``fn.slab_rows``)
        helper = SlabCascade(pyramid, stages=stages,
                             slab_rows=2 * helper.margin, method=method,
                             newton_iters=newton_iters, eps=eps, packed=packed)
    slab, m = helper.slab_rows, helper.margin
    assert slab >= 2 * m, (slab, m)
    # per-stage margins (and so per-stage halo widths): a shallow stage only
    # needs ITS OWN enc+dec receptive radius of ghost rows — smaller halos
    # mean fewer ppermute bytes over ICI and less recompute per slab.
    params = helper.packed_params if packed else {
        k: {"enc": pyramid[k]["enc"], "dec": pyramid[k]["dec"]} for k in stages}
    # one shared implementation with the single-chip fused cascade (a stats
    # or packing fix must not be able to drift between the two paths)
    from ..wct.slab import (
        _color_decode_feats,
        _encode_any,
        _stats_from_feats,
        _style_stats_whole,
    )

    def _encode(pk, sl, spec):
        return _encode_any(pk, sl, spec, packed)

    if halo == "pallas":
        from ..ops.pallas.halo import halo_exchange_rows_pallas

        def _exchange(img, hm):
            return halo_exchange_rows_pallas(
                img, hm, "space",
                interpret=jax.default_backend() != "tpu",
                extra_vma=(data_axis,) if data_axis else ())
    elif halo == "ppermute":
        def _exchange(img, hm):
            return _exchange_row_halos(img, hm, "space")
    else:
        raise ValueError(f"halo must be 'ppermute' or 'pallas', got {halo!r}")

    def per_shard(p, img, style, alpha):
        h_loc = img.shape[1]
        assert h_loc % slab == 0 and h_loc >= slab, (
            f"per-shard H {h_loc} must be a positive multiple of slab_rows "
            f"{slab}; pad global H to a multiple of {slab * n_space}")
        n_slabs = h_loc // slab
        idx = lax.axis_index("space")
        is_first = idx == 0
        is_last = idx == n_space - 1

        def slab_coords(i, m, hm):
            """(ext_start, interior_offset) for local slab i, in the
            halo-extended image's coordinates (ext row 0 = local row -2m).

            mid slabs: one margin each side (start local i*slab - m);
            the global-top shard's slab 0 starts at the TRUE boundary and
            extends inward (per-conv reflection there IS the reference's
            edge semantics); the global-bottom shard's last slab ends at
            the true boundary likewise."""
            start = i * slab + m          # mid: local i*slab - m -> ext +hm
            off = jnp.full_like(start, m)
            first = is_first & (i == 0)
            last = is_last & (i == n_slabs - 1)
            start = jnp.where(first, hm, start)              # local row 0
            off = jnp.where(first, 0, off)
            start = jnp.where(last, h_loc - slab, start)     # local h-slab-2m
            off = jnp.where(last, hm, off)
            return start, off

        for k in stages:
            spec_e = pyramid[k]["enc_spec"]
            spec_d = pyramid[k]["dec_spec"]
            down = 2 ** (k - 1)
            c = spec_e.out_channels
            interior_f = slab // down
            mk = helper.margins[k]
            hm = 2 * mk  # halo rows: edge slabs extend inward by 2m
            if external_style_stats:
                # precomputed per-style (engine caches them per style_key —
                # re-encoding the style through 5 encoders on EVERY shard on
                # EVERY run is pure waste for a registered style)
                s_mean, s_cov = style[k]
                s_mean = s_mean.astype(jnp.float32)
                s_cov = s_cov.astype(jnp.float32)
            else:
                # style statistics: style replicated; identical on every shard
                s_mean, s_cov = _style_stats_whole(p[k]["enc"], style, spec_e,
                                                   c, packed)

            ext = _exchange(img, hm)
            rows = slab + hm
            coords = partial(slab_coords, m=mk, hm=hm)

            def stat_body(carry, i, _ext=ext, _pk=p[k]["enc"], _spec=spec_e,
                          _down=down, _interior=interior_f, _c=c):
                s1, s2, cnt = carry
                start, off = coords(i)
                sl = lax.dynamic_slice_in_dim(_ext, start, rows, axis=1)
                feats, f = _encode(_pk, sl, _spec)
                a, b, n_px = _stats_from_feats(feats, f, _c, off // _down,
                                               _interior)
                return (s1 + a, s2 + b, cnt + jnp.float32(n_px)), None

            # carry accumulators vary over the image's mesh axes (each shard
            # accumulates its own partials); mark the replicated zeros so
            # shard_map's varying-manual-axes check accepts the scan carry
            vma = ("space",) + ((data_axis,) if data_axis else ())
            init = jax.tree.map(
                lambda z: lax.pcast(z, vma, to="varying"),
                (jnp.zeros((c,), jnp.float32), jnp.zeros((c, c), jnp.float32),
                 jnp.zeros((), jnp.float32)))
            (s1, s2, cnt), _ = lax.scan(stat_body, init, jnp.arange(n_slabs))
            s1 = lax.psum(s1, "space")
            s2 = lax.psum(s2, "space")
            cnt = lax.psum(cnt, "space")
            c_mean = s1 / cnt
            c_cov = (s2 - cnt * jnp.outer(c_mean, c_mean)) / (cnt - 1)
            t = coloring_matrix(c_cov, s_cov, method=method, eps=eps,
                                newton_iters=newton_iters)

            def apply_body(out_img, i, _ext=ext, _ek=p[k]["enc"], _dk=p[k]["dec"],
                           _spec=spec_e, _spec_d=spec_d, _t=t, _cm=c_mean,
                           _sm=s_mean):
                start, off = coords(i)
                sl = lax.dynamic_slice_in_dim(_ext, start, rows, axis=1)
                feats, f = _encode(_ek, sl, _spec)
                dec = _color_decode_feats(feats, f, _dk, _spec_d, _t, _cm, _sm,
                                          alpha, off, slab, packed)
                return lax.dynamic_update_slice(
                    out_img, dec.astype(out_img.dtype), (0, i * slab, 0, 0)), None

            img, _ = lax.scan(apply_body, jnp.zeros_like(img), jnp.arange(n_slabs))
        return img

    if external_style_stats:
        assert data_axis is None, (
            "external_style_stats currently requires a space-only mesh "
            "(per-data-shard styles would need per-shard statistics)")
    img_spec = P(data_axis, "space", None, None)
    style_spec = P() if external_style_stats else P(data_axis)
    # the interpret-simulated pallas halo (off-TPU only) discharges the
    # kernel into plain jax ops whose varying-axes annotations don't satisfy
    # the strict checker; mosaic-lowered TPU builds keep the lint on
    check_vma = not (halo == "pallas" and jax.default_backend() != "tpu")
    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), img_spec, style_spec, P()),
        out_specs=img_spec,
        check_vma=check_vma,
    )
    jit_fn = jax.jit(sharded)

    def fn(p, img, style, alpha):  # plain wrapper: jit objects reject attrs
        return jit_fn(p, img, style, alpha)

    fn.slab_rows = slab  # effective (possibly rounded-up) slab size
    return fn, params
