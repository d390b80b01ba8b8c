"""Width-packed VGG pyramid: lane-dense encoder/decoder applies.

Companion to :mod:`..ops.packed`. The whole cascade runs in packed space:

* the image is packed once (f=8 phase columns into channels);
* each conv runs at its input's packing factor; afterwards, if f*C_out
  drifts above 128, the tensor is repacked (a reshape) down to the largest
  power-of-two f with f*C_out <= 128 — so every persistent feature map is
  lane-dense;
* WCT statistics never unpack: the packed gram's phase-diagonal C x C blocks
  sum to the original gram, and the coloring transform applies in packed
  space as kron(I_f, T);
* pools / upsamples are packed-space reshapes (ops/packed.py).

Exactness: packed conv == reflect-pad conv for interior AND W edges (the
packed pad columns reproduce reflection); H edges are reflect-padded
normally. Tests pin packed == unpacked bit-for-bit modulo MXU precision mode.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.packed import (
    pack_conv3x3_weights,
    pack_width,
    packed_conv3x3,
    packed_max_pool_2x2,
    packed_upsample_nearest_2x,
    repack,
    unpack_width,
)
from .specs import StageSpec

__all__ = [
    "plan_packing",
    "pack_stage_params",
    "apply_encoder_packed",
    "apply_decoder_packed",
    "packed_feature_stats",
    "packed_wct_apply",
    "MAX_PACK",
]

MAX_PACK = 8


def _f_for(c: int) -> int:
    f = 1
    while f < MAX_PACK and (f * 2) * c <= 128:
        f *= 2
    return f


def plan_packing(spec: StageSpec) -> list[tuple[str, int, int]]:
    """[(layer_name, f_in, f_out_after_repack)] for the spec's conv chain.

    f_in of the first layer is the image/feature ingress packing. The
    factor evolves STRUCTURALLY: pools halve it (the phase-pair max's
    natural output), unpools double it (in-lane phase duplication). In the
    VGG ladder channels double at every pool and halve before every unpool,
    so the structural factor tracks ``_f_for`` exactly and every explicit
    repack — a whole-map layout copy in the compiled program — vanishes.
    It also halves the packed MAC inflation of each post-pool conv (the old
    plan ran them at the pre-pool factor). ``f_out != f_in`` (an explicit
    repack) survives only for specs whose channel changes do not co-occur
    with a pool/unpool.
    """
    plan = []
    if spec.kind == "encoder":
        # pack the image at the first conv's own factor (= MAX_PACK for the
        # C=16 families; 4 for the stage-1 width-24 student; 2 for the
        # teacher) — packing harder only inflates conv1_1's MACs
        f = min(MAX_PACK, _f_for(spec.layers[0].out_ch))
    else:
        f = _f_for(spec.layers[0].in_ch)
    for layer in spec.layers:
        f_in = f
        # never carry more phases than the lane budget wants for this C —
        # but don't repack UP either (under-dense transients are cheaper
        # than a layout copy; pool/unpool below adjust the factor for free)
        f_out = min(f_in, _f_for(layer.out_ch))
        plan.append((layer.name, f_in, f_out))
        f = f_out
        if layer.pool_after:
            f = max(f // 2, 1)
        if layer.unpool_after:
            f2 = 2 * f
            if f2 <= MAX_PACK and f2 <= _f_for(layer.out_ch):
                f = f2
    return plan


def pack_stage_params(params, spec: StageSpec):
    """Host-side: pack every 3x3 conv's weights per the packing plan.

    conv0 (the encoders' 1x1 RGB->BGR x255 - mean preprocessing,
    model_original.py conv0) is FOLDED into conv1_1: a pointwise affine
    commutes with reflect padding, so ``conv11(pad(conv0(x)))`` equals a
    single 3x3 conv with ``W'[ky,kx] = A @ W[ky,kx]`` and
    ``b' = b11 + sum_taps(W[ky,kx]^T b0)`` — exact, borders included. This
    removes a full-map op (and, on the Pallas conv route, the 128-lane
    zero-pad + slice-back around it) per encoder per slab: ~0.13 s of the
    r3 1.04 s UHD device trace. Aux adapters are not packed (they are
    training-only). Returns a params tree of jnp arrays keyed like the
    original (no "conv0" entry — the apply fns skip it).
    """
    plan = plan_packing(spec)
    packed = {}
    fold_w = fold_b = None
    if spec.has_conv0:
        fold_w = np.asarray(params["conv0"]["w"])[0, 0]  # (3 in, 3 out)
        fold_b = np.asarray(params["conv0"]["b"])
    for (name, f_in, _f_out), layer in zip(plan, spec.layers):
        w = np.asarray(params[layer.name]["w"])
        b = np.asarray(params[layer.name]["b"])
        if fold_w is not None:
            # y = sum_t W_t (A x_t + b0) + b  ==  sum_t (A@W_t) x_t
            #     + (b + sum_t W_t^T b0)   [HWIO taps W_t = w[ky,kx]]
            # compose in f32 (np.einsum rejects bfloat16), round once back
            wd, bd = w.dtype, b.dtype
            w32 = w.astype(np.float32)
            b = (b.astype(np.float32)
                 + np.einsum("hwio,i->o", w32, fold_b.astype(np.float32))
                 ).astype(bd)
            w = np.einsum("ji,hwio->hwjo", fold_w.astype(np.float32),
                          w32).astype(wd)
            fold_w = fold_b = None
        wp, bp = pack_conv3x3_weights(w, b, f_in)
        packed[name] = {"w": jnp.asarray(wp), "b": jnp.asarray(bp)}
    return packed


def apply_encoder_packed(packed_params, x: jax.Array, spec: StageSpec):
    """x: (N, H, W, 3) unpacked image -> (packed_feature, f_final).

    Returns the relu{k}_1 output still packed; use
    :func:`packed_feature_stats` / :func:`packed_wct_apply` on it directly.
    """
    assert spec.kind == "encoder"
    plan = plan_packing(spec)
    f = plan[0][1]
    x = pack_width(x, f)
    # conv0 is folded into conv1_1 by pack_stage_params — no 1x1 layer here
    for i, ((name, f_in, f_out), layer) in enumerate(zip(plan, spec.layers)):
        p = packed_params[name]
        x = packed_conv3x3(x, p["w"], p["b"], f_in, relu=layer.relu)
        if f_out != f_in:
            x = repack(x, f_in, f_out)
        f = f_out
        if layer.pool_after:
            f_next = plan[i + 1][1] if i + 1 < len(plan) else f
            x = packed_max_pool_2x2(x, f, out_f=f_next)
            f = f_next
    return x, f


def apply_decoder_packed(packed_params, x: jax.Array, f_in: int, spec: StageSpec) -> jax.Array:
    """packed feature (f_in) -> unpacked image (N, H, W, 3)."""
    assert spec.kind == "decoder"
    plan = plan_packing(spec)
    assert plan[0][1] == f_in, (plan[0], f_in)
    f = f_in
    for i, ((name, fi, fo), layer) in enumerate(zip(plan, spec.layers)):
        p = packed_params[name]
        x = packed_conv3x3(x, p["w"], p["b"], fi, relu=layer.relu)
        if fo != fi:
            x = repack(x, fi, fo)
        f = fo
        if layer.unpool_after:
            f_next = plan[i + 1][1] if i + 1 < len(plan) else f
            x = packed_upsample_nearest_2x(x, f, out_f=f_next)
            f = f_next
    return unpack_width(x, f)


def packed_feature_stats(xp: jax.Array, f: int, c: int):
    """(mean (C,), cov (C,C)) of the *original* channels from a packed map.

    The packed gram's phase-diagonal blocks sum to the original gram, and
    phase-block means sum to the original sum — no relayout of the feature
    map is needed; one dense (fC x fC) GEMM does the reduction.
    """
    p_eff = xp.shape[0] * xp.shape[1] * xp.shape[2] * f  # original pixel count
    x2 = xp.reshape(-1, xp.shape[-1]).astype(jnp.float32)
    s1 = jnp.sum(x2, axis=0).reshape(f, c).sum(axis=0)
    gram = lax.dot_general(x2, x2, (((0,), (0,)), ((), ())),
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
    blocks = gram.reshape(f, c, f, c)
    diag = jnp.einsum("icid->cd", blocks, precision=lax.Precision.HIGHEST) \
        if f > 1 else blocks.reshape(c, c)
    mean = s1 / p_eff
    cov = (diag - p_eff * jnp.outer(mean, mean)) / (p_eff - 1)
    return mean, cov


def packed_wct_apply(xp: jax.Array, f: int, c: int, t: jax.Array,
                     c_mean: jax.Array, s_mean: jax.Array, alpha) -> jax.Array:
    """Apply the C x C coloring matrix in packed space via kron(I_f, T).

    ``f == 1`` is the plain unpacked apply (the slab paths reuse it so both
    pipelines share one implementation).

    The whole transform — centering, coloring, style mean, alpha blend —
    folds into ONE affine map applied as a fused 1x1 convolution::

        out = alpha*((x - c_mean) @ T^T + s_mean) + (1-alpha)*x
            = x @ M + beta,   M = alpha*T^T + (1-alpha)*I,
                              beta = alpha*(s_mean - c_mean @ T^T)

    A 1x1 NHWC conv keeps the channel axis on the lanes, so XLA lowers it
    as a GEMM *in the feature map's native layout* — the previous
    reshape-to-(P, C) ``dot_general`` relaid out the whole multi-GB matrix
    (a 7 ms copy per slab at UHD), and the separate alpha-blend multiply
    cost one more full-map pass.
    """
    shape, dtype = xp.shape, xp.dtype
    a = jnp.asarray(alpha, jnp.float32)
    tt = t.astype(jnp.float32).T
    m = a * tt + (1.0 - a) * jnp.eye(c, dtype=jnp.float32)
    beta = a * (s_mean.astype(jnp.float32)
                - jnp.matmul(c_mean.astype(jnp.float32)[None], tt,
                             precision=lax.Precision.HIGHEST)[0])
    if f > 1:
        m = jnp.kron(jnp.eye(f, dtype=m.dtype), m)
        beta = jnp.tile(beta, f)
    fc = f * c
    if xp.ndim == 4 and fc <= 128:
        # one-lane-tile maps route to the Pallas per-pixel matmul: XLA
        # lowers the 1x1 conv in its exotic {3,0,2,1} feature layout, which
        # both costs ~8 ms per full-map apply at UHD slab scale and forces
        # relayout copies against the Pallas conv3x3 calls around it (r3
        # trace: 42 ms of conv + the copies across the 5 stages; the fc=96
        # stage-1 apply it missed under the old fc==128 gate was the single
        # hottest op of the r4 student trace at 64 ms — the kernel takes
        # sub-dense widths natively, no pad/slice). M/beta are formed in
        # f32 above; the kernel accumulates f32 on the MXU and emits
        # xp.dtype — same contract as the XLA branches below. Routing
        # (gates, VMEM block pick, compile probe) is the shared
        # try_conv1x1_pallas; None means "use the XLA branches below".
        from ..ops.pallas.conv import try_conv1x1_pallas
        y = try_conv1x1_pallas(
            xp, m.astype(dtype) if dtype != jnp.float32 else m,
            beta, relu=False)
        if y is not None:
            return y.reshape(shape).astype(dtype)
    if dtype == jnp.float32:
        # exact path: HIGHEST-precision GEMM, f32 accumulation
        y = lax.conv_general_dilated(
            xp, m[None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        return (y + beta).reshape(shape).astype(dtype)
    # bf16 engine: keep the map in bf16 end to end — upcasting here would
    # materialise a full f32 map and a separate convert (the convert does
    # not fuse back into the conv on TPU), erasing the bandwidth saving the
    # bf16 engine exists for. M/beta are still formed in f32 above; the MXU
    # accumulates f32 natively and rounds once at the output.
    y = lax.conv_general_dilated(
        xp, m[None, None].astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (y + beta.astype(y.dtype)).reshape(shape).astype(dtype)
