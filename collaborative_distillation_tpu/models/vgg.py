"""Spec-driven apply functions for the WCT VGG autoencoders.

One multi-tap ``apply_encoder`` subsumes the reference's ``forward``,
``forward_branch``, ``forward_aux``, ``forward_aux2`` and ``forward_aux3``
method families (model_original.py:513-532, model_cd.py:744-848): it always
returns a dict of named features and callers pick what they need — under jit,
XLA dead-code-eliminates whatever is unused, so there is zero cost to the
uniform interface.

Params are flat pytrees ``{conv_name: {"w": HWIO, "b": (out,)}}`` keyed by the
reference state-dict names, produced by :mod:`..utils.torch_convert` or
:func:`init_params`.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.conv import (
    conv1x1,
    conv3x3,
    max_pool_2x2,
    max_pool_2x2_with_argmax,
    max_unpool_2x2,
    upsample_nearest_2x,
)
from .specs import StageSpec

__all__ = ["init_params", "apply_encoder", "apply_decoder", "apply_decoder_pwct"]

Params = dict[str, dict[str, jax.Array]]


def init_params(spec: StageSpec, key: jax.Array, dtype=jnp.float32) -> Params:
    """Kaiming-uniform init matching torch Conv2d defaults (for training from
    scratch / parity with un-initialized reference aux layers)."""
    params: Params = {}
    shapes = spec.param_shapes()
    keys = jax.random.split(key, len(shapes))
    for k, (name, (wshape, bshape)) in zip(keys, sorted(shapes.items())):
        kh, kw, cin, cout = wshape
        fan_in = kh * kw * cin
        bound_w = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
        bound_b = 1.0 / math.sqrt(fan_in)
        kw_, kb_ = jax.random.split(k)
        params[name] = {
            "w": jax.random.uniform(kw_, wshape, dtype, -bound_w, bound_w),
            "b": jax.random.uniform(kb_, bshape, dtype, -bound_b, bound_b),
        }
    return params


def apply_encoder(
    params: Params,
    x: jax.Array,
    spec: StageSpec,
    *,
    aux_relu: bool = False,
    with_pool_argmax: bool = False,
    pallas_conv: bool = False,
) -> dict[str, jax.Array]:
    """Run encoder stage; returns named features.

    Keys: ``out`` (final relu{k}_1), ``relu{j}1`` taps (j<=k, pre-pool),
    ``aux{j}1`` adapter outputs when the spec has aux layers, and with
    ``with_pool_argmax`` also ``pool{p}_idx``/``pool{p}_hw`` for photo-WCT.

    ``aux_relu`` mirrors the ``updim_relu`` flag (model_cd.py forward_aux's
    ``relu`` argument, main.py:53 --updim_relu).
    """
    assert spec.kind == "encoder"
    outs: dict[str, jax.Array] = {}
    if spec.has_conv0:
        p = params["conv0"]
        x = conv1x1(x, p["w"], p["b"], relu=False)
    n_pool = 0
    for layer in spec.layers:
        p = params[layer.name]
        x = conv3x3(x, p["w"], p["b"], relu=layer.relu, pallas=pallas_conv)
        if layer.tap:
            outs[layer.tap] = x
        if layer.pool_after:
            n_pool += 1
            if with_pool_argmax:
                outs[f"pool{n_pool}_hw"] = tuple(x.shape[1:3])  # static metadata
                x, idx = max_pool_2x2_with_argmax(x)
                outs[f"pool{n_pool}_idx"] = idx
            else:
                x = max_pool_2x2(x)
    outs["out"] = x
    for layer in spec.aux:
        src = outs[f"relu{layer.name[4]}1"]
        p = params[layer.name]
        outs[layer.tap] = conv1x1(src, p["w"], p["b"], relu=aux_relu)
    return outs


def apply_decoder(
    params: Params,
    x: jax.Array,
    spec: StageSpec,
    *,
    aux_relu: bool = False,
    final_relu: bool = True,
    pallas_conv: bool = False,
) -> dict[str, jax.Array]:
    """Run decoder stage; returns named features.

    Keys: ``out`` (reconstructed image, ReLU'd like the reference), ``dec{j}1``
    taps (the *unpooled* conv{j}1 features, matching forward_branch variable
    reassignment in model_original.py:601-619), and kd2sd ``dec_aux{j}1``
    adapter outputs when present (model_kd2sd.py:72-102).

    ``final_relu=False`` is the reference's ``Decoder4.forward_norule``
    variant (model_original.py:391-404: identical decode but no ReLU on the
    last conv, so negative pixel values survive — the same semantics the
    pwct path uses, :func:`apply_decoder_pwct`). Uncalled in the reference
    but part of its API surface; offered for parity.
    """
    assert spec.kind == "decoder"
    outs: dict[str, jax.Array] = {}
    last = spec.layers[-1]
    for layer in spec.layers:
        p = params[layer.name]
        relu = layer.relu and (final_relu or layer is not last)
        x = conv3x3(x, p["w"], p["b"], relu=relu, pallas=pallas_conv)
        if layer.unpool_after:
            x = upsample_nearest_2x(x)
        if layer.tap:
            outs[layer.tap] = x
    outs["out"] = x
    for layer in spec.aux:
        src = outs[f"dec{layer.name[3]}1"]
        p = params[layer.name]
        outs[layer.tap] = conv1x1(src, p["w"], p["b"], relu=aux_relu)
    return outs


def apply_decoder_pwct(
    params: Params,
    x: jax.Array,
    spec: StageSpec,
    pool_idx: dict[str, jax.Array],
) -> jax.Array:
    """Photo-WCT decode: max-unpool with encoder argmax indices instead of
    nearest upsample, and *no* ReLU on the final conv (model_cd.py
    SmallDecoder*.forward_pwct, e.g. 126-133).

    ``pool_idx`` holds ``pool{p}_idx``/``pool{p}_hw`` from
    :func:`apply_encoder` with ``with_pool_argmax=True``; pools are numbered in
    encoder order, so decoder stage k consumes them in reverse.
    """
    assert spec.kind == "decoder"
    n_unpool = sum(1 for l in spec.layers if l.unpool_after)
    p_no = n_unpool
    last = spec.layers[-1]
    for layer in spec.layers:
        p = params[layer.name]
        relu = layer.relu and layer is not last
        x = conv3x3(x, p["w"], p["b"], relu=relu)
        if layer.unpool_after:
            idx = pool_idx[f"pool{p_no}_idx"]
            hw = pool_idx[f"pool{p_no}_hw"]
            x = max_unpool_2x2(x, idx, (int(hw[0]), int(hw[1])))  # hw is a static tuple
            p_no -= 1
    return x
