"""MobileNetV1 WCT encoders + checkpoint converter support.

The reference ships ``tools/convert_original_mobilenet_to_mine.py``, a
converter from a stock MobileNetV1 classifier checkpoint to five truncated
``Encoder{1..5}`` feature extractors — but the ``model_MobileNet`` module it
imports was never committed, so the tool is dead code upstream. This module
is the working equivalent: the architecture is reconstructed from the
converter's own tensor maps (convert_original_mobilenet_to_mine.py:11-49),
which index the standard MobileNetV1 backbone (``model.0`` = 3x3 conv+BN,
``model.1..8`` = depthwise-separable blocks with sub-indices 0/1 = dw
conv/BN and 3/4 = pw conv/BN) and truncate it at five tap points:

=======  =======================  ========  ===========
encoder  last layer (ref name)    channels  cum. stride
=======  =======================  ========  ===========
1        ``bn11``  (model.0 BN)   32        2
2        ``bn31``  (model.2 dw)   64        4
3        ``bn51``  (model.4 dw)   128       8
4        ``bn71``  (model.6 dw)   256       16
5        ``bn91``  (model.8 dw)   512       16
=======  =======================  ========  ===========

TPU-first design decisions (vs a literal port):

* **BatchNorm is folded into the convs at conversion time.** These encoders
  are inference feature extractors (the converter is the only consumer
  upstream); folding gives a pure conv/relu graph — no BN params at
  runtime, one fused multiply-add fewer per layer, and the same flat
  ``{name: {"w": HWIO, "b": (C,)}}`` param tree every other model family
  here uses.
* **Depthwise convs lower via ``feature_group_count``** — XLA maps them to
  the VPU/MXU natively; weights are stored HWIO with I=1.
* Each truncation point ends on a BN; MobileNetV1 always follows BN with
  ReLU, and WCT taps are relu features, so the encoders end with ReLU.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "MOBILENET_BLOCKS",
    "mobilenet_layer_table",
    "MOBILENET_TAP_WIDTHS",
    "fold_batchnorm",
    "convert_mobilenet_state_dict",
    "apply_mobilenet_encoder",
    "mobilenet_param_shapes",
]

# Standard MobileNetV1 backbone, blocks 0..8 — all the reference tensor maps
# reach. (cin, cout, stride); block 0 is the full 3x3 conv, blocks >= 1 are
# depthwise-separable (3x3 dw stride s on cin, then 1x1 pw cin -> cout).
MOBILENET_BLOCKS: list[tuple[int, int, int]] = [
    (3, 32, 2),      # model.0  conv_bn
    (32, 64, 1),     # model.1  conv_dw
    (64, 128, 2),    # model.2
    (128, 128, 1),   # model.3
    (128, 256, 2),   # model.4
    (256, 256, 1),   # model.5
    (256, 512, 2),   # model.6
    (512, 512, 1),   # model.7
    (512, 512, 1),   # model.8
]

# Encoder stage -> index of the last (block, part) included, matching the
# reference tensor maps: stage 1 stops after model.0's BN, stages 2..5 stop
# after the DEPTHWISE BN of blocks 2/4/6/8 (the pw half of the final block
# is not part of the encoder).
_STAGE_END: dict[int, tuple[int, str]] = {
    1: (0, "std"),
    2: (2, "dw"),
    3: (4, "dw"),
    4: (6, "dw"),
    5: (8, "dw"),
}

MOBILENET_TAP_WIDTHS = [32, 64, 128, 256, 512]


def mobilenet_layer_table(stage: int) -> list[dict]:
    """Ordered layer list for encoder ``stage``.

    Each entry: ``{"name", "kind" ("std"|"dw"|"pw"), "block", "cin",
    "cout", "stride"}``. Names follow the reference converter's scheme
    (conv_original_mobilenet_to_mine.py:11-21): row r = block r-1,
    ``conv{r}1`` = the block's full/dw conv, ``conv{r}2`` = its pw conv.
    """
    if stage not in _STAGE_END:
        raise ValueError(f"stage must be 1..5, got {stage}")
    end_block, end_part = _STAGE_END[stage]
    table: list[dict] = []
    for b, (cin, cout, stride) in enumerate(MOBILENET_BLOCKS):
        if b > end_block:
            break
        r = b + 1
        if b == 0:
            table.append({"name": f"conv{r}1", "kind": "std", "block": b,
                          "cin": cin, "cout": cout, "stride": stride})
            continue
        table.append({"name": f"conv{r}1", "kind": "dw", "block": b,
                      "cin": cin, "cout": cin, "stride": stride})
        if b == end_block and end_part == "dw":
            break
        table.append({"name": f"conv{r}2", "kind": "pw", "block": b,
                      "cin": cin, "cout": cout, "stride": 1})
    return table


def mobilenet_param_shapes(stage: int) -> dict[str, tuple[tuple[int, ...], tuple[int]]]:
    """name -> (folded HWIO weight shape, bias shape) for ``stage``."""
    shapes = {}
    for l in mobilenet_layer_table(stage):
        if l["kind"] == "std":
            w = (3, 3, l["cin"], l["cout"])
        elif l["kind"] == "dw":
            w = (3, 3, 1, l["cout"])
        else:
            w = (1, 1, l["cin"], l["cout"])
        shapes[l["name"]] = (w, (l["cout"],))
    return shapes


def fold_batchnorm(w: np.ndarray, gamma: np.ndarray, beta: np.ndarray,
                   mean: np.ndarray, var: np.ndarray,
                   eps: float = 1e-5) -> tuple[np.ndarray, np.ndarray]:
    """Fold an inference BN (scale gamma, shift beta, running mean/var) into
    the preceding bias-free conv: returns (w', b') with
    ``w' = w * gamma/sqrt(var+eps)`` (per output channel, HWIO minor) and
    ``b' = beta - mean * gamma/sqrt(var+eps)``."""
    scale = gamma / np.sqrt(var + eps)
    return (w * scale[None, None, None, :]).astype(np.float32), \
        (beta - mean * scale).astype(np.float32)


def _strip_prefix(key: str) -> str:
    for pre in ("module.model.", "model."):
        if key.startswith(pre):
            return key[len(pre):]
    return key


def convert_mobilenet_state_dict(state_dict, stage: int, *,
                                 eps: float = 1e-5) -> dict[str, dict[str, np.ndarray]]:
    """Stock MobileNetV1 state dict -> folded param tree for encoder ``stage``.

    Accepts the reference converter's input format
    (convert_original_mobilenet_to_mine.py:52-53): keys
    ``module.model.<block>.<sub>.{weight,bias,running_mean,running_var}``
    where sub 0/1 = (dw or full) conv/BN and sub 3/4 = pw conv/BN. Conv
    weights are torch OIHW; depthwise weights OIHW with I=1 (groups=cin).
    BN is folded (see :func:`fold_batchnorm`); output tree is the
    framework-native ``{name: {"w": HWIO, "b": (C,)}}``.
    """
    flat = {}
    for key, val in state_dict.items():
        arr = val.numpy() if hasattr(val, "numpy") else np.asarray(val)
        flat[_strip_prefix(key)] = np.asarray(arr, dtype=np.float32)

    def get(block: int, sub: int, field: str) -> np.ndarray:
        key = f"{block}.{sub}.{field}"
        if key not in flat:
            raise KeyError(
                f"MobileNet checkpoint missing {key!r} (after stripping "
                f"'module.model.'); have e.g. {sorted(flat)[:4]}")
        return flat[key]

    tree: dict[str, dict[str, np.ndarray]] = {}
    for l in mobilenet_layer_table(stage):
        sub = 0 if l["kind"] in ("std", "dw") else 3
        w = get(l["block"], sub, "weight")           # OIHW
        if l["kind"] == "dw":
            if w.shape[1] != 1:
                raise ValueError(
                    f"{l['name']}: expected depthwise OIHW weight with I=1, "
                    f"got {w.shape}")
        w = np.ascontiguousarray(w.transpose(2, 3, 1, 0))  # -> HWIO
        wf, bf = fold_batchnorm(
            w,
            get(l["block"], sub + 1, "weight"),
            get(l["block"], sub + 1, "bias"),
            get(l["block"], sub + 1, "running_mean"),
            get(l["block"], sub + 1, "running_var"),
            eps=eps,
        )
        tree[l["name"]] = {"w": wf, "b": bf}
    return tree


def apply_mobilenet_encoder(params, x, stage: int):
    """Run MobileNet encoder ``stage`` on NHWC ``x``; returns named features.

    Keys: ``out`` (final relu) plus ``relu{k}`` at every lower stage's tap
    point, mirroring :func:`..models.vgg.apply_encoder`'s multi-tap shape.
    3x3 convs use explicit (1,1) zero padding — exact torch
    Conv2d(padding=1) parity at every stride (MobileNet classifiers were
    trained with zero pad, unlike the VGG WCT stack's reflect pad).
    """
    import jax.lax as lax
    import jax.numpy as jnp

    dn = lax.conv_dimension_numbers(x.shape, (3, 3, 1, 1), ("NHWC", "HWIO", "NHWC"))
    tap_last = {mobilenet_layer_table(s)[-1]["name"]: f"relu{s}"
                for s in range(1, stage + 1)}
    outs: dict[str, object] = {}
    for l in mobilenet_layer_table(stage):
        p = params[l["name"]]
        w = jnp.asarray(p["w"], x.dtype)
        b = jnp.asarray(p["b"], x.dtype)
        groups = l["cin"] if l["kind"] == "dw" else 1
        # explicit (1,1) zero pad = torch Conv2d(padding=1) exactly, incl.
        # the stride-2 window positions ("SAME" pads (0,1) there instead)
        pad = [(1, 1), (1, 1)] if l["kind"] != "pw" else "VALID"
        x = lax.conv_general_dilated(
            x, w, window_strides=(l["stride"], l["stride"]), padding=pad,
            dimension_numbers=dn, feature_group_count=groups,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype) + b
        x = jnp.maximum(x, 0)
        name = tap_last.get(l["name"])
        if name:
            outs[name] = x
    outs["out"] = x
    return outs
