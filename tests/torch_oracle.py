"""Independent torch-functional oracle used only by tests.

Re-implements the reference's layer semantics (reflect-pad + 3x3 conv + relu,
2x2 floor max-pool, nearest 2x upsample; model_original.py forward methods)
directly with torch.nn.functional on CPU, driven by OUR declarative specs and
OUR converted weights. This gives an implementation-independent numerical
oracle for the JAX ops/models without importing any reference code.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from collaborative_distillation_tpu.models.specs import StageSpec


def _t(params, name, key):
    arr = np.asarray(params[name][key])
    if key == "w":
        arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
    return torch.from_numpy(np.ascontiguousarray(arr)).double()


def _conv3x3(x, w, b, relu=True):
    x = F.pad(x, (1, 1, 1, 1), mode="reflect")
    y = F.conv2d(x, w, b)
    return F.relu(y) if relu else y


def encoder_forward(params, x_nhwc: np.ndarray, spec: StageSpec, aux_relu=False):
    """Returns dict of NHWC numpy features mirroring vgg.apply_encoder."""
    assert spec.kind == "encoder"
    x = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)).double()
    outs = {}
    if spec.has_conv0:
        x = F.conv2d(x, _t(params, "conv0", "w"), _t(params, "conv0", "b"))
    for layer in spec.layers:
        x = _conv3x3(x, _t(params, layer.name, "w"), _t(params, layer.name, "b"), layer.relu)
        if layer.tap:
            outs[layer.tap] = x
        if layer.pool_after:
            x = F.max_pool2d(x, 2, 2)
    outs["out"] = x
    for layer in spec.aux:
        src = outs[f"relu{layer.name[4]}1"]
        y = F.conv2d(src, _t(params, layer.name, "w"), _t(params, layer.name, "b"))
        outs[layer.tap] = F.relu(y) if aux_relu else y
    return {k: v.numpy().transpose(0, 2, 3, 1) for k, v in outs.items()}


def decoder_forward(params, x_nhwc: np.ndarray, spec: StageSpec, aux_relu=False):
    assert spec.kind == "decoder"
    x = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)).double()
    outs = {}
    for layer in spec.layers:
        x = _conv3x3(x, _t(params, layer.name, "w"), _t(params, layer.name, "b"), layer.relu)
        if layer.unpool_after:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
        if layer.tap:
            outs[layer.tap] = x
    outs["out"] = x
    for layer in spec.aux:
        src = outs[f"dec{layer.name[3]}1"]
        y = F.conv2d(src, _t(params, layer.name, "w"), _t(params, layer.name, "b"))
        outs[layer.tap] = F.relu(y) if aux_relu else y
    return {k: v.numpy().transpose(0, 2, 3, 1) for k, v in outs.items()}


def wct_oracle(cf_chw: np.ndarray, sf_chw: np.ndarray, alpha: float) -> np.ndarray:
    """Reference WCT math in float64 numpy: whiten content, color with style
    (util_wct.py:62-131 semantics, SVD of covariance == eigh for PSD)."""
    C = cf_chw.shape[0]
    cf = cf_chw.reshape(C, -1).astype(np.float64)
    sf = sf_chw.reshape(sf_chw.shape[0], -1).astype(np.float64)
    c_mean = cf.mean(1, keepdims=True)
    cfc = cf - c_mean
    c_cov = cfc @ cfc.T / (cf.shape[1] - 1)
    s_mean = sf.mean(1, keepdims=True)
    sfc = sf - s_mean
    s_cov = sfc @ sfc.T / (sf.shape[1] - 1)

    def isqrt(a):
        lam, v = np.linalg.eigh(a)
        lam = np.maximum(lam, 1e-12)
        return (v * lam ** -0.5) @ v.T

    def sqrt(a):
        lam, v = np.linalg.eigh(a)
        lam = np.maximum(lam, 0)
        return (v * lam ** 0.5) @ v.T

    target = sqrt(s_cov) @ (isqrt(c_cov) @ cfc) + s_mean
    out = alpha * target + (1 - alpha) * cf
    return out.reshape(cf_chw.shape)
