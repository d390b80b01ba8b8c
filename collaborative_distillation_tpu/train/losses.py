"""Collaborative-distillation loss graphs.

Pure-function rewrites of the reference's three nn.Module training wrappers
(model/model.py):

* :func:`se_distill_losses`   — TrainSE_With_WCTDecoder.forward (model.py:13-34):
  train the small encoder (SE) so its up-dimensioned aux features drive the
  frozen big decoder (BD); feat-KD on 5 relu taps + pixel + perceptual loss.
* :func:`sd_reconstruct_losses` — TrainSD_With_WCTSE.forward (model.py:44-56):
  train the small decoder (SD) to invert the frozen SE; pixel + perceptual.
* :func:`kd2sd_losses`        — TrainSD_With_WCTSE_KD2SD.forward (model.py:67-88):
  adds decoder-feature KD: SD's aux taps match the frozen BD's decoder taps.

All teacher/frozen params enter behind ``lax.stop_gradient`` so a single
``jax.grad`` over the student leaf gives exactly the reference's gradients;
the wrapper dicts returned include the reconstruction for sample dumps
(main.py:121-126).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..models.specs import StageSpec
from ..models.vgg import apply_decoder, apply_encoder

__all__ = ["mse", "se_distill_losses", "sd_reconstruct_losses", "kd2sd_losses"]


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


def _taps(outs: dict, prefix: str, stage: int) -> list[jax.Array]:
    return [outs[f"{prefix}{k}1"] for k in range(1, stage + 1)]


def se_distill_losses(
    se_params,
    frozen,            # {"be": BE params, "bd": BD params}
    batch: jax.Array,  # (N, H, W, 3) content images
    *,
    se_spec: StageSpec,
    be_spec: StageSpec,
    bd_spec: StageSpec,
    aux_relu: bool = False,
    terms: tuple[str, ...] | None = None,
):
    """SE-stage losses; returns (loss_dict, rec_image).

    feat: sum_k MSE(SE aux_k, BE relu_k)            (model.py:24-26)
    pixl: MSE(BD(SE aux_K), content)                 (model.py:16, 29)
    perc: sum_k MSE(BE(rec) relu_k, BE(c) relu_k)    (model.py:30-33)

    ``terms`` restricts which losses are computed (and returned) — a
    zero-weighted term would be dead in the backward pass anyway, but its
    FORWARD cost (a full BE encode for ``perc``) is not DCE'd by XLA because
    the value is returned for logging; skipping it here removes it entirely.
    """
    stage = se_spec.stage
    want = set(terms) if terms is not None else {"feat", "pixl", "perc"}
    frozen = lax.stop_gradient(frozen)
    be, bd = frozen["be"], frozen["bd"]

    c_se = apply_encoder(se_params, batch, se_spec, aux_relu=aux_relu)
    rec = apply_decoder(bd, c_se[f"aux{stage}1"], bd_spec)["out"]
    losses = {}
    if want & {"feat", "perc"}:
        c_be = apply_encoder(be, batch, be_spec)
    if "feat" in want:
        losses["feat"] = sum(mse(a, b) for a, b in zip(
            _taps(c_se, "aux", stage), _taps(c_be, "relu", stage)))
    if "pixl" in want:
        losses["pixl"] = mse(rec, batch)
    if "perc" in want:
        rec_be = apply_encoder(be, rec, be_spec)
        losses["perc"] = sum(mse(a, lax.stop_gradient(b)) for a, b in zip(
            _taps(rec_be, "relu", stage), _taps(c_be, "relu", stage)))
    return losses, rec


def sd_reconstruct_losses(
    sd_params,
    frozen,            # {"be": BE params, "se": SE params}
    batch: jax.Array,
    *,
    sd_spec: StageSpec,
    se_spec: StageSpec,
    be_spec: StageSpec,
    terms: tuple[str, ...] | None = None,
):
    """SD-stage losses; returns (loss_dict, rec_image).

    rec = SD(SE(c)) on native (pruned) widths (model.py:45); pixel loss +
    perceptual loss through the frozen big encoder (model.py:47-54).
    ``terms`` as in :func:`se_distill_losses` — with ``perc`` excluded the
    BE is never evaluated, so training runs without teacher weights at all.
    """
    stage = sd_spec.stage
    want = set(terms) if terms is not None else {"pixl", "perc"}
    frozen = lax.stop_gradient(frozen)
    se = frozen["se"]

    feat = apply_encoder(se, batch, se_spec)["out"]
    rec = apply_decoder(sd_params, feat, sd_spec)["out"]

    losses = {}
    if "pixl" in want:
        losses["pixl"] = mse(rec, batch)
    if "perc" in want:
        be = frozen["be"]
        rec_be = apply_encoder(be, rec, be_spec)
        c_be = apply_encoder(be, batch, be_spec)
        losses["perc"] = sum(mse(a, lax.stop_gradient(b)) for a, b in zip(
            _taps(rec_be, "relu", stage), _taps(c_be, "relu", stage)))
    return losses, rec


def kd2sd_losses(
    sd_params,
    frozen,            # {"be": BE, "bd": BD, "se": SE params}
    batch: jax.Array,
    *,
    sd_spec: StageSpec,   # decoder_spec("16x", k, aux=True)
    se_spec: StageSpec,   # encoder_spec("16x", k, aux=True)
    be_spec: StageSpec,
    bd_spec: StageSpec,
    aux_relu: bool = False,
):
    """KD2SD losses; returns (loss_dict, rec_image).

    The frozen SE produces both the up-dimensioned aux feature (driving the
    frozen BD, whose decoder taps become KD targets) and the native feature
    (driving the trainable SD, whose aux taps must match) — model.py:70-87.
    The SE aux here uses ReLU unconditionally, mirroring forward_aux2
    (model_cd.py:825-848); ``aux_relu`` controls the SD-side adapters only.
    """
    stage = sd_spec.stage
    frozen = lax.stop_gradient(frozen)
    be, bd, se = frozen["be"], frozen["bd"], frozen["se"]

    c_be = apply_encoder(be, batch, be_spec)
    c_se = apply_encoder(se, batch, se_spec, aux_relu=True)
    feats_bd = apply_decoder(bd, c_se[f"aux{stage}1"], bd_spec)
    feats_sd = apply_decoder(sd_params, c_se["out"], sd_spec, aux_relu=aux_relu)
    rec = feats_sd["out"]

    pixl = mse(rec, batch)
    rec_be = apply_encoder(be, rec, be_spec)
    perc = sum(mse(a, lax.stop_gradient(b))
               for a, b in zip(_taps(rec_be, "relu", stage), _taps(c_be, "relu", stage)))
    # decoder-feature KD: SD aux taps (k=K..2) + final image vs BD taps.
    kd = mse(rec, lax.stop_gradient(feats_bd["out"]))
    for k in range(2, stage + 1):
        kd = kd + mse(feats_sd[f"dec_aux{k}1"], lax.stop_gradient(feats_bd[f"dec{k}1"]))
    return {"pixl": pixl, "perc": perc, "kd": kd}, rec
