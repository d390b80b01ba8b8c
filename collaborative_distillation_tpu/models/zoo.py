"""Model zoo: inference-mode -> (spec, weights) resolution.

Mirrors the checkpoint-path tables of the reference CLIs (WCT.py:36-75 mode ->
e1..e5/d1..d5 paths; main.py:66-69 BE/BD/SE defaults), but over the converted
``.npz`` weight store (see :mod:`..utils.torch_convert` and
``cli/convert.py``).

Weight store layout (relative to a ``weights_root``)::

    original/e{k}.npz   teacher encoders  (from vgg_normalised_conv{k}_1.t7)
    original/d{k}.npz   teacher decoders  (from feature_invertor_conv{k}_1.t7
                        or our_BD/{k}BD_E30S0.pth)
    16x/e{k}.npz        trained small encoders (wct_se_16x_new/{k}SE.pth)
    16x/d{k}.npz        trained small decoders (wct_se_16x_new_sd/{k}SD.pth)
    16x_kd2sd/d{k}.npz  kd2sd small decoders
    16x_base/e{k}.npz   L1-pruned inits (small16x_ae_base/e{k}_base.pth)
    16x_base/d{k}.npz
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..utils.torch_convert import load_tree_npz
from .specs import StageSpec, decoder_spec, encoder_spec

__all__ = ["default_weights_root", "stage_specs", "load_stage_params", "load_pyramid", "PREPROC_CONV0"]

# The hardcoded preprocessing conv baked into Encoder5 (model_original.py:428-433):
# RGB->BGR, x255, subtract the Caffe VGG ImageNet mean. HWIO layout.
PREPROC_CONV0 = {
    "w": np.array([[[[0.0, 0.0, 255.0],
                     [0.0, 255.0, 0.0],
                     [255.0, 0.0, 0.0]]]], dtype=np.float32),  # (1,1,3,3) HWIO
    "b": np.array([-103.939, -116.779, -123.68], dtype=np.float32),
}


def default_weights_root() -> str:
    env = os.environ.get("CD_TPU_WEIGHTS")
    if env:
        return env
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "weights")


def _family_and_dirs(mode: str) -> tuple[str, str, str]:
    """mode -> (family, encoder subdir, decoder subdir)."""
    if mode == "original":
        return "original", "original", "original"
    if mode == "16x":
        return "16x", "16x", "16x"
    if mode == "16x_kd2sd":
        return "16x", "16x", "16x_kd2sd"
    if mode == "16x_base":
        return "16x", "16x_base", "16x_base"
    raise ValueError(f"unknown mode {mode!r} (original | 16x | 16x_kd2sd | 16x_base)")


def stage_specs(mode: str, stage: int) -> tuple[StageSpec, StageSpec]:
    """(encoder_spec, decoder_spec) for an inference mode, matching
    util_wct.py:30-59's class choices per mode."""
    family, _, _ = _family_and_dirs(mode)
    enc = encoder_spec(family, stage, aux=(family == "16x"))
    dec = decoder_spec(family, stage, aux=(mode == "16x_kd2sd"))
    return enc, dec


# actionable guidance when a weight store entry is absent, keyed by the
# store subdirectory. The originals are external downloads in the REFERENCE
# checkout too (README.md:26/62) — don't let that surface as a bare
# FileNotFoundError deep in np.load.
_STORE_HINTS = {
    "original": (
        "The teacher autoencoders are external downloads in the reference "
        "too: get `vgg_normalised_conv{k}_1.t7` (+ `feature_invertor_conv"
        "{k}_1.t7` or `our_BD/{k}BD_E30S0.pth`) per the reference README, "
        "put them under <trained_models>/original_wct_models/, then run\n"
        "  python -m collaborative_distillation_tpu.cli.convert "
        "--reference <trained_models> --out <weights_root>\n"
        "For a self-contained smoke teacher (no downloads) run\n"
        "  python -m collaborative_distillation_tpu.cli.make_teacher "
        "--out <weights_root>"),
    "16x": (
        "Convert the reference's shipped 16x checkpoints with\n"
        "  python -m collaborative_distillation_tpu.cli.convert "
        "--reference <trained_models> --out <weights_root>"),
    "16x_kd2sd": (
        "The kd2sd decoders are external downloads in the reference too "
        "(wct_se_16x_new_sd_kd2sd/{k}SD.pth); download, then run\n"
        "  python -m collaborative_distillation_tpu.cli.convert "
        "--reference <trained_models> --out <weights_root>\n"
        "or train them here:\n"
        "  python -m collaborative_distillation_tpu.cli.train "
        "--mode wct_sd_kd2sd --stage <k> ..."),
    "16x_base": (
        "Generate the L1-pruned student inits with\n"
        "  python -m collaborative_distillation_tpu.cli.convert ... "
        "(converts small16x_ae_base) or\n"
        "  python -m collaborative_distillation_tpu.cli.prune "
        "--teacher <weights_root>/original/e{k}.npz ..."),
}


def _missing_store_error(path: str) -> FileNotFoundError:
    family = os.path.basename(os.path.dirname(path))
    hint = _STORE_HINTS.get(family, _STORE_HINTS["16x"])
    return FileNotFoundError(
        f"weight store entry not found: {path}\n{hint}")


def load_stage_params(path: str, spec: StageSpec, dtype=jnp.float32):
    """Load one stage's params; validates shapes against the spec.

    Missing aux layers (the pruned-init base checkpoints carry no decoder aux)
    are zero-initialized. A missing conv0 falls back to the hardcoded
    preprocessing conv (the t7 teachers before normalization lacked it).
    """
    if not os.path.exists(path):
        raise _missing_store_error(path)
    tree = load_tree_npz(path)
    expected = spec.param_shapes()
    params = {}
    for name, (wshape, bshape) in expected.items():
        if name in tree:
            w = np.asarray(tree[name]["w"], np.float32)
            b = np.asarray(tree[name]["b"], np.float32)
        elif name == "conv0":
            w, b = PREPROC_CONV0["w"], PREPROC_CONV0["b"]
        elif name.endswith("_aux") or name.startswith("aux"):
            w = np.zeros(wshape, np.float32)
            b = np.zeros(bshape, np.float32)
        else:
            raise KeyError(f"{path}: missing layer {name!r}")
        if w.shape != wshape or b.shape != bshape:
            raise ValueError(
                f"{path}: layer {name!r} shape {w.shape}/{b.shape} != spec {wshape}/{bshape}")
        params[name] = {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)}
    extra = set(tree) - set(expected)
    if extra:
        raise ValueError(f"{path}: unexpected layers {sorted(extra)}")
    return params


def load_pyramid(mode: str, weights_root: str | None = None, *, stages=(5, 4, 3, 2, 1), dtype=jnp.float32):
    """Load the full 5-level encoder/decoder pyramid for a mode.

    Returns ``{stage: {"enc_spec", "dec_spec", "enc", "dec"}}``, the TPU
    analogue of ``WCT.__init__`` (util_wct.py:30-59).
    """
    root = weights_root or default_weights_root()
    _, enc_dir, dec_dir = _family_and_dirs(mode)
    pyramid = {}
    for k in stages:
        enc_spec, dec_spec_ = stage_specs(mode, k)
        pyramid[k] = {
            "enc_spec": enc_spec,
            "dec_spec": dec_spec_,
            "enc": load_stage_params(os.path.join(root, enc_dir, f"e{k}.npz"), enc_spec, dtype),
            "dec": load_stage_params(os.path.join(root, dec_dir, f"d{k}.npz"), dec_spec_, dtype),
        }
    return pyramid
