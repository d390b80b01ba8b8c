"""One-time converters: legacy torch checkpoints -> framework-native .npz.

The reference ships weights in two legacy formats:

* pre-1.6 torch pickle ``.pth`` files, ``{"epoch": int, "model": state_dict}``
  or a bare state dict (main.py:131-134, model_cd.py:71-77);
* Torch7 Lua ``.t7`` files for the teacher VGG autoencoders, read via the
  long-removed ``torch.utils.serialization.load_lua``
  (model_original.py:26, 452-486).

This module converts either into a flat ``{conv_name: {"w": HWIO f32,
"b": (out,) f32}}`` tree saved as ``.npz`` with keys ``"<name>/w"`` /
``"<name>/b"``. The runtime never touches torch; only this offline tool does.
"""

from __future__ import annotations

import os
import re

import numpy as np

__all__ = [
    "state_dict_to_tree",
    "convert_pth",
    "convert_t7_sequential",
    "save_tree_npz",
    "load_tree_npz",
    "T7_ENCODER_LAYER_INDEX",
    "T7_DECODER_LAYER_INDEX",
]


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    if w.ndim != 4:
        raise ValueError(f"expected 4-D conv weight, got shape {w.shape}")
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def state_dict_to_tree(state_dict) -> dict[str, dict[str, np.ndarray]]:
    """torch state dict {name.weight/bias: tensor} -> {name: {w HWIO, b}}."""
    tree: dict[str, dict[str, np.ndarray]] = {}
    for key, val in state_dict.items():
        arr = np.asarray(getattr(val, "numpy", lambda: val)() if hasattr(val, "numpy") else val,
                         dtype=np.float32)
        m = re.fullmatch(r"(.+)\.(weight|bias)", key)
        if not m:
            raise ValueError(f"unrecognized state-dict key {key!r}")
        name, kind = m.groups()
        entry = tree.setdefault(name, {})
        if kind == "weight":
            entry["w"] = _oihw_to_hwio(arr)
        else:
            entry["b"] = arr
    for name, entry in tree.items():
        if "w" not in entry or "b" not in entry:
            raise ValueError(f"layer {name!r} missing weight or bias")
    return tree


def convert_pth(path: str) -> dict[str, dict[str, np.ndarray]]:
    """Load a legacy ``.pth`` (optionally ``{"model": sd}``-wrapped) and convert.

    Equivalent of the reference's ``smart_load`` format sniffing (utils.py:90-98).
    Requires torch (CPU) — offline use only.
    """
    import torch  # local import: runtime stays torch-free

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and not any(hasattr(v, "numpy") for v in obj.values()):
        for v in obj.values():
            if isinstance(v, dict):
                obj = v
                break
    return state_dict_to_tree(obj)


# Torch7 nn.Sequential module index -> conv name, for the teacher models.
# Mirrors the explicit load_param tables in model_original.py (Encoder5 t7
# branch at 452-486 and Decoder5 at 561-575); index 0 is the conv0
# preprocessing layer present in all encoder t7 files.
T7_ENCODER_LAYER_INDEX: dict[int, dict[int, str]] = {
    1: {0: "conv0", 2: "conv11"},
    2: {0: "conv0", 2: "conv11", 5: "conv12", 9: "conv21"},
    3: {0: "conv0", 2: "conv11", 5: "conv12", 9: "conv21", 12: "conv22", 16: "conv31"},
    4: {0: "conv0", 2: "conv11", 5: "conv12", 9: "conv21", 12: "conv22", 16: "conv31",
        19: "conv32", 22: "conv33", 25: "conv34", 29: "conv41"},
    5: {0: "conv0", 2: "conv11", 5: "conv12", 9: "conv21", 12: "conv22", 16: "conv31",
        19: "conv32", 22: "conv33", 25: "conv34", 29: "conv41", 32: "conv42",
        35: "conv43", 38: "conv44", 42: "conv51"},
}
T7_DECODER_LAYER_INDEX: dict[int, dict[int, str]] = {
    1: {1: "conv11"},
    2: {1: "conv21", 5: "conv12", 8: "conv11"},
    3: {1: "conv31", 5: "conv22", 8: "conv21", 12: "conv12", 15: "conv11"},
    4: {1: "conv41", 5: "conv34", 8: "conv33", 11: "conv32", 14: "conv31",
        18: "conv22", 21: "conv21", 25: "conv12", 28: "conv11"},
    5: {1: "conv51", 5: "conv44", 8: "conv43", 11: "conv42", 14: "conv41",
        18: "conv34", 21: "conv33", 24: "conv32", 27: "conv31", 31: "conv22",
        34: "conv21", 38: "conv12", 41: "conv11"},
}


def convert_t7_sequential(path: str, index_map: dict[int, str]) -> dict[str, dict[str, np.ndarray]]:
    """Convert a Torch7 ``.t7`` nn.Sequential checkpoint using our own minimal
    deserializer (:mod:`.t7reader`) — ``load_lua`` died with torch 0.4."""
    from .t7reader import read_t7_conv_layers

    layers = read_t7_conv_layers(path)
    tree: dict[str, dict[str, np.ndarray]] = {}
    for idx, name in index_map.items():
        if idx not in layers:
            raise KeyError(f"{path}: t7 module index {idx} not found (have {sorted(layers)})")
        w, b = layers[idx]
        tree[name] = {"w": _oihw_to_hwio(w.astype(np.float32)), "b": b.astype(np.float32)}
    return tree


def save_tree_npz(tree: dict[str, dict[str, np.ndarray]], path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {f"{name}/{k}": v for name, entry in tree.items() for k, v in entry.items()}
    np.savez(path, **flat)


def load_tree_npz(path: str) -> dict[str, dict[str, np.ndarray]]:
    with np.load(path) as data:
        tree: dict[str, dict[str, np.ndarray]] = {}
        for key in data.files:
            name, kind = key.rsplit("/", 1)
            tree.setdefault(name, {})[kind] = data[key]
    return tree
