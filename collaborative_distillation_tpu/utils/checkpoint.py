"""Checkpoint save/restore with real resume.

The reference only ever *saves* (``{"epoch": E, "model": state_dict}`` once
per epoch, main.py:129-134) — its ``--resume`` flag is threaded into the log
dir and never restores state (SURVEY.md §5). Here both directions work, over
arbitrary pytrees (params + optimizer state + metadata), in a plain .npz
flat-tree format: single-host friendly, hermetic for tests, and with atomic
replace so a crash mid-save never corrupts the previous checkpoint.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint",
           "save_checkpoint_orbax", "load_checkpoint_orbax"]


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        out[f"{prefix}__none__"] = np.zeros(0)
    elif hasattr(tree, "shape") and hasattr(tree, "dtype"):
        out[prefix[:-1]] = np.asarray(tree)
    else:
        out[f"{prefix}__json__"] = np.asarray([json.dumps(tree)])
    return out


def save_checkpoint(path: str, tree) -> None:
    """Save a pytree (dicts/sequences/arrays/scalars) to ``<path>.npz``."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten(jax.tree.map(np.asarray, tree))
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def save_checkpoint_orbax(path: str, tree) -> None:
    """Orbax backend: async-capable, sharding-aware — the right choice on
    multi-host TPU pods (the .npz backend is single-host)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(np.asarray, tree), force=True)


def load_checkpoint_orbax(path: str, like):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, like))


def load_checkpoint(path: str, like):
    """Restore a pytree with the structure (and leaf shapes) of ``like``.

    Sequence/namedtuple structure comes from the template (optax states are
    namedtuple trees), so the on-disk format stays a flat name->array map.
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}

    def build(prefix, template):
        if isinstance(template, dict):
            return {k: build(f"{prefix}{k}/", v) for k, v in template.items()}
        if isinstance(template, (list, tuple)):
            items = [build(f"{prefix}{i}/", v) for i, v in enumerate(template)]
            if hasattr(template, "_fields"):  # namedtuple
                return type(template)(*items)
            return type(template)(items)
        if template is None:
            if f"{prefix}__none__" not in flat:
                raise KeyError(f"checkpoint missing None marker at {prefix!r}")
            return None
        if f"{prefix}__json__" in flat:
            return json.loads(str(flat[f"{prefix}__json__"][0]))
        key = prefix[:-1]
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        if hasattr(template, "shape") and tuple(arr.shape) != tuple(template.shape):
            raise ValueError(
                f"checkpoint leaf {key!r} shape {arr.shape} != expected {template.shape}")
        return arr

    return build("", like)
