"""Checkpoint / resume for parameter pytrees.

The reference checkpoints implicitly: the embeddings folder + saved globals
ARE the state after every accepted SCG step, and ``--load`` resumes from them
(SURVEY.md §5 "Checkpoint / resume" [C-HIGH capability]). Here checkpointing
is explicit: one ``.npz`` file holds every leaf of the parameter pytree (keyed
by its tree path) plus a JSON metadata blob (config echo, iteration count,
bound value) — no pickling, fully inspectable with plain NumPy.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax

_META_KEY = "__gparml_meta__"


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save(path: str, params, meta: Optional[Dict[str, Any]] = None) -> None:
    """Save a parameter pytree (+ JSON-serializable metadata) to ``path``."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for keypath, leaf in leaves:
        arrays[_path_str(keypath)] = np.asarray(leaf)
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta or {}).encode("utf-8"), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    # np.savez appends .npz if missing; normalize then atomically replace.
    if not os.path.exists(tmp) and os.path.exists(tmp + ".npz"):
        tmp = tmp + ".npz"
    os.replace(tmp, path)


def load(path: str, like) -> Tuple[Any, Dict[str, Any]]:
    """Load a checkpoint into the structure of ``like`` (a template pytree
    with matching tree paths; shapes/dtypes come from the file).

    Returns (params, meta).
    """
    with np.load(path) as f:
        arrays = {k: f[k] for k in f.files}
    meta_raw = arrays.pop(_META_KEY, None)
    meta = (
        json.loads(bytes(meta_raw.tobytes()).decode("utf-8"))
        if meta_raw is not None
        else {}
    )
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for keypath, leaf in leaves_with_path:
        key = _path_str(keypath)
        if key not in arrays:
            raise KeyError(
                f"checkpoint {path} is missing leaf {key!r}; has {sorted(arrays)}"
            )
        arr = arrays[key]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"checkpoint {path} leaf {key!r} has shape {arr.shape}, "
                f"expected {tuple(leaf.shape)} — wrong N/Q/M configuration?"
            )
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), meta
