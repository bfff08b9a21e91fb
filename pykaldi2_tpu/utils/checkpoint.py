"""Pytree checkpointing with atomic writes and resume.

Reference behavior: per-epoch ``torch.save({model, optimizer, epoch})`` +
``-resume_from_model`` / ``-seed_model`` warm starts (SURVEY.md §6.4). Here a
checkpoint is an .npz of the flattened (params, opt_state, extra) pytree plus
a JSON sidecar of metadata, written to a temp file and atomically renamed.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = jax.tree_util.keystr(path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(template, flat: dict):
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_leaves:
        key = jax.tree_util.keystr(path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = flat[key]
        want = np.shape(leaf)
        if tuple(arr.shape) != tuple(want):
            raise ValueError(f"shape mismatch for {key}: ckpt {arr.shape} vs model {want}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path: str, params, opt_state=None, meta: Optional[dict] = None):
    """Write {params, opt_state} → path(.npz) atomically, meta → path.json."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    flat = _flatten(tree)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)
    if meta is not None:
        tmpm = path + ".json.tmp"
        with open(tmpm, "w") as f:
            json.dump(meta, f)
        os.replace(tmpm, path + ".json")


def load_checkpoint(path: str, params_template, opt_state_template=None) -> Tuple[Any, Any, dict]:
    """Restore (params, opt_state, meta); opt_state None if not requested/stored."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    params = _unflatten(
        {"params": params_template},
        {k: v for k, v in flat.items() if k.startswith("['params']")},
    )["params"]
    opt_state = None
    if opt_state_template is not None:
        sub = {k: v for k, v in flat.items() if k.startswith("['opt_state']")}
        if sub:
            opt_state = _unflatten({"opt_state": opt_state_template}, sub)["opt_state"]
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return params, opt_state, meta


def latest_checkpoint(exp_dir: str, prefix: str = "model") -> Optional[str]:
    """Highest-epoch ``{prefix}.<n>.npz`` in exp_dir, or None."""
    if not os.path.isdir(exp_dir):
        return None
    best, best_n = None, -1
    pat = re.compile(rf"^{re.escape(prefix)}\.(\d+)\.npz$")
    for name in os.listdir(exp_dir):
        m = pat.match(name)
        if m and int(m.group(1)) > best_n:
            best_n, best = int(m.group(1)), os.path.join(exp_dir, name)
    return best
