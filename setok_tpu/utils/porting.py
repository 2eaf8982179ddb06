"""Load flat 'a/b/c' weight dicts (scripts/port_weights.py output) into
nested flax param trees, matching by path suffix."""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np
import jax


def _path_names(path) -> Tuple[str, ...]:
    out = []
    for p in path:
        key = getattr(p, "key", None)
        out.append(str(key if key is not None else p))
    return tuple(out)


def _normalize_key(key: str) -> tuple:
    """Accept both 'a/b/c' (porter format) and keystr "['a']['b']['c']"
    (save_subtree format)."""
    if key.startswith("['"):
        return tuple(key[2:-2].split("']['"))
    return tuple(key.split("/"))


def load_flat_into(params: Any, flat: Dict[str, np.ndarray],
                   strict: bool = False) -> Tuple[Any, List[str]]:
    """Replace leaves of `params` whose path ends with a flat key's
    components. Returns (new_params, unmatched_flat_keys)."""
    flat_items = {_normalize_key(k): np.asarray(v)
                  for k, v in flat.items()}
    used = set()
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in leaves:
        names = _path_names(path)
        hit = None
        for fk in flat_items:
            if names[-len(fk):] == fk:
                hit = fk
                break
        if hit is not None:
            arr = flat_items[hit]
            assert arr.shape == leaf.shape, (
                f"shape mismatch at {names}: ported {arr.shape} vs model "
                f"{leaf.shape}")
            out.append(jax.numpy.asarray(arr, leaf.dtype))
            used.add(hit)
        else:
            out.append(leaf)
    unmatched = ["/".join(k) for k in flat_items if k not in used]
    if strict and unmatched:
        raise KeyError(f"unmatched ported keys: {unmatched[:10]}")
    return jax.tree_util.tree_unflatten(treedef, out), unmatched
