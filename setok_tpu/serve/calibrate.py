"""Activation calibration for int4-at-rest serving (GPTQ-lite, offline).

`quantize_weight_int4(clip_search=R, row_weight=d)` can minimize the
OUTPUT error of each linear instead of plain weight error when it knows
the per-input-feature second moments d_k = E[x_k²] (a diagonal-Hessian
importance — rows of W that real activations never excite may quantize
coarsely for free). This module collects those moments with a flax
method interceptor over an eager float forward: no model changes, no
extra sow state, works on any prompt batch.

Reference lineage: bnb 4-bit loading is RTN-only (builder.py:32-41);
GPTQ/AWQ add calibration as an offline pass — this is that pass, sized
to the diagonal approximation the clip-search supports.

Usage (offline, before quantize_trunk_weights):
    rw = collect_row_weights(model, params,
                             lambda m, p: m.apply(p, ids, method=...))
    qparams = quantize_trunk_weights(params, bits=4, group_size=128,
                                     clip_search=8, row_weights=rw)
Run the forward EAGERLY (no jax.jit around it) — the interceptor needs
concrete values.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from setok_tpu.models.llama import _TRUNK_LINEARS


def collect_row_weights(run: Callable[[], Any],
                        names: Tuple[str, ...] = _TRUNK_LINEARS
                        ) -> Dict[Tuple[str, ...], np.ndarray]:
    """Execute `run()` (an eager float forward) under an interceptor and
    return {module_path: (K,) float32 E[x_k²]} for every nn.Dense whose
    name is in `names`. Accumulates across multiple linears calls (e.g.
    several decode steps inside `run`)."""
    sums: Dict[Tuple[str, ...], np.ndarray] = {}
    counts: Dict[Tuple[str, ...], int] = {}

    def interceptor(fn, args, kwargs, context):
        if (context.method_name == "__call__"
                and isinstance(context.module, nn.Dense)
                and context.module.path
                and context.module.path[-1] in names and args):
            x = np.asarray(jnp.asarray(args[0], jnp.float32))
            flat = x.reshape(-1, x.shape[-1])
            key = tuple(context.module.path)
            s = (flat * flat).sum(0)
            if key in sums:
                sums[key] += s
                counts[key] += flat.shape[0]
            else:
                sums[key] = s
                counts[key] = flat.shape[0]
        return fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        run()
    return {k: (v / max(counts[k], 1)).astype(np.float32)
            for k, v in sums.items()}


def lookup_row_weight(row_weights: Dict[Tuple[str, ...], np.ndarray],
                      path: Tuple[str, ...]):
    """Match a param-tree path against collected module paths.

    The param tree may be rooted differently from the module tree (e.g.
    walking starts under {'params': ...} or at the llama subtree), so
    exact match first, then unique-suffix match."""
    if path in row_weights:
        return row_weights[path]
    hits = [v for k, v in row_weights.items()
            if k[-len(path):] == path or path[-len(k):] == k]
    return hits[0] if len(hits) == 1 else None
