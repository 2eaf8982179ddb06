"""LoRA as a parameter-space transformation (JAX-idiomatic).

Parity: /root/reference/src/train/train_setokim.py:98-111 + 272-288 wraps
torch linear layers with peft's LoraConfig (`find_all_linear_names` excludes
the multimodal projector/tower modules); merging happens via PeftModel
(builder.py:52-86, scripts/merge_lora_weights.py).

The rebuild keeps the *model* untouched: LoRA lives beside the frozen base
as factored (A, B) pairs per targeted kernel, and `apply_lora` materializes
`W + (alpha/r)·A@B` right before `model.apply` — under jit this fuses into
the forward pass. Training takes gradients w.r.t. the LoRA tree only, which
is exactly peft's trainable-parameter split.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


EXCLUDE_DEFAULT = ("vision_tower", "mm_in_projector", "mm_out_projector",
                   "vision_generator", "diffloss", "embed_tokens", "lm_head")


def default_target_filter(path: str) -> bool:
    """Which kernels get adapters: every linear in the LLM trunk, excluding
    multimodal modules and heads (find_all_linear_names,
    train_setokim.py:98-111)."""
    if not path.endswith("['kernel']"):
        return False
    return not any(ex in path for ex in EXCLUDE_DEFAULT)


def _iter_kernels(params: Any):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        yield path, name, leaf


def init_lora(params: Any, rng: jax.Array, rank: int,
              target_filter: Callable[[str], bool] = default_target_filter
              ) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Build the LoRA tree: {path-str: {'a': (in, r), 'b': (r, out)}}.

    A ~ N(0, 1/r) (kaiming-ish), B = 0 — so the adapted model starts exactly
    at the base (peft convention).
    """
    lora: Dict[str, Dict[str, jnp.ndarray]] = {}
    for path, name, leaf in _iter_kernels(params):
        if getattr(leaf, "ndim", 0) == 2 and target_filter(name):
            rng, k = jax.random.split(rng)
            d_in, d_out = leaf.shape
            lora[name] = {
                "a": jax.random.normal(k, (d_in, rank),
                                       leaf.dtype) / np.sqrt(rank),
                "b": jnp.zeros((rank, d_out), leaf.dtype),
            }
    return lora


def apply_lora(params: Any, lora: Dict[str, Dict[str, jnp.ndarray]],
               alpha: float, rank: int) -> Any:
    """Materialize W' = W + (alpha/rank)·A@B for adapted kernels."""
    scale = alpha / rank
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        if name in lora:
            ab = lora[name]
            leaf = leaf + scale * (ab["a"] @ ab["b"]).astype(leaf.dtype)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def merge_lora(params: Any, lora: Dict[str, Dict[str, jnp.ndarray]],
               alpha: float, rank: int) -> Any:
    """Permanent merge (scripts/merge_lora_weights.py equivalent)."""
    return apply_lora(params, lora, alpha, rank)
