"""Vocabulary growth for multimodal special tokens.

Parity: /root/reference/src/model/setokim_arch.py:357-399
`initialize_vision_tokenizer` — adds `<im_patch>`, `<im_start>`, `<im_end>`,
`<target>` to the tokenizer, resizes the embedding matrices, and
initializes the new rows with the mean of the existing embeddings (the
LLaVA convention, lines 374-386). Here the embedding tables live in the
param tree, so the resize is a pytree transformation.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from setok_tpu.constants import (DEFAULT_IM_END_TOKEN, DEFAULT_IM_START_TOKEN,
                                 DEFAULT_IMAGE_PATCH_TOKEN,
                                 DEFAULT_TARGET_TOKEN)

SPECIAL_TOKENS = [DEFAULT_IMAGE_PATCH_TOKEN, DEFAULT_IM_START_TOKEN,
                  DEFAULT_IM_END_TOKEN, DEFAULT_TARGET_TOKEN]


def resize_token_embeddings(params: Any, num_new_tokens: int) -> Any:
    """Grow `embed_tokens/embedding` (rows) and `lm_head/kernel` (cols) by
    `num_new_tokens`, mean-initializing the new slots
    (setokim_arch.py:374-386)."""
    if num_new_tokens <= 0:
        return params

    def walk(path, leaf):
        name = jax.tree_util.keystr(path)
        if name.endswith("['embed_tokens']['embedding']"):
            mean = jnp.mean(leaf, axis=0, keepdims=True)
            new = jnp.broadcast_to(mean, (num_new_tokens, leaf.shape[1]))
            return jnp.concatenate([leaf, new], axis=0)
        if "lm_head" in name and name.endswith("['kernel']"):
            mean = jnp.mean(leaf, axis=1, keepdims=True)
            new = jnp.broadcast_to(mean, (leaf.shape[0], num_new_tokens))
            return jnp.concatenate([leaf, new], axis=1)
        return leaf

    return jax.tree_util.tree_map_with_path(walk, params)


def add_special_tokens(tokenizer, params: Any,
                       mm_use_im_start_end: bool = True
                       ) -> Tuple[Any, Dict[str, int]]:
    """Register special tokens on a tokenizer exposing `add_tokens` /
    `convert_tokens_to_ids` (HF-style) and resize the embeddings.

    Returns (new_params, {token: id}).
    """
    tokens: List[str] = [DEFAULT_IMAGE_PATCH_TOKEN, DEFAULT_TARGET_TOKEN]
    if mm_use_im_start_end:
        tokens += [DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN]
    num_new = tokenizer.add_tokens(tokens, special_tokens=True) \
        if hasattr(tokenizer, "add_tokens") else 0
    params = resize_token_embeddings(params, num_new)
    ids = {t: tokenizer.convert_tokens_to_ids(t) for t in tokens} \
        if hasattr(tokenizer, "convert_tokens_to_ids") else {}
    return params, ids
