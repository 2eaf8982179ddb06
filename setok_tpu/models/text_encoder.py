"""Text encoder for the stage-1 contrastive branch (SigLIP-style tower).

Parity: the reference constructs `MultilabelContrastiveLoss(text_encoder=…)`
with a 'google/siglip-so400m-patch14-384' text tower
(training_utils.py:73 ConstrastiveLossArguments.text_encoder) and then
encodes text *after* the loss (the bug at multilabel_constrastive.py:140-142,
not reproduced). The rebuild encodes text with this native tower and feeds
embeddings to the loss; HF weights port via scripts/port_weights.py.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from setok_tpu.ops.blocks import Attention, Mlp


class TextEncoder(nn.Module):
    """Token ids → pooled (B, embed_dim) text embedding.

    SigLIP text tower shape: embeddings + pre-norm transformer + final norm
    + last-token pooling ('sticky' EOS pooling) + projection head.
    """

    vocab_size: int = 32000
    width: int = 768
    depth: int = 6
    num_heads: int = 12
    max_len: int = 512
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True) -> jnp.ndarray:
        b, l = input_ids.shape
        if valid is None:
            valid = input_ids != 0
        x = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     name="token_embed")(jnp.maximum(input_ids, 0))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.max_len, self.width), self.param_dtype)
        x = x + pos[:, :l].astype(self.dtype)

        mask = valid[:, None, :] & valid[:, :, None]
        for i in range(self.depth):
            y = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                             name=f"norm1_{i}")(x)
            x = x + Attention(num_heads=self.num_heads, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name=f"attn_{i}")(y, mask=mask,
                                                deterministic=deterministic)
            y = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                             name=f"norm2_{i}")(x)
            # SigLIP towers use the tanh-approx gelu
            x = x + Mlp(hidden_features=self.width * 4, gelu_exact=False,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"mlp_{i}")(y, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                         name="final_norm")(x)

        # last-valid-token pooling
        last = jnp.maximum(jnp.sum(valid.astype(jnp.int32), axis=1) - 1, 0)
        pooled = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
        return nn.Dense(self.embed_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="head")(pooled)
