"""SetokDeTokenizer: K semantic tokens → reconstructed image.

Parity: /root/reference/src/model/setok/detokenizer.py:14-123. Pipeline:
learned mask-token queries, Q-Former mapper cross-attending queries→tokens
(every `cross_attention_freq` layers), linear to decoder width, +2-D sin-cos
pos-emb, `decoder_depth` ViT blocks, final norm. The reference forward is
*truncated* — it ends at the final norm with no pixel projection and no
return statement (detokenizer.py:117-123) — so, per SURVEY.md §7 decision 5,
we reconstruct the missing head from the MAR lineage the model follows: a
linear patch-pixel projection + unpatchify (cf. setokim_llama.py:194-204).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import flax.linen as nn

from setok_tpu.config import DetokenizerConfig
from setok_tpu.models.qformer import QFormer
from setok_tpu.ops.blocks import ViTBlock
from setok_tpu.ops.posenc import posenc_2d_flat


class DetokenizerOutput(NamedTuple):
    image: jnp.ndarray     # (B, H, W, 3) reconstructed pixels
    hidden: jnp.ndarray    # (B, grid², decoder_embed_dim) pre-head features


def unpatchify(x: jnp.ndarray, patch_size: int, channels: int = 3) -> jnp.ndarray:
    """(B, h·w, p²·c) patch pixels → (B, h·p, w·p, c) image (NHWC)."""
    b, n, _ = x.shape
    h = w = int(round(n ** 0.5))
    p = patch_size
    x = x.reshape(b, h, w, p, p, channels)
    x = jnp.einsum("bhwpqc->bhpwqc", x)
    return x.reshape(b, h * p, w * p, channels)


def patchify(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, W, c) image → (B, h·w, p²·c) patches (inverse of unpatchify)."""
    b, hh, ww, c = images.shape
    p = patch_size
    h, w = hh // p, ww // p
    x = images.reshape(b, h, p, w, p, c)
    x = jnp.einsum("bhpwqc->bhwpqc", x)
    return x.reshape(b, h * w, p * p * c)


class SetokDeTokenizer(nn.Module):
    cfg: DetokenizerConfig
    quant8: bool = False    # int8 inference path for the decoder blocks
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray,
                 token_valid: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True) -> DetokenizerOutput:
        """tokens: (B, K, token_feat_dim); token_valid: (B, K) bool mask.

        Parity: detokenizer.py:101-123 + reconstructed pixel head.
        """
        cfg = self.cfg
        b = tokens.shape[0]

        # learned queries, one per output patch (detokenizer.py:40-42)
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(cfg.initializer_range),
            (1, cfg.num_mask_tokens, cfg.hidden_dim), self.param_dtype)
        queries = jnp.broadcast_to(mask_tokens.astype(self.dtype),
                                   (b, cfg.num_mask_tokens, cfg.hidden_dim))

        x = nn.Dense(cfg.hidden_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     name="mapper_fc_in")(tokens.astype(self.dtype))
        x = QFormer(num_layers=cfg.mapper_layers, num_heads=cfg.mapper_heads,
                    cross_attention_freq=cfg.cross_attention_freq,
                    dropout=cfg.proj_drop, attn_dropout=cfg.attn_drop,
                    quant8=self.quant8,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="mapper")(queries, x, token_valid,
                                   deterministic=deterministic)

        x = nn.Dense(cfg.decoder_embed_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="decoder_fc_in")(x)
        pos = posenc_2d_flat(cfg.grid, cfg.grid, cfg.decoder_embed_dim,
                             dtype=x.dtype)
        x = x + pos[None]

        for i in range(cfg.decoder_depth):
            x = ViTBlock(num_heads=cfg.decoder_nheads,
                         mlp_ratio=cfg.mlp_ratio, proj_drop=cfg.proj_drop,
                         attn_drop=cfg.attn_drop, quant8=self.quant8,
                         dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name=f"pixel_decoder_{i}")(x, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=1e-5,      # torch default (ref norm)
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name="decoder_norm")(x)

        # pixel head (absent from the truncated reference forward; MAR-style)
        pixels = nn.Dense(cfg.patch_size ** 2 * 3, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name="pixel_head")(hidden)
        image = unpatchify(pixels, cfg.patch_size)
        return DetokenizerOutput(image=image, hidden=hidden)
