"""SeTok stage-1 model: tokenizer + detokenizer, jitted end-to-end.

Parity: /root/reference/src/model/setok/model.py:25-103. The reference
wrapper owns its losses and has several broken paths (`super(SeTok)` at
model.py:33, a forward that builds but never returns its output,
model.py:100-103); the rebuild keeps the module a pure forward
(tokenize→detokenize) and composes losses in the train step
(setok_tpu/train/stage1.py), which is the JAX-idiomatic split — the loss
needs `jax.grad` plumbing (GAN adaptive weight) that lives naturally in the
training code.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import flax.linen as nn

from setok_tpu.config import DetokenizerConfig, TokenizerConfig
from setok_tpu.models.detokenizer import DetokenizerOutput, SetokDeTokenizer
from setok_tpu.models.tokenizer import SetokTokenizer, TokenizerOutput


class SetokOutput(NamedTuple):
    """Parity: model.py:16-21 SetokOutput (token_emb / predict_emb)."""

    tokens: jnp.ndarray        # (B, k_max, token_feat_dim)
    token_valid: jnp.ndarray   # (B, k_max)
    recon: jnp.ndarray         # (B, H, W, 3)
    idx_cluster: jnp.ndarray   # (B, N)
    num_clusters: jnp.ndarray  # (B,)


class SeTok(nn.Module):
    tokenizer_cfg: TokenizerConfig
    detokenizer_cfg: DetokenizerConfig
    freeze_backbone: bool = True
    quant8: bool = False    # int8 inference (frozen weights) — see ops.Dense
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.tokenizer = SetokTokenizer(self.tokenizer_cfg,
                                        freeze_backbone=self.freeze_backbone,
                                        quant8=self.quant8,
                                        dtype=self.dtype,
                                        param_dtype=self.param_dtype)
        self.detokenizer = SetokDeTokenizer(self.detokenizer_cfg,
                                            quant8=self.quant8,
                                            dtype=self.dtype,
                                            param_dtype=self.param_dtype)

    def tokenize(self, images, **kw) -> TokenizerOutput:
        return self.tokenizer(images, **kw)

    def detokenize(self, tokens, token_valid=None, **kw) -> DetokenizerOutput:
        return self.detokenizer(tokens, token_valid, **kw)

    def __call__(self, images: jnp.ndarray,
                 token_mask: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True) -> SetokOutput:
        tok = self.tokenizer(images, token_mask=token_mask,
                             deterministic=deterministic)
        det = self.detokenizer(tok.tokens, tok.token_valid,
                               deterministic=deterministic)
        return SetokOutput(tokens=tok.tokens, token_valid=tok.token_valid,
                           recon=det.image, idx_cluster=tok.idx_cluster,
                           num_clusters=tok.num_clusters)
