"""Q-Former feature mapper (BLIP-2 lineage) — the detokenizer's token→grid map.

Parity: /root/reference/src/model/setok/module.py:151-1013 vendors the full
LAVIS BertModel; the detokenizer then strips it down (detokenizer.py:91-96):
no word/position embeddings, no pooler, and `layer.output = layer.intermediate
= None` — i.e. only the *query* path survives. What actually executes per
layer for query-only input (module.py:505-560) is:

    h = LN(drop(W_o · selfattn(h)) + h)                      (post-norm BERT)
    h = LN(drop(W_o · crossattn(h, enc, enc_mask)) + h)      every `freq` layers
    h = LN(drop(W_2 · gelu(W_1 · h)) + h)                    query FFN

with input embeddings h = drop(LN(query_embeds)) (module.py:196-206). This
module implements exactly that executed subset — a far smaller, jit-friendly
graph than the vendored 860-line BertModel.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

NEG_INF = -1e30


class _NormParams(nn.Module):
    """Declares LayerNorm-compatible params (scale/bias) for fused kernels."""

    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          self.param_dtype)
        return scale, bias


class BertSelfAttentionCore(nn.Module):
    """BERT-style attention (separate q/k/v, post-norm residual output).

    `kv` defaults to the query sequence (self-attention); pass encoder states
    for cross-attention. `kv_mask`: (B, M) True = attend. quant8: the whole
    sublayer (projections, attention, residual, post-norm) runs as one fused
    int8 Pallas kernel (kernels/fused_bert_attention_int8.py).
    """

    num_heads: int
    dropout: float = 0.0
    quant8: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv=None, kv_mask: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True):
        c = x.shape[-1]
        head_dim = c // self.num_heads
        kv = x if kv is None else kv

        from setok_tpu.kernels.fused_sublayer import attn_fits_vmem
        if self.quant8 and x.ndim == 3 and attn_fits_vmem(x.shape[-2], c):
            from setok_tpu.kernels.fused_bert_attention_int8 import (
                fused_bert_attention_int8)
            from setok_tpu.ops.blocks import _DenseParams
            wq, bq = _DenseParams(c, self.param_dtype, name="query")(c)
            wk, bk = _DenseParams(c, self.param_dtype, name="key")(c)
            wv, bv = _DenseParams(c, self.param_dtype, name="value")(c)
            wo, bo = _DenseParams(c, self.param_dtype, name="out")(c)
            ln_s, ln_b = _NormParams(self.param_dtype, name="out_norm")(c)
            interpret = jax.devices()[0].platform != "tpu"
            # f32 kernel I/O (bf16 refs relayout in-kernel; PERF.md r2)
            return fused_bert_attention_int8(
                x.astype(jnp.float32), kv.astype(jnp.float32), wq, bq, wk, bk,
                wv, bv, wo, bo, ln_s, ln_b, self.num_heads, kv_mask,
                interpret=interpret)
        dense = lambda name: nn.Dense(c, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        q = dense("query")(x)
        k = dense("key")(kv)
        v = dense("value")(kv)
        q = q.reshape(*q.shape[:-1], self.num_heads, head_dim)
        k = k.reshape(*k.shape[:-1], self.num_heads, head_dim)
        v = v.reshape(*v.shape[:-1], self.num_heads, head_dim)

        attn = jnp.einsum("...qhd,...khd->...hqk", q, k) / jnp.sqrt(head_dim)
        attn = attn.astype(jnp.float32)
        if kv_mask is not None:
            attn = jnp.where(kv_mask[..., None, None, :], attn, NEG_INF)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("...hqk,...khd->...qhd", attn, v)
        out = out.reshape(*out.shape[:-2], c)

        # BertSelfOutput: dense → dropout → LayerNorm(residual)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="out_norm")(out + x)


class QFormerLayer(nn.Module):
    num_heads: int
    mlp_hidden: int
    has_cross_attention: bool
    dropout: float = 0.0
    attn_dropout: float = 0.0
    quant8: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, enc, enc_mask, *, deterministic: bool = True):
        # both attention sublayers take the fused int8 kernel (round-1 saw a
        # loss on cross-attn with fp32 score dots; bf16 dots changed that)
        h = BertSelfAttentionCore(num_heads=self.num_heads,
                                  dropout=self.attn_dropout,
                                  quant8=self.quant8, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="self_attn")(h, deterministic=deterministic)
        if self.has_cross_attention:
            h = BertSelfAttentionCore(num_heads=self.num_heads,
                                      dropout=self.attn_dropout,
                                      quant8=self.quant8,
                                      dtype=self.dtype,
                                      param_dtype=self.param_dtype,
                                      name="cross_attn")(
                h, kv=enc, kv_mask=enc_mask, deterministic=deterministic)
        # query FFN (intermediate_query/output_query, module.py:555-560)
        from setok_tpu.kernels.fused_sublayer import mlp_fits_vmem
        if self.quant8 and mlp_fits_vmem(h.shape[-1], self.mlp_hidden):
            from setok_tpu.kernels.fused_sublayer import mlp_postnorm_int8
            from setok_tpu.ops.blocks import _DenseParams
            k1, b1 = _DenseParams(self.mlp_hidden, self.param_dtype,
                                  name="ffn_in")(h.shape[-1])
            k2, b2 = _DenseParams(h.shape[-1], self.param_dtype,
                                  name="ffn_out")(self.mlp_hidden)
            ln_s, ln_b = _NormParams(self.param_dtype, name="ffn_norm")(
                h.shape[-1])
            interpret = jax.devices()[0].platform != "tpu"
            return mlp_postnorm_int8(h.astype(jnp.float32), k1, b1, k2, b2,
                                     ln_s, ln_b, interpret=interpret)
        y = nn.Dense(self.mlp_hidden, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="ffn_in")(h)
        # HF Bert hidden_act='gelu' is the exact erf form (ACT2FN['gelu'])
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(h.shape[-1], dtype=self.dtype,
                     param_dtype=self.param_dtype, name="ffn_out")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="ffn_norm")(y + h)


class QFormer(nn.Module):
    """Query-only Q-Former: learned/query embeddings cross-attend to encoder
    states every `cross_attention_freq` layers. Returns (B, Q, hidden)."""

    num_layers: int
    num_heads: int
    mlp_ratio: float = 4.0
    cross_attention_freq: int = 2
    dropout: float = 0.1
    attn_dropout: float = 0.1
    quant8: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query_embeds, encoder_hidden_states,
                 encoder_attention_mask: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True):
        c = query_embeds.shape[-1]
        h = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="embed_norm")(query_embeds.astype(self.dtype))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        for i in range(self.num_layers):
            h = QFormerLayer(num_heads=self.num_heads,
                             mlp_hidden=int(c * self.mlp_ratio),
                             has_cross_attention=(i % self.cross_attention_freq == 0),
                             dropout=self.dropout,
                             attn_dropout=self.attn_dropout,
                             quant8=self.quant8,
                             dtype=self.dtype, param_dtype=self.param_dtype,
                             name=f"layer_{i}")(
                h, encoder_hidden_states, encoder_attention_mask,
                deterministic=deterministic)
        return h
