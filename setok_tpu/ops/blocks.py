"""Core transformer building blocks (flax.linen), mask-aware.

Parity: /root/reference/src/model/setok/module.py:29-101 — `Mlp` (29-45),
`Attention` (48-73), `Block` (76-100). Two deliberate TPU-first deviations:

  * Every attention takes an optional boolean mask. The reference runs a
    Python loop over ragged per-cluster slices (tokenizer.py:147-152); the
    rebuild expresses the same computation as one masked attention over all
    tokens (block-diagonal same-cluster mask), which is mathematically
    identical and MXU-friendly (SURVEY.md §7 decision 2).
  * Softmax runs in fp32 regardless of compute dtype (bf16-safe).

Quirk preserved: the reference `Block` builds `depth` attention sub-layers
that all *share one* `norm1` module instance (module.py:87-91), so the
pre-attention LayerNorm parameters are shared across sub-layers. We replicate
that by declaring `norm1` once and reusing it.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = jnp.dtype

NEG_INF = -1e30


class Dense(nn.Module):
    """nn.Dense-compatible layer (same param names/shapes) with an optional
    int8 path: weights quantize on the fly (cheap: O(K·N) vs the O(M·K·N)
    matmul) and the w8a8 Pallas kernel runs the MXU at int8 rate — the
    isolated kernel measures ~1.6× over peak-bf16 at (8192, 768, 3072) on
    v5e, but end-to-end SeTok inference is currently a wash (per-matmul
    activation quantization overhead); see ROADMAP.md for the fused plan.
    Inference-only mode for frozen weights (no gradient path)."""

    features: int
    use_bias: bool = True
    quant8: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        fits = x.shape[-1] * self.features <= 8 * 1024 * 1024
        if self.quant8 and fits:
            from setok_tpu.kernels.quant_matmul import (quant_dense,
                                                        quantize_weight)
            interpret = jax.devices()[0].platform != "tpu"
            return quant_dense(x.astype(self.dtype),
                               quantize_weight(kernel),
                               bias, interpret=interpret)
        y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class QuantDense(nn.Module):
    """Dense layer whose weights LIVE as int8 (+ per-output-channel fp32
    scales) in the param tree — weight-at-rest quantization for serving.

    Parity: the reference's `load_8bit` inference path (builder.py:32-41,
    bitsandbytes Int8Params). The TPU recast: params are {'q': int8
    (in, out), 's': (1, out) f32} produced offline by
    `models/llama.quantize_trunk_weights`, and the forward runs the w8a8
    Pallas kernel (dynamic per-row activation scales). Besides the MXU
    int8 rate, storing int8 HALVES the HBM weight traffic of the decode
    step — which is weight-bandwidth-bound at small batch — and halves
    trunk memory. No bias (LLaMA linears are bias-free)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        q = self.param("q", nn.initializers.zeros,
                       (x.shape[-1], self.features), jnp.int8)
        s = self.param("s", nn.initializers.ones, (1, self.features),
                       jnp.float32)
        from setok_tpu.kernels.quant_matmul import (QuantizedWeight,
                                                    quant_matmul)
        interpret = jax.devices()[0].platform != "tpu"
        return quant_matmul(x, QuantizedWeight(values=q, scales=s),
                            out_dtype=self.dtype, interpret=interpret)


class Quant4Dense(nn.Module):
    """Dense layer whose weights LIVE as packed int4 nibbles (+ per-output-
    channel fp32 scales) — QUARTER the bf16 HBM traffic for the weight-
    streaming-bound decode step, measured 33–38% faster per linear than
    int8 at slot-batch 8 on v5e (PERF.md, perf/ab_int4_decode.py).

    Parity: the reference's `load_4bit` path (builder.py:32-41, bnb NF4).
    TPU recast: params are {'p': int8 (in//2, out) half-packed nibbles,
    's': (1, out) f32} from `models/llama.quantize_trunk_weights(bits=4)`;
    forward unpacks in-kernel to int8 planes for MXU dots (native jnp.int4
    does not compile on v5e — Mosaic rejects int4 memrefs). Symmetric RTN
    int4, not NF4: the reference's NF4 lookup table has no MXU-compatible
    dot; RTN costs ~7e-2 max-rel output error (vs ~1e-2 int8)."""

    features: int
    dtype: Dtype = jnp.float32
    # 0 = one scale per output channel; G>0 = one scale per (G, 1) input
    # slab (GPTQ/AWQ-style group quantization — cuts RTN error ~2x by
    # keeping outlier rows from inflating the whole column's step)
    quant_group: int = 0

    @nn.compact
    def __call__(self, x):
        assert x.shape[-1] % 2 == 0, "int4 packing needs even in-features"
        p = self.param("p", nn.initializers.zeros,
                       (x.shape[-1] // 2, self.features), jnp.int8)
        n_scales = (1 if self.quant_group == 0
                    else x.shape[-1] // self.quant_group)
        s = self.param("s", nn.initializers.ones, (n_scales, self.features),
                       jnp.float32)
        from setok_tpu.kernels.quant_matmul import (Quant4Weight,
                                                    quant4_matmul)
        interpret = jax.devices()[0].platform != "tpu"
        return quant4_matmul(x, Quant4Weight(packed=p, scales=s),
                             out_dtype=self.dtype, interpret=interpret)


def mask_to_bias(mask: Optional[jnp.ndarray], dtype=jnp.float32) -> Optional[jnp.ndarray]:
    """Boolean attention mask (True = attend) → additive bias."""
    if mask is None:
        return None
    return jnp.where(mask, 0.0, NEG_INF).astype(dtype)


class _DenseParams(nn.Module):
    """Declares Dense-compatible params (kernel/bias) without computing —
    lets fused kernels consume the same checkpoint tree as the unfused path.
    """

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        return kernel, bias


class _LNParams(nn.Module):
    """LayerNorm-compatible params (scale/bias) for fused sublayer kernels."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        return scale, bias


class _AttnParams(nn.Module):
    """Attention-compatible params (qkv/proj Dense) for fused kernels —
    same tree as the unfused `Attention` module."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        c = self.features
        k_qkv, b_qkv = _DenseParams(3 * c, self.param_dtype, name="qkv")(c)
        k_p, b_p = _DenseParams(c, self.param_dtype, name="proj")(c)
        return k_qkv, b_qkv, k_p, b_p


class _MlpParams(nn.Module):
    """Mlp-compatible params (fc1/fc2) for fused kernels."""

    hidden_features: int
    out_features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        k1, b1 = _DenseParams(self.hidden_features, self.param_dtype,
                              name="fc1")(in_features)
        k2, b2 = _DenseParams(self.out_features, self.param_dtype,
                              name="fc2")(self.hidden_features)
        return k1, b1, k2, b2


class Mlp(nn.Module):
    """Two-layer MLP with GELU. Parity: module.py:29-45.

    quant8: inference-only int8 path — the whole MLP runs as ONE fused
    Pallas kernel (quant → fc1 → gelu → quant → fc2, intermediate stays in
    VMEM; see kernels/fused_mlp.py), reading the same fc1/fc2 params.
    Only valid when `act` is GELU and dropout is inactive.
    """

    hidden_features: int
    out_features: Optional[int] = None
    act: Optional[Callable] = None   # None → GELU per `gelu_exact`
    # torch nn.GELU (module.py:30, timm blocks) is the exact erf form;
    # SigLIP's is the tanh approximation. Default exact = SeTok-block parity.
    gelu_exact: bool = True
    drop: float = 0.0
    quant8: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _act(self, x):
        if self.act is not None:
            return self.act(x)
        return nn.gelu(x, approximate=not self.gelu_exact)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        out_features = self.out_features or x.shape[-1]
        from setok_tpu.kernels.fused_sublayer import mlp_fits_vmem
        if (self.quant8 and self.act is None
                and mlp_fits_vmem(x.shape[-1], self.hidden_features)):
            from setok_tpu.kernels.fused_mlp import fused_mlp_int8
            k1, b1 = _DenseParams(self.hidden_features,
                                  self.param_dtype,
                                  name="fc1")(x.shape[-1])
            k2, b2 = _DenseParams(out_features, self.param_dtype,
                                  name="fc2")(self.hidden_features)
            interpret = jax.devices()[0].platform != "tpu"
            # f32 kernel I/O: bf16 refs cost a Mosaic relayout on the in-kernel
            # f32 cast (measured ~40% slower, PERF.md r2)
            return fused_mlp_int8(x.astype(jnp.float32), k1, b1, k2, b2,
                                  interpret=interpret)
        x = Dense(self.hidden_features, quant8=self.quant8, dtype=self.dtype,
                  param_dtype=self.param_dtype, name="fc1")(x)
        x = self._act(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = Dense(out_features, quant8=self.quant8, dtype=self.dtype,
                  param_dtype=self.param_dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with optional boolean mask.

    Parity: module.py:48-73 (fused qkv projection, scale = head_dim^-0.5).
    `mask` broadcasts against (B, H, N, N); True means "may attend".
    """

    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    quant8: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True):
        *batch, n, c = x.shape
        head_dim = c // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5

        from setok_tpu.kernels.fused_sublayer import attn_fits_vmem
        if (self.quant8 and len(batch) == 1 and self.qkv_bias
                and attn_fits_vmem(n, c)
                and (mask is None or mask.ndim == 3)):
            # fully fused int8 attention (kernels/fused_attention_int8.py)
            from setok_tpu.kernels.fused_attention_int8 import (
                fused_attention_int8)
            k_qkv, b_qkv = _DenseParams(3 * c, self.param_dtype,
                                        name="qkv")(c)
            k_p, b_p = _DenseParams(c, self.param_dtype, name="proj")(c)
            interpret = jax.devices()[0].platform != "tpu"
            return fused_attention_int8(
                x.astype(jnp.float32), k_qkv, b_qkv, k_p, b_p,
                self.num_heads, mask, scale, interpret=interpret)

        qkv = Dense(c * 3, use_bias=self.qkv_bias, quant8=self.quant8,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype, name="qkv")(x)
        qkv = qkv.reshape(*batch, n, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, -3, 0)          # each (*batch, n, H, hd)

        attn = jnp.einsum("...qhd,...khd->...hqk", q, k) * scale
        # softmax in ≥fp32 (bf16-safe); float64 inputs stay float64 so
        # parity runs against the double-precision reference are exact
        attn = attn.astype(jnp.promote_types(attn.dtype, jnp.float32))
        if mask is not None:
            if mask.ndim == attn.ndim - 1:          # (..., N, N) → add head dim
                mask = mask[..., None, :, :]
            attn = jnp.where(mask, attn, NEG_INF)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

        out = jnp.einsum("...hqk,...khd->...qhd", attn, v).reshape(*batch, n, c)
        out = Dense(c, quant8=self.quant8, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class CrossAttention(nn.Module):
    """Multi-head cross-attention: queries attend to a context sequence.

    Used by the Q-Former mapper (module.py:209-285 BertSelfAttention with
    `is_cross_attention`). `context_mask` is (B, M) boolean over context keys.
    """

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, context_mask: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True):
        *batch, n, c = x.shape
        m = context.shape[-2]
        head_dim = c // self.num_heads
        scale = head_dim ** -0.5

        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="q")(x)
        kv = nn.Dense(c * 2, use_bias=self.qkv_bias, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="kv")(context)
        q = q.reshape(*batch, n, self.num_heads, head_dim)
        kv = kv.reshape(*batch, m, 2, self.num_heads, head_dim)
        k, v = jnp.moveaxis(kv, -3, 0)

        attn = jnp.einsum("...qhd,...khd->...hqk", q, k) * scale
        attn = attn.astype(jnp.promote_types(attn.dtype, jnp.float32))
        if context_mask is not None:
            attn = jnp.where(context_mask[..., None, None, :], attn, NEG_INF)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

        out = jnp.einsum("...hqk,...khd->...qhd", attn, v).reshape(*batch, n, c)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class Block(nn.Module):
    """SeTok transformer block: `depth` attention sub-layers sharing one
    pre-norm, then a single MLP sub-layer. Parity: module.py:76-100.
    """

    num_heads: int
    mlp_hidden_dim: int
    depth: int = 1
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    # torch nn.LayerNorm default (the reference's norm_layer, module.py:78)
    norm_eps: float = 1e-5
    quant8: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True):
        c = x.shape[-1]
        from setok_tpu.kernels.fused_sublayer import (attn_fits_vmem,
                                                      mlp_fits_vmem)
        if (self.quant8 and self.qkv_bias and x.ndim == 3
                and attn_fits_vmem(x.shape[-2], c)
                and mlp_fits_vmem(c, self.mlp_hidden_dim)
                and (mask is None or mask.ndim == 3)):
            # whole-sublayer fused kernels (kernels/fused_sublayer.py):
            # LN + attention + residual in one call, LN + MLP + residual in
            # another — shared norm1 across the depth sublayers preserved
            from setok_tpu.kernels.fused_sublayer import (attn_sublayer_int8,
                                                          mlp_sublayer_int8)
            interpret = jax.devices()[0].platform != "tpu"
            g1, b1 = _LNParams(c, self.param_dtype, name="norm1")()
            # f32 kernel I/O (bf16 refs relayout in-kernel; PERF.md r2)
            x = x.astype(jnp.float32)
            for i in range(self.depth):
                aw = _AttnParams(c, self.param_dtype, name=f"attn_{i}")()
                x = attn_sublayer_int8(x, g1, b1, *aw,
                                       num_heads=self.num_heads, mask=mask,
                                       sm_scale=self.qk_scale,
                                       ln_eps=self.norm_eps,
                                       interpret=interpret)
            g2, b2 = _LNParams(c, self.param_dtype, name="norm2")()
            mw = _MlpParams(self.mlp_hidden_dim, c, self.param_dtype,
                            name="mlp")(c)
            return mlp_sublayer_int8(x, g2, b2, *mw, ln_eps=self.norm_eps,
                                     interpret=interpret)

        # One shared pre-attention norm (reference shares the instance).
        norm1 = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="norm1")
        for i in range(self.depth):
            attn = Attention(num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                             qk_scale=self.qk_scale, attn_drop=self.attn_drop,
                             proj_drop=self.proj_drop, quant8=self.quant8,
                             dtype=self.dtype,
                             param_dtype=self.param_dtype, name=f"attn_{i}")
            x = x + attn(norm1(x), mask=mask, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm2")(x)
        x = x + Mlp(hidden_features=self.mlp_hidden_dim, drop=self.proj_drop,
                    quant8=self.quant8,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="mlp")(y, deterministic=deterministic)
        return x


class ViTBlock(nn.Module):
    """Standard pre-norm ViT block (timm-style), used by the pixel decoder.

    Parity: timm.models.vision_transformer.Block as instantiated at
    detokenizer.py:49-51.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    norm_eps: float = 1e-5           # torch nn.LayerNorm default (timm)
    quant8: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True):
        c = x.shape[-1]
        from setok_tpu.kernels.fused_sublayer import (attn_fits_vmem,
                                                      mlp_fits_vmem)
        if (self.quant8 and self.qkv_bias and x.ndim == 3
                and attn_fits_vmem(x.shape[-2], c)
                and mlp_fits_vmem(c, int(c * self.mlp_ratio))
                and (mask is None or mask.ndim == 3)):
            from setok_tpu.kernels.fused_sublayer import (attn_sublayer_int8,
                                                          mlp_sublayer_int8)
            interpret = jax.devices()[0].platform != "tpu"
            g1, b1 = _LNParams(c, self.param_dtype, name="norm1")()
            aw = _AttnParams(c, self.param_dtype, name="attn")()
            x = attn_sublayer_int8(x.astype(jnp.float32), g1, b1, *aw,
                                   num_heads=self.num_heads, mask=mask,
                                   ln_eps=self.norm_eps,
                                   interpret=interpret)
            g2, b2 = _LNParams(c, self.param_dtype, name="norm2")()
            mw = _MlpParams(int(c * self.mlp_ratio), c, self.param_dtype,
                            name="mlp")(c)
            return mlp_sublayer_int8(x, g2, b2, *mw, ln_eps=self.norm_eps,
                                     interpret=interpret)

        y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(x)
        x = x + Attention(num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                          attn_drop=self.attn_drop, proj_drop=self.proj_drop,
                          quant8=self.quant8,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="attn")(y, mask=mask, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm2")(x)
        x = x + Mlp(hidden_features=int(c * self.mlp_ratio),
                    drop=self.proj_drop, quant8=self.quant8, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="mlp")(y, deterministic=deterministic)
        return x
