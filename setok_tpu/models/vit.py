"""SigLIP-style ViT patch-feature extractor (native flax, no HF dependency).

Parity: /root/reference/src/model/setok/clip_encoder.py:8-93 wraps
`transformers.AutoModel` around 'google/siglip-so400m-patch14-384', taps
`hidden_states[select_layer]` and optionally drops a class token
(feature_select, lines 40-48). The rebuild implements the same ViT shape
natively so the whole encode path lives in one jit graph; HF weights port in
via scripts/port_weights.py (state-dict → pytree path mapping).

The backbone is frozen in the reference (`@torch.no_grad()` forward,
requires_grad_(False), clip_encoder.py:36,50). Here freezing is the training
loop's choice: pass the ViT params in a non-trainable collection or wrap
features in `jax.lax.stop_gradient` (the tokenizer does the latter when
`freeze_backbone`).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from setok_tpu.config import ViTConfig
from setok_tpu.ops.blocks import Attention, Mlp


class ViTEncoderBlock(nn.Module):
    """Standard pre-norm ViT encoder block (SigLIP layout)."""

    num_heads: int
    mlp_ratio: float
    quant8: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        c = x.shape[-1]
        from setok_tpu.kernels.fused_sublayer import (attn_fits_vmem,
                                                      mlp_fits_vmem)
        if (self.quant8 and x.ndim == 3
                and attn_fits_vmem(x.shape[-2], c)
                and mlp_fits_vmem(c, int(c * self.mlp_ratio))):
            # whole-sublayer fused int8 kernels (kernels/fused_sublayer.py)
            import jax
            from setok_tpu.ops.blocks import _AttnParams, _LNParams, _MlpParams
            from setok_tpu.kernels.fused_sublayer import (attn_sublayer_int8,
                                                          mlp_sublayer_int8)
            interpret = jax.devices()[0].platform != "tpu"
            g1, b1 = _LNParams(c, self.param_dtype, name="norm1")()
            aw = _AttnParams(c, self.param_dtype, name="attn")()
            # f32 kernel I/O (bf16 refs relayout in-kernel; PERF.md r2)
            x = attn_sublayer_int8(x.astype(jnp.float32), g1, b1, *aw,
                                   num_heads=self.num_heads,
                                   interpret=interpret)
            g2, b2 = _LNParams(c, self.param_dtype, name="norm2")()
            mw = _MlpParams(int(c * self.mlp_ratio), c, self.param_dtype,
                            name="mlp")(c)
            return mlp_sublayer_int8(x, g2, b2, *mw, interpret=interpret)

        y = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                         name="norm1")(x)
        x = x + Attention(num_heads=self.num_heads, qkv_bias=True,
                          quant8=self.quant8,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="attn")(y, deterministic=deterministic)
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                         name="norm2")(x)
        # SigLIP uses hidden_act='gelu_pytorch_tanh' — the tanh approximation,
        # unlike the exact-erf nn.GELU of the SeTok/timm blocks
        x = x + Mlp(hidden_features=int(c * self.mlp_ratio),
                    gelu_exact=False,
                    quant8=self.quant8, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="mlp")(y, deterministic=deterministic)
        return x


class ViT(nn.Module):
    """Patch-embedding ViT returning per-patch features from a chosen layer.

    Input:  (B, H, W, 3) images (NHWC — TPU-native layout).
    Output: (B, N, width) patch features, N = (H/patch)².
    """

    cfg: ViTConfig
    quant8: bool = False
    # With merge_layer set, a frozen backbone means frozen *pre-merge*: the
    # merge projection is new (random-init) and everything downstream of it
    # sees a feature distribution the pretrained post-merge blocks never
    # trained on, so merge_proj + post-merge blocks must stay trainable.
    # True → stop_gradient is applied to the pre-merge features inside this
    # module; the caller must then NOT stop-gradient the output (the
    # tokenizer handles this split — tokenizer.py encode_features).
    freeze_pre_merge: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, *, deterministic: bool = True,
                 select_layer: Optional[int] = None) -> jnp.ndarray:
        cfg = self.cfg
        sel = select_layer if select_layer is not None else cfg.select_layer

        x = nn.Conv(cfg.width, kernel_size=(cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="patch_embed")(images.astype(self.dtype))
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)

        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.num_patches, cfg.width), self.param_dtype)
        x = x + pos.astype(self.dtype)

        if cfg.use_class_token:
            cls = self.param("cls_token", nn.initializers.normal(0.02),
                             (1, 1, cfg.width), self.param_dtype)
            x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype),
                                                  (b, 1, c)), x], axis=1)

        # hidden_states convention mirrors HF: index -1 = output of the last
        # block, -2 = penultimate, ... (clip_encoder.py:53-57 taps
        # hidden_states[select_layer]).
        taps = []
        for i in range(cfg.depth):
            x = ViTEncoderBlock(num_heads=cfg.num_heads,
                                mlp_ratio=cfg.mlp_ratio, quant8=self.quant8,
                                dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=f"block_{i}")(x, deterministic=deterministic)
            if cfg.merge_layer is not None and i == cfg.merge_layer:
                # Smaller-N variant (PERF.md "token-merge"): 2x2
                # space-to-depth + linear projection — the remaining
                # depth and the whole tokenizer run at N/4.
                # (merge_layer bounds / even grid / no-cls validated in
                # ViTConfig.__post_init__.)
                if self.freeze_pre_merge:
                    import jax
                    x = jax.lax.stop_gradient(x)
                bb, nn_, cc = x.shape
                g = int(round(nn_ ** 0.5))
                x = x.reshape(bb, g // 2, 2, g // 2, 2, cc)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    bb, (g // 2) * (g // 2), 4 * cc)
                if cfg.merge_pool_init:
                    # exact 2x2 average-pool at init (see ViTConfig):
                    # the folded last axis is [p00|p01|p10|p11] blocks of
                    # cc, so 0.25·[I;I;I;I] averages the four neighbors
                    def _pool_init(key, shape, dtype):
                        del key
                        c_out = shape[1]
                        eye = jnp.eye(c_out, dtype=dtype)
                        return 0.25 * jnp.concatenate([eye] * 4, axis=0)
                    kernel_init = _pool_init
                else:
                    kernel_init = nn.linear.default_kernel_init
                x = nn.Dense(cfg.width, kernel_init=kernel_init,
                             dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="merge_proj")(x)
            taps.append(x)
        feats = taps[sel]

        if cfg.use_class_token and cfg.select_feature == "patch":
            # drop class token (clip_encoder.py:43-44)
            feats = feats[:, 1:, :]
        return feats
