"""SimpleMLPAdaLN — the MAR per-token diffusion denoiser (flax).

Parity: /root/reference/src/model/loss/diffloss.py:59-248 — TimestepEmbedder
(59-96), AdaLN-modulated ResBlock (99-128), FinalLayer (131-148),
SimpleMLPAdaLN (151-248) including zero-init of the adaLN modulations and of
the final projection (diffloss.py:194-215), and `forward_with_cfg` (238-248).
Operates on flat token vectors (N, C).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import flax.linen as nn


def modulate(x, shift, scale):
    return x * (1 + scale) + shift


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffloss.py:72-91). t: (N,) → (N, dim)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        x = timestep_embedding(t, self.frequency_embedding_size)
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=nn.initializers.normal(0.02), name="fc1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=nn.initializers.normal(0.02), name="fc2")(x)
        return x


class ResBlock(nn.Module):
    """AdaLN residual MLP block (diffloss.py:99-128)."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        mod = nn.Dense(3 * self.channels, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       kernel_init=nn.initializers.zeros,
                       name="adaLN")(nn.silu(y))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        # the reference's in_ln keeps its elementwise affine (diffloss.py:113,
        # LayerNorm default) — only FinalLayer's norm is affine-free
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="in_ln")(x)
        h = modulate(h, shift, scale)
        h = nn.Dense(self.channels, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc1")(h)
        h = nn.silu(h)
        h = nn.Dense(self.channels, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc2")(h)
        return x + gate * h


class FinalLayer(nn.Module):
    """Zero-init DiT final layer (diffloss.py:131-148)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        mod = nn.Dense(2 * c, dtype=self.dtype, param_dtype=self.param_dtype,
                       kernel_init=nn.initializers.zeros,
                       name="adaLN")(nn.silu(y))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=self.dtype, name="norm_final")(x)
        x = modulate(x, shift, scale)
        return nn.Dense(self.out_channels, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=nn.initializers.zeros, name="linear")(x)


class SimpleMLPAdaLN(nn.Module):
    """Per-token denoising MLP conditioned on timestep + AR hidden state.

    in/out: (N, in_channels) → (N, out_channels = 2·in_channels for
    learned-sigma). Parity: diffloss.py:151-236.
    """

    in_channels: int
    model_channels: int
    out_channels: int
    z_channels: int
    num_res_blocks: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, c):
        x = nn.Dense(self.model_channels, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="input_proj")(x)
        t_emb = TimestepEmbedder(self.model_channels, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="time_embed")(t)
        c_emb = nn.Dense(self.model_channels, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="cond_embed")(c)
        y = t_emb + c_emb
        for i in range(self.num_res_blocks):
            x = ResBlock(self.model_channels, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"res_{i}")(x, y)
        return FinalLayer(self.out_channels, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name="final_layer")(x, y)

    def forward_with_cfg(self, x, t, c, cfg_scale):
        """Classifier-free-guidance wrapper (diffloss.py:240-248): the batch
        is [cond_half; uncond_half] duplicates of the same latents."""
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        out = self(combined, t, c)
        eps, rest = out[:, : self.in_channels], out[:, self.in_channels:]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([half_eps, half_eps], axis=0)
        return jnp.concatenate([eps, rest], axis=1)
