"""DiffLoss — MAR diffusion head: per-token denoising loss + sampler.

Parity: /root/reference/src/model/loss/diffloss.py:9-52. Training uses the
full 1000-step cosine schedule; sampling uses a respaced schedule
(`num_sampling_steps`, default "100") with optional CFG, temperature-scaled
noise, and the learned-sigma variance (create_diffusion defaults,
diffusion/__init__.py:11-47).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from setok_tpu.config import DiffLossConfig
from setok_tpu.diffusion.gaussian import GaussianDiffusion, create_diffusion
from setok_tpu.models.diffmlp import SimpleMLPAdaLN


class DiffLoss(nn.Module):
    cfg: DiffLossConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.net = SimpleMLPAdaLN(in_channels=c.target_channels,
                                  model_channels=c.width,
                                  out_channels=c.target_channels * 2,
                                  z_channels=c.z_channels,
                                  num_res_blocks=c.depth, dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        # schedule tables are numpy constants — safe as plain attributes
        self.train_diffusion: GaussianDiffusion = create_diffusion(
            timestep_respacing="", noise_schedule="cosine")
        self.gen_diffusion: GaussianDiffusion = create_diffusion(
            timestep_respacing=c.num_sampling_steps, noise_schedule="cosine")

    def __call__(self, target: jnp.ndarray, z: jnp.ndarray, rng: jax.Array,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """target/z: (N, C)/(N, Z); mask: (N,) weights. → scalar loss.

        Parity: diffloss.py:26-33.
        """
        t_rng, noise_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (target.shape[0],), 0,
                               self.train_diffusion.num_timesteps)
        terms = self.train_diffusion.training_losses(
            lambda x, tt, c: self.net(x, tt, c), target.astype(jnp.float32),
            t, noise_rng, model_kwargs={"c": z})
        loss = terms["loss"]
        if mask is not None:
            loss = jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return jnp.mean(loss)

    def sample(self, z: jnp.ndarray, rng: jax.Array, temperature: float = 1.0,
               cfg=1.0, use_cfg: Optional[bool] = None) -> jnp.ndarray:
        """Draw token latents conditioned on z: (N, Z) → (N, C).

        Parity: diffloss.py:35-52. For CFG the caller passes z already
        duplicated [cond; uncond] (setokim sampling does this, mirroring
        setokim_llama.py:236-241); the noise is shared across both halves.
        `cfg` may be a traced scalar (the Muse per-iteration schedule,
        setokim_llama.py:248-251); `use_cfg` pins the static branch then.
        """
        c = self.cfg.target_channels
        noise_rng, loop_rng = jax.random.split(rng)
        if use_cfg is None:
            use_cfg = not (isinstance(cfg, (int, float)) and cfg == 1.0)
        if use_cfg:
            noise = jax.random.normal(noise_rng, (z.shape[0] // 2, c))
            noise = jnp.concatenate([noise, noise], axis=0)
            model = lambda x, t, c_: self.net.forward_with_cfg(x, t, c_, cfg)
        else:
            noise = jax.random.normal(noise_rng, (z.shape[0], c))
            model = lambda x, t, c_: self.net(x, t, c_)
        return self.gen_diffusion.p_sample_loop(
            model, noise.shape, noise, loop_rng, clip_denoised=False,
            model_kwargs={"c_": z}, temperature=temperature)
