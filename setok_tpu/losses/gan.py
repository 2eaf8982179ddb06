"""PatchGAN adversarial loss with adaptive weighting.

Parity: /root/reference/src/model/loss/discriminator.py —
`NLayerDiscriminator` (306-365, pix2pix conv stack), `hinge_d_loss` /
`vanilla_d_loss` (19-29), `adopt_weight` warm-up (12-17), and `GANLoss`
(31-112) with the grad-norm adaptive weight (63-70).

JAX recast: the reference computes the adaptive weight with two
`torch.autograd.grad` calls against the decoder's last layer inside the loss
module. Here `adaptive_weight` takes the two gradients explicitly — the
stage-1 train step obtains them with `jax.grad` w.r.t. the pixel-head kernel
(train/stage1.py), which is the same computation without graph retention
tricks. BatchNorm is replaced by GroupNorm(1) ≈ LayerNorm over channels:
stateless under jit and mesh-friendly (no cross-device batch-stat syncs);
ActNorm (use_actnorm) is out of scope, as in the reference defaults.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from setok_tpu.config import GANLossConfig


class NLayerDiscriminator(nn.Module):
    """PatchGAN: C64-C128-C256 4×4 stride-2 convs → 1-channel logit map.

    Parity: discriminator.py:306-356 (ndf=64, n_layers as configured).
    Input NHWC in [-1, 1] (or [0, 1]; the loss is scale-agnostic).
    """

    n_layers: int = 3
    ndf: int = 64
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        conv = lambda f, s, name: nn.Conv(
            f, (4, 4), strides=(s, s), padding=((1, 1), (1, 1)),
            dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.normal(0.02), name=name)
        x = conv(self.ndf, 2, "conv_in")(x)
        x = nn.leaky_relu(x, 0.2)
        mult = 1
        for n in range(1, self.n_layers):
            mult = min(2 ** n, 8)
            x = conv(self.ndf * mult, 2, f"conv_{n}")(x)
            x = nn.GroupNorm(num_groups=1, dtype=self.dtype,
                             param_dtype=self.param_dtype, name=f"norm_{n}")(x)
            x = nn.leaky_relu(x, 0.2)
        mult = min(2 ** self.n_layers, 8)
        x = conv(self.ndf * mult, 1, f"conv_{self.n_layers}")(x)
        x = nn.GroupNorm(num_groups=1, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name=f"norm_{self.n_layers}")(x)
        x = nn.leaky_relu(x, 0.2)
        return conv(1, 1, "conv_out")(x)


def hinge_d_loss(logits_real, logits_fake):
    """discriminator.py:19-23."""
    return 0.5 * (jnp.mean(nn.relu(1.0 - logits_real))
                  + jnp.mean(nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    """discriminator.py:25-29."""
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def adopt_weight(weight: float, global_step: jnp.ndarray, threshold: int = 0,
                 warm_up_end: int = 0, value: float = 0.0) -> jnp.ndarray:
    """Warm-up factor (discriminator.py:12-17), branch-free for jit."""
    step = global_step.astype(jnp.float32)
    warm = jnp.where(
        warm_up_end > threshold,
        weight * (step - threshold) / max(warm_up_end - threshold, 1),
        weight)
    return jnp.where(step < threshold, value,
                     jnp.where(step < warm_up_end, warm, weight))


def generator_loss(logits_fake: jnp.ndarray) -> jnp.ndarray:
    """-E[D(fake)] (discriminator.py:88-89)."""
    return -jnp.mean(logits_fake)


def adaptive_weight(rec_grad, g_grad, weight: float = 1.0) -> jnp.ndarray:
    """‖∇rec‖ / (‖∇g‖ + 1e-4), clipped to [0, 1e4], stop-gradiented.

    Parity: discriminator.py:63-70. `rec_grad` / `g_grad` are the gradients
    of the reconstruction loss and the generator loss w.r.t. the decoder's
    last-layer parameters (the pixel-head kernel in this rebuild).
    """
    def norm(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.sqrt(sum(
            jnp.sum(l.astype(jnp.promote_types(l.dtype, jnp.float32)) ** 2)
            for l in leaves))

    w = norm(rec_grad) / (norm(g_grad) + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(w, 0.0, 1e4)) * weight


def discriminator_loss(logits_real, logits_fake, global_step,
                       cfg: GANLossConfig) -> jnp.ndarray:
    """Discriminator branch of GANLoss.forward (discriminator.py:103-112)."""
    loss_fn = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss
    factor = adopt_weight(cfg.factor, global_step, threshold=cfg.disc_start)
    return factor * loss_fn(logits_real, logits_fake)
