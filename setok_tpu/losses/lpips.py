"""LPIPS perceptual loss — frozen VGG16 slices + learned linear heads (flax).

Parity: /root/reference/src/model/loss/perceptual.py:55-157. The reference
downloads taming-transformers weights from a hard-coded Heidelberg URL
(perceptual.py:12-52); this environment is zero-egress, so weights port
offline via scripts/port_weights.py (torchvision vgg16 + lpips lin heads →
pytree). Structure is exact: five feature taps (relu1_2, relu2_2, relu3_3,
relu4_3, relu5_3), input scaling layer, channel-unit-normalized squared
diffs, 1×1-conv lin heads, spatial average, sum over taps.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

# torchvision vgg16.features layout; "M" = 2×2 max-pool
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
# feature-tap points after each relu slice (perceptual.py:120-157)
_SLICE_ENDS = (2, 4, 7, 10, 13)   # conv counts: relu1_2, 2_2, 3_3, 4_3, 5_3
_CHANNELS = (64, 128, 256, 512, 512)

# ScalingLayer constants (perceptual.py:101-109)
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])


class VGG16Features(nn.Module):
    """VGG16 trunk emitting the five LPIPS feature taps. Input NHWC."""

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        conv_idx = 0
        for v in _VGG_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"conv_{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
                if conv_idx in _SLICE_ENDS:
                    taps.append(x)
        return taps


def _unit_normalize(x, eps=1e-10):
    """normalize_tensor (perceptual.py:111-113): unit norm over channels."""
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Perceptual distance. Inputs NHWC in [-1, 1]. Returns per-batch scalar.

    VGG + lin-head params are frozen in the reference (perceptual.py:66-70);
    freezing here is the optimizer's choice (the stage-1 train step excludes
    the `lpips` subtree from the trainable partition).
    """

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pred, target):
        pred = pred.astype(self.dtype)
        target = target.astype(self.dtype)
        vgg = VGG16Features(dtype=self.dtype, param_dtype=self.param_dtype,
                            name="vgg")
        sp = (pred - _SHIFT) / _SCALE
        st = (target - _SHIFT) / _SCALE
        taps_p = vgg(sp)
        taps_t = vgg(st)

        total = 0.0
        for i, (fp, ft) in enumerate(zip(taps_p, taps_t)):
            diff = (_unit_normalize(fp) - _unit_normalize(ft)) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                          param_dtype=self.param_dtype, name=f"lin_{i}")
            total = total + jnp.mean(lin(diff), axis=(1, 2, 3))
        return jnp.mean(total)
