"""Multimodal projectors (vision↔language adapters).

Parity: /root/reference/src/model/multimodal_projector/builder.py:6-64 —
'linear', 'mlp{N}x_gelu' (regex at line 45), optional '_Norm' LayerNorm
prefix variant (39-52), and 'identity'. `SimpleResBlock` exists in the
reference but is unreachable from the builder (dead code, SURVEY.md §2.7).
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import flax.linen as nn


class MLPProjector(nn.Module):
    out_dim: int
    depth: int = 2
    pre_norm: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.pre_norm:
            x = nn.LayerNorm(epsilon=1e-5,       # torch default
                             dtype=self.dtype, param_dtype=self.param_dtype,
                             name="pre_norm")(x)
        for i in range(self.depth):
            if i > 0:
                x = nn.gelu(x)
            x = nn.Dense(self.out_dim, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"fc_{i}")(x)
        return x


class IdentityProjector(nn.Module):
    out_dim: int = 0

    def __call__(self, x):
        return x


def build_projector(projector_type: str, out_dim: int,
                    dtype=jnp.float32, param_dtype=jnp.float32,
                    name: str = "projector") -> nn.Module:
    """Dispatch mirroring builder.py:33-64."""
    t = projector_type
    pre_norm = False
    if t.startswith("_Norm") or t.endswith("_Norm"):
        pre_norm = True
        t = t.replace("_Norm", "")
    if t == "identity":
        return IdentityProjector(name=name)
    if t == "linear":
        return MLPProjector(out_dim=out_dim, depth=1, pre_norm=pre_norm,
                            dtype=dtype, param_dtype=param_dtype, name=name)
    m = re.match(r"^mlp(\d+)x_gelu$", t)
    if m:
        return MLPProjector(out_dim=out_dim, depth=int(m.group(1)),
                            pre_norm=pre_norm, dtype=dtype,
                            param_dtype=param_dtype, name=name)
    if t == "mlp":
        return MLPProjector(out_dim=out_dim, depth=2, pre_norm=pre_norm,
                            dtype=dtype, param_dtype=param_dtype, name=name)
    raise ValueError(f"Unknown projector type: {projector_type}")
