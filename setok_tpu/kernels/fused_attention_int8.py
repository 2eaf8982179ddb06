"""Fused int8 self-attention: qkv-proj → softmax → out-proj in ONE kernel.

Companion to kernels/fused_mlp.py (same rationale: per-Dense pallas calls
are fusion barriers). One program handles one sequence (a ViT image's
256 tokens): the int8 qkv matmul, per-head attention with fp32 softmax, and
the int8 output projection all stay in VMEM — only (N, C) in/out touch HBM.

Sized for tokenizer/decoder sequences (N ≤ ~1k, C ≤ ~1k): qkv (N, 3C) f32
plus per-head scores (H, N, N) f32 fit the ~16 MB VMEM at N=256, H=16.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from setok_tpu.kernels.quant_matmul import quantize_weight

NEG_INF = -1e30


def _fused_attn_kernel(x_ref, wqkv_ref, sqkv_ref, bqkv_ref, wp_ref, sp_ref,
                       bp_ref, mask_ref, o_ref, *, num_heads, head_dim):
    x = x_ref[0].astype(jnp.float32)                      # (N, C)
    n, c = x.shape

    xs = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                     1e-8) / 127.0
    x8 = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    qkv = jax.lax.dot_general(x8, wqkv_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    qkv = qkv.astype(jnp.float32) * xs * sqkv_ref[...] + bqkv_ref[...]

    # per-head unrolled loop with column slices — Mosaic's vector layouts
    # don't support the (N, C) → (H, N, D) shape cast inside kernels.
    # VPU economy (PERF.md): sm_scale is pre-folded into the q dequant
    # scales by the wrapper, masking is one bias add, and the 1/l
    # normalization lands on (N, D) after the PV dot.
    mf = mask_ref[0]                                      # (N, N) f32 0/1
    mbias = NEG_INF * (1.0 - mf)
    # phase-split head groups (kernels/fused_sublayer.py::_attn_core):
    # independent score/softmax/PV chains overlap MXU and VPU
    heads = []
    G = 4
    for g0 in range(0, num_heads, G):
        grp = range(g0, min(g0 + G, num_heads))
        ss = []
        for h in grp:
            lo = h * head_dim
            q_h = qkv[:, lo:lo + head_dim]              # static slices
            k_h = qkv[:, c + lo:c + lo + head_dim]
            s_h = jax.lax.dot_general(q_h, k_h, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            ss.append(s_h + mbias)
        ps = []
        for s_h in ss:
            m_h = jnp.max(s_h, axis=-1, keepdims=True)
            p_h = jnp.exp(s_h - m_h)
            l_r = 1.0 / jnp.maximum(jnp.sum(p_h, axis=-1, keepdims=True),
                                    1e-30)
            l_r = jnp.where(m_h > 0.5 * NEG_INF, l_r, 0.0)
            ps.append((p_h, l_r))
        for i, h in enumerate(grp):
            lo = h * head_dim
            v_h = qkv[:, 2 * c + lo:2 * c + lo + head_dim]
            o_h = jax.lax.dot_general(ps[i][0], v_h, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            heads.append(o_h * ps[i][1])
    o = jnp.concatenate(heads, axis=1)                    # (N, C)

    os_ = jnp.maximum(jnp.max(jnp.abs(o), axis=-1, keepdims=True),
                      1e-8) / 127.0
    o8 = jnp.clip(jnp.round(o / os_), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(o8, wp_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * os_ * sp_ref[...] + bp_ref[...]
    o_ref[0] = y.astype(o_ref.dtype)


def fused_attention_int8(x: jnp.ndarray, w_qkv: jnp.ndarray,
                         b_qkv: jnp.ndarray, w_proj: jnp.ndarray,
                         b_proj: jnp.ndarray, num_heads: int,
                         mask: Optional[jnp.ndarray] = None,
                         sm_scale: Optional[float] = None,
                         interpret: bool = False) -> jnp.ndarray:
    """x: (B, N, C); w_qkv: (C, 3C); w_proj: (C, C); mask: (B, N, N) bool
    or None. Returns (B, N, C)."""
    b, n, c = x.shape
    head_dim = c // num_heads
    scale = sm_scale if sm_scale is not None else head_dim ** -0.5
    q1 = quantize_weight(w_qkv)
    # fold sm_scale into the q-segment dequant scales + bias (kernel takes
    # scores pre-scaled; saves an (N, N) VPU pass per head)
    q1 = q1._replace(scales=q1.scales.at[:, :c].multiply(scale))
    b_qkv = jnp.asarray(b_qkv, jnp.float32).at[:c].multiply(scale)
    q2 = quantize_weight(w_proj)
    if mask is None:
        mask_f = jnp.ones((b, n, n), jnp.float32)
    else:
        mask_f = mask.astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_fused_attn_kernel, num_heads=num_heads,
                          head_dim=head_dim),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=interpret,
    )(x, q1.values, q1.scales, b_qkv[None].astype(jnp.float32),
      q2.values, q2.scales, b_proj[None].astype(jnp.float32), mask_f)
