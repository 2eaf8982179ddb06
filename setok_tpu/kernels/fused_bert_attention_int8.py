"""Fused int8 BERT-style attention sublayer for the Q-Former mapper.

One pallas program = one sequence: int8 q/k/v projections, per-head-sliced
fp32 softmax attention (optionally cross-attention to a separate kv
sequence with a key mask), int8 output projection, residual add AND the
post-norm LayerNorm — the entire `BertSelfAttentionCore` sublayer
(models/qformer.py) in a single kernel. Same fusion-barrier rationale as
kernels/fused_mlp.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from setok_tpu.kernels.quant_matmul import quantize_weight

NEG_INF = -1e30


def _quant_rows(x):
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                    1e-8) / 127.0
    return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s


def _int8_proj(x8, xs, w_ref, s_ref, b_ref):
    y = jax.lax.dot_general(x8, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * xs * s_ref[...] + b_ref[...]


def _kernel(x_ref, kv_ref, wq_ref, sq_ref, bq_ref, wk_ref, sk_ref, bk_ref,
            wv_ref, sv_ref, bv_ref, wo_ref, so_ref, bo_ref, ln_s_ref,
            ln_b_ref, kvmask_ref, o_ref, *, num_heads, head_dim, eps):
    x = x_ref[0].astype(jnp.float32)                      # (N, C)
    kv = kv_ref[0].astype(jnp.float32)                    # (M, C)
    n, c = x.shape

    x8, xs = _quant_rows(x)
    kv8, kvs = _quant_rows(kv)
    q = _int8_proj(x8, xs, wq_ref, sq_ref, bq_ref)        # (N, C)
    k = _int8_proj(kv8, kvs, wk_ref, sk_ref, bk_ref)      # (M, C)
    v = _int8_proj(kv8, kvs, wv_ref, sv_ref, bv_ref)

    mf = kvmask_ref[0]                                    # (1, M) f32 0/1
    mbias = NEG_INF * (1.0 - mf)                          # (1, M)
    scale = 1.0 / (head_dim ** 0.5)
    # bf16 score/PV dots with fp32 accumulation: full MXU rate (fp32 dots
    # run quarter-rate on v5e), flash-attention accuracy class.
    # VPU economy (PERF.md): scale folds into q (N, C) once instead of per
    # (N, M) score pass; masking is one bias add; 1/l lands on (N, D).
    q16, k16, v16 = ((q * scale).astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16))
    # phase-split head groups (see kernels/fused_sublayer.py::_attn_core):
    # independent score/softmax/PV chains overlap MXU and VPU across heads
    heads = []
    G = 4
    for g0 in range(0, num_heads, G):
        grp = range(g0, min(g0 + G, num_heads))
        ss = []
        for h in grp:
            lo = h * head_dim
            q_h = q16[:, lo:lo + head_dim]
            k_h = k16[:, lo:lo + head_dim]
            s_h = jax.lax.dot_general(q_h, k_h, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            ss.append(s_h + mbias)                        # broadcast (N, M)
        ps = []
        for s_h in ss:
            m_h = jnp.max(s_h, axis=-1, keepdims=True)
            p_h = jnp.exp(s_h - m_h)
            l_r = 1.0 / jnp.maximum(jnp.sum(p_h, axis=-1, keepdims=True),
                                    1e-30)
            l_r = jnp.where(m_h > 0.5 * NEG_INF, l_r, 0.0)
            ps.append((p_h.astype(jnp.bfloat16), l_r))
        for i, h in enumerate(grp):
            lo = h * head_dim
            v_h = v16[:, lo:lo + head_dim]
            o_h = jax.lax.dot_general(
                ps[i][0], v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            heads.append(o_h * ps[i][1])
    o = jnp.concatenate(heads, axis=1)                    # (N, C)

    o8, os_ = _quant_rows(o)
    y = _int8_proj(o8, os_, wo_ref, so_ref, bo_ref) + x   # residual

    # post-norm LayerNorm (BertSelfOutput)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    o_ref[0] = (yn * ln_s_ref[...] + ln_b_ref[...]).astype(o_ref.dtype)


def fused_bert_attention_int8(x, kv, wq, bq, wk, bk, wv, bv, wo, bo,
                              ln_scale, ln_bias, num_heads: int,
                              kv_mask: Optional[jnp.ndarray] = None,
                              eps: float = 1e-12,
                              interpret: bool = False) -> jnp.ndarray:
    """x: (B, N, C) queries; kv: (B, M, C) keys/values (pass x for
    self-attention); kv_mask: (B, M) bool or None. Returns LN(attn + x)."""
    b, n, c = x.shape
    m = kv.shape[1]
    head_dim = c // num_heads
    qws = [quantize_weight(w) for w in (wq, wk, wv, wo)]
    if kv_mask is None:
        mask_f = jnp.ones((b, 1, m), jnp.float32)
    else:
        mask_f = kv_mask.astype(jnp.float32)[:, None, :]

    args = [x, kv]
    in_specs = [pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, m, c), lambda i: (i, 0, 0))]
    for qw, bias in zip(qws, (bq, bk, bv, bo)):
        args += [qw.values, qw.scales, bias[None].astype(jnp.float32)]
        in_specs += [pl.BlockSpec((c, c), lambda i: (0, 0)),
                     pl.BlockSpec((1, c), lambda i: (0, 0)),
                     pl.BlockSpec((1, c), lambda i: (0, 0))]
    args += [ln_scale[None].astype(jnp.float32),
             ln_bias[None].astype(jnp.float32), mask_f]
    in_specs += [pl.BlockSpec((1, c), lambda i: (0, 0)),
                 pl.BlockSpec((1, c), lambda i: (0, 0)),
                 pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0))]

    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, head_dim=head_dim,
                          eps=eps),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=interpret,
    )(*args)
