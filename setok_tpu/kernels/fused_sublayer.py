"""Fused int8 transformer SUBLAYER kernels: LN prologue + residual epilogue
live inside the kernel, so one pallas_call = one whole sublayer.

Round-1 established (ROADMAP.md #1) that int8 wins only when the whole
sublayer is one kernel (every pallas_call is a fusion barrier). These
kernels extend that fusion outward past the LayerNorm and the residual add
— the two XLA ops that still forced (tokens, C) HBM round trips between
kernels — and fix two inefficiencies of the round-1 attention kernel:

  * QK^T / PV ran in fp32 (quarter MXU rate on v5e); now bf16 inputs with
    fp32 accumulation (preferred_element_type) — full rate, same accuracy
    class as flash attention.
  * An all-ones (B, N, N) f32 mask was materialized in HBM and read per
    layer even when no mask existed; the unmasked variant has no mask
    operand at all.

Sublayer semantics match ops/blocks.py exactly:
    attn:  out = x + Attn(LN(x))        (ViTBlock / Block attention sublayer)
    mlp:   out = x + MLP(LN(x))         (gelu between fc1/fc2)
Parity: reference Block/Mlp/Attention, module.py:29-101; quantization is a
TPU-inference addition (quality-validated in round 1, PARITY.md).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from setok_tpu.kernels.quant_matmul import quantize_weight

NEG_INF = -1e30

# VMEM is ~16 MB/core; leave headroom for Mosaic's own buffers.
_VMEM_BUDGET = 11 * 1024 * 1024

# heads per phase-split group (device-time A/B r2: groups of 4 capture the
# full -19% MXU/VPU-overlap win of a complete split at bounded VMEM)
_SPLIT_GROUP = 4


def attn_fits_vmem(n: int, c: int) -> bool:
    """Whole-sequence attention sublayer per-program footprint: qkv f32,
    int8 weights, live score group (f32 scores + bf16 probs per head in a
    _SPLIT_GROUP). Large configs (so400m: C=4096) fall back to the
    unfused path."""
    qkv = n * 3 * c * 4
    weights = 3 * c * c + c * c + 8 * c * 4
    scores = _SPLIT_GROUP * n * n * 6
    x_io = 2 * n * c * 4
    return qkv + weights + scores + x_io < _VMEM_BUDGET


def mlp_fits_vmem(c: int, hidden: int, block_m: int = 256) -> bool:
    weights = c * hidden + hidden * c + 4 * (c + hidden) * 4
    act = block_m * hidden * 4 + 2 * block_m * c * 4
    return weights + act < _VMEM_BUDGET


def _layernorm(x, g, b, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _quant_rows(x):
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                    1e-8) / 127.0
    return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s


def _attn_core(y, wqkv_ref, sqkv_ref, bqkv_ref, wp_ref, sp_ref, bp_ref,
               num_heads, head_dim, mf, softmax_bf16=False):
    """y: (N, C) normalized input → attention output (N, C) f32.
    mf: (N, N) f32 0/1 mask or None. The qkv weight may be head-PADDED
    (head_dim rounded up to a lane-friendly multiple with zero columns,
    see _pad_head_weights) — head_dim here is the padded one; the zero
    dims contribute nothing to any dot, so the math is unchanged.

    VPU economy (the head loop's softmax is the kernel's limiter, PERF.md):
    sm_scale is pre-folded into the q dequant scales by the caller (free),
    masking is one bias add (exp(-1e30)≈0 makes the p*mf pass redundant),
    and 1/l normalization is deferred past the PV dot onto (N, D)."""
    n, c = y.shape
    seg = num_heads * head_dim          # q/k/v segment width (≥ c if padded)
    y8, ys = _quant_rows(y)
    qkv = jax.lax.dot_general(y8, wqkv_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    qkv = qkv.astype(jnp.float32) * ys * sqkv_ref[...] + bqkv_ref[...]
    qkv16 = qkv.astype(jnp.bfloat16)

    if mf is not None:
        mbias = NEG_INF * (1.0 - mf)
    # per-head unrolled loop with static column slices — Mosaic's vector
    # layouts don't support the (N, C) → (H, N, D) reshape inside kernels.
    # Heads are processed in PHASE-SPLIT GROUPS: all score dots of a group,
    # then all softmaxes, then all PV dots — the independent chains let
    # Mosaic overlap MXU dots with VPU softmax across heads (device-time
    # A/B: -19% vs the serialized per-head chain, PERF.md r2). Group size
    # bounds the live (N, N) score buffers in VMEM.
    heads = []
    for g0 in range(0, num_heads, _SPLIT_GROUP):
        grp = range(g0, min(g0 + _SPLIT_GROUP, num_heads))
        ss = []
        for h in grp:
            lo = h * head_dim
            q_h = qkv16[:, lo:lo + head_dim]
            k_h = qkv16[:, seg + lo:seg + lo + head_dim]
            s_h = jax.lax.dot_general(q_h, k_h, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            ss.append(s_h + mbias if mf is not None else s_h)
        ps = []
        for s_h in ss:
            if softmax_bf16:
                # softmax VPU tail in bf16: bf16 shares f32's exponent
                # range (no overflow risk vs f32) and the (16, 128) native
                # tile packs two elements per lane word, so the max/sub/
                # exp/sum (N, N) passes run at up to 2× VPU throughput.
                # Probability error ~0.4% — inside the int8 path's noise.
                s16 = s_h.astype(jnp.bfloat16)
                m_h = jnp.max(s16, axis=-1, keepdims=True)
                p_h16 = jnp.exp(s16 - m_h)
                l = jnp.sum(p_h16, axis=-1, keepdims=True)
                l_r = 1.0 / jnp.maximum(l.astype(jnp.float32), 1e-30)
                if mf is not None:
                    l_r = jnp.where(m_h.astype(jnp.float32) > 0.5 * NEG_INF,
                                    l_r, 0.0)
                ps.append((p_h16, l_r))
                continue
            m_h = jnp.max(s_h, axis=-1, keepdims=True)
            p_h = jnp.exp(s_h - m_h)
            l_r = 1.0 / jnp.maximum(jnp.sum(p_h, axis=-1, keepdims=True),
                                    1e-30)
            if mf is not None:
                # fully-masked query rows (m == NEG_INF): zero via l_r —
                # (N, 1)-shaped, costs no (N, N) pass
                l_r = jnp.where(m_h > 0.5 * NEG_INF, l_r, 0.0)
            ps.append((p_h.astype(jnp.bfloat16), l_r))
        for i, h in enumerate(grp):
            lo = h * head_dim
            v_h = qkv16[:, 2 * seg + lo:2 * seg + lo + head_dim]
            o_h = jax.lax.dot_general(ps[i][0], v_h, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            heads.append(o_h * ps[i][1])
    o = jnp.concatenate(heads, axis=1)                    # (N, C)

    o8, os_ = _quant_rows(o)
    out = jax.lax.dot_general(o8, wp_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return out.astype(jnp.float32) * os_ * sp_ref[...] + bp_ref[...]


def _pad_head_weights(w_qkv, b_qkv, w_proj, num_heads, d, dp):
    """Re-lay qkv/proj weights so each head occupies a zero-padded
    `dp`-column block (dp ≥ d, lane-aligned). Zero columns/rows are inert
    in every dot, so outputs are bit-compatible with the unpadded layout
    while the per-head score/PV matmuls hit MXU-aligned shapes."""
    c = w_qkv.shape[0]
    h = num_heads
    wq = w_qkv.reshape(c, 3, h, d)
    wq_p = jnp.zeros((c, 3, h, dp), w_qkv.dtype)
    wq_p = wq_p.at[..., :d].set(wq)
    b_p = jnp.zeros((3, h, dp), b_qkv.dtype)
    b_p = b_p.at[..., :d].set(b_qkv.reshape(3, h, d))
    wp = w_proj.reshape(h, d, w_proj.shape[1])
    wp_p = jnp.zeros((h, dp, w_proj.shape[1]), w_proj.dtype)
    wp_p = wp_p.at[:, :d].set(wp)
    return (wq_p.reshape(c, 3 * h * dp), b_p.reshape(3 * h * dp),
            wp_p.reshape(h * dp, w_proj.shape[1]))


def _attn_sublayer_kernel(x_ref, g_ref, b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                          wp_ref, sp_ref, bp_ref, o_ref, *, num_heads,
                          head_dim, ln_eps, softmax_bf16):
    x = x_ref[0].astype(jnp.float32)
    y = _layernorm(x, g_ref[...], b_ref[...], ln_eps)
    a = _attn_core(y, wqkv_ref, sqkv_ref, bqkv_ref, wp_ref, sp_ref, bp_ref,
                   num_heads, head_dim, None, softmax_bf16)
    o_ref[0] = (x + a).astype(o_ref.dtype)


def _attn_sublayer_kernel_masked(x_ref, g_ref, b_ref, wqkv_ref, sqkv_ref,
                                 bqkv_ref, wp_ref, sp_ref, bp_ref, mask_ref,
                                 o_ref, *, num_heads, head_dim,
                                 ln_eps, softmax_bf16):
    x = x_ref[0].astype(jnp.float32)
    y = _layernorm(x, g_ref[...], b_ref[...], ln_eps)
    a = _attn_core(y, wqkv_ref, sqkv_ref, bqkv_ref, wp_ref, sp_ref, bp_ref,
                   num_heads, head_dim, mask_ref[0], softmax_bf16)
    o_ref[0] = (x + a).astype(o_ref.dtype)


def attn_sublayer_int8(x: jnp.ndarray, ln_g: jnp.ndarray, ln_b: jnp.ndarray,
                       w_qkv: jnp.ndarray, b_qkv: jnp.ndarray,
                       w_proj: jnp.ndarray, b_proj: jnp.ndarray,
                       num_heads: int, mask: Optional[jnp.ndarray] = None,
                       sm_scale: Optional[float] = None,
                       ln_eps: float = 1e-6,
                       softmax_bf16: bool = False,
                       interpret: bool = False) -> jnp.ndarray:
    """x: (B, N, C) → x + Attn(LN(x)). mask: (B, N, N) bool or None."""
    b, n, c = x.shape
    head_dim = c // num_heads
    scale = sm_scale if sm_scale is not None else head_dim ** -0.5
    # lane-align the per-head width (decoder: 768/16 = 48 → 64); inert
    # zero columns make the math identical while the small score/PV dots
    # hit MXU-aligned shapes
    dp = head_dim if head_dim % 64 == 0 else ((head_dim + 63) // 64) * 64
    if dp != head_dim:
        w_qkv, b_qkv, w_proj = _pad_head_weights(w_qkv, b_qkv, w_proj,
                                                 num_heads, head_dim, dp)
    seg = num_heads * dp
    q1 = quantize_weight(w_qkv)
    q2 = quantize_weight(w_proj)
    # fold sm_scale into the q-segment dequant scales + bias: the kernel
    # then needs no (N, N) scale pass (scores come out pre-scaled)
    sq = q1.scales.at[:, :seg].multiply(scale)
    q1 = q1._replace(scales=sq)
    b_qkv = jnp.asarray(b_qkv, jnp.float32).at[:seg].multiply(scale)
    gg = ln_g[None].astype(jnp.float32)
    bb = ln_b[None].astype(jnp.float32)

    weight_specs = [
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((c, 3 * seg), lambda i: (0, 0)),
        pl.BlockSpec((1, 3 * seg), lambda i: (0, 0)),
        pl.BlockSpec((1, 3 * seg), lambda i: (0, 0)),
        pl.BlockSpec((seg, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
    ]
    args = (x, gg, bb, q1.values, q1.scales,
            b_qkv[None].astype(jnp.float32),
            q2.values, q2.scales, b_proj[None].astype(jnp.float32))

    if mask is None:
        return pl.pallas_call(
            functools.partial(_attn_sublayer_kernel, num_heads=num_heads,
                              head_dim=dp, ln_eps=ln_eps,
                              softmax_bf16=softmax_bf16),
            grid=(b,),
            in_specs=[pl.BlockSpec((1, n, c), lambda i: (i, 0, 0))]
            + weight_specs,
            out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
            interpret=interpret,
        )(*args)

    return pl.pallas_call(
        functools.partial(_attn_sublayer_kernel_masked, num_heads=num_heads,
                          head_dim=dp, ln_eps=ln_eps,
                          softmax_bf16=softmax_bf16),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, c), lambda i: (i, 0, 0))]
        + weight_specs
        + [pl.BlockSpec((1, n, n), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=interpret,
    )(*args, mask.astype(jnp.float32))


def _mlp_sublayer_kernel(x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref, w2_ref,
                         s2_ref, b2_ref, o_ref, *, ln_eps):
    x = x_ref[...].astype(jnp.float32)                    # (BM, C)
    y = _layernorm(x, g_ref[...], b_ref[...], ln_eps)

    y8, ys = _quant_rows(y)
    h = jax.lax.dot_general(y8, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    h = h.astype(jnp.float32) * ys * s1_ref[...] + b1_ref[...]
    h = jax.nn.gelu(h)

    h8, hs = _quant_rows(h)
    z = jax.lax.dot_general(h8, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    z = z.astype(jnp.float32) * hs * s2_ref[...] + b2_ref[...]
    o_ref[...] = (x + z).astype(o_ref.dtype)


def _mlp_postnorm_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                         b2_ref, g_ref, b_ref, o_ref, *, ln_eps):
    """BERT FFN sublayer: out = LN(x + MLP(x)) — post-norm epilogue."""
    x = x_ref[...].astype(jnp.float32)                    # (BM, C)

    x8, xs = _quant_rows(x)
    h = jax.lax.dot_general(x8, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    h = h.astype(jnp.float32) * xs * s1_ref[...] + b1_ref[...]
    h = jax.nn.gelu(h)

    h8, hs = _quant_rows(h)
    z = jax.lax.dot_general(h8, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    z = z.astype(jnp.float32) * hs * s2_ref[...] + b2_ref[...] + x
    o_ref[...] = _layernorm(z, g_ref[...], b_ref[...], ln_eps).astype(
        o_ref.dtype)


def mlp_postnorm_int8(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                      w2: jnp.ndarray, b2: jnp.ndarray, ln_g: jnp.ndarray,
                      ln_b: jnp.ndarray, ln_eps: float = 1e-12,
                      block_m: int = 256,
                      interpret: bool = False) -> jnp.ndarray:
    """x: (..., C) → LN(x + gelu-MLP(x)) — the Q-Former query-FFN sublayer
    (BertOutput post-norm, models/qformer.py)."""
    q1 = quantize_weight(w1)
    q2 = quantize_weight(w2)
    *lead, c = x.shape
    hdim = w1.shape[1]
    assert w2.shape[1] == c
    x2 = x.reshape(-1, c)
    m = x2.shape[0]
    bm = min(block_m, m)
    pad = (-m) % bm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    mp = x2.shape[0]

    out = pl.pallas_call(
        functools.partial(_mlp_postnorm_kernel, ln_eps=ln_eps),
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((c, hdim), lambda i: (0, 0)),
            pl.BlockSpec((1, hdim), lambda i: (0, 0)),
            pl.BlockSpec((1, hdim), lambda i: (0, 0)),
            pl.BlockSpec((hdim, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, c), x.dtype),
        interpret=interpret,
    )(x2, q1.values, q1.scales, b1[None].astype(jnp.float32),
      q2.values, q2.scales, b2[None].astype(jnp.float32),
      ln_g[None].astype(jnp.float32), ln_b[None].astype(jnp.float32))
    return out[:m].reshape(*lead, c)


def mlp_sublayer_int8(x: jnp.ndarray, ln_g: jnp.ndarray, ln_b: jnp.ndarray,
                      w1: jnp.ndarray, b1: jnp.ndarray, w2: jnp.ndarray,
                      b2: jnp.ndarray, ln_eps: float = 1e-6,
                      block_m: int = 256,
                      interpret: bool = False) -> jnp.ndarray:
    """x: (..., C) → x + gelu-MLP(LN(x)). Requires w2 out == C (residual)."""
    q1 = quantize_weight(w1)
    q2 = quantize_weight(w2)
    *lead, c = x.shape
    hdim = w1.shape[1]
    assert w2.shape[1] == c, "residual requires out == in features"
    x2 = x.reshape(-1, c)
    m = x2.shape[0]
    bm = min(block_m, m)
    pad = (-m) % bm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    mp = x2.shape[0]

    out = pl.pallas_call(
        functools.partial(_mlp_sublayer_kernel, ln_eps=ln_eps),
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, hdim), lambda i: (0, 0)),
            pl.BlockSpec((1, hdim), lambda i: (0, 0)),
            pl.BlockSpec((1, hdim), lambda i: (0, 0)),
            pl.BlockSpec((hdim, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, c), x.dtype),
        interpret=interpret,
    )(x2, ln_g[None].astype(jnp.float32), ln_b[None].astype(jnp.float32),
      q1.values, q1.scales, b1[None].astype(jnp.float32),
      q2.values, q2.scales, b2[None].astype(jnp.float32))
    return out[:m].reshape(*lead, c)
