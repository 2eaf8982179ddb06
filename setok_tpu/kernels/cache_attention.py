"""Decode attention over an int8 KV cache, dequantized in-kernel.

The int8 cache (models/llama.py KVCache: int8 K/V + per-token-per-head
f32 scales) halves decode's dominant HBM stream ONLY if the dequant
multiply stays fused with the attention dots. XLA is free to materialize
`cache.astype(bf16) * scale` as a full (B, S, KVH, D) tensor first —
which would ADD a 2x write+read instead of saving one. This kernel makes
the fusion structural: each (batch, kv-head) program streams its (S, D)
int8 K/V slab + (S,) scales into VMEM once, applies the scales inside
the score/PV dots, and writes only the (G, D) output.

Decode shapes only (query length 1; GQA folded as G = heads/kv_heads
query rows per program). The scale algebra keeps dequant out of the
(S, D) slab entirely:

  scores = (q · Kᵀ) * k_scaleᵀ        (right-scale the score columns)
  out    = (p * v_scale) · V          (fold V's dequant into p)

Reference: no serving engine exists in the reference (SURVEY §2.7); this
extends its flash-attn monkey-patch role (llama_flash_attn_monkey_patch
.py) to the quantized-cache serving regime.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30
# VMEM guard: K/V int8 slabs + f32 conversions per program ≈ S·D·10 bytes.
MAX_CACHE_TOKENS = 8192


def _kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, m_ref, o_ref, *,
            sm_scale: float):
    q = q_ref[0, 0].astype(jnp.float32)                  # (G, D)
    k = k_ref[0, :, 0].astype(jnp.float32)               # (S, D)
    ks = ks_ref[0, :, 0]                                 # (S,)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * (ks * sm_scale)[None, :]                     # (G, S)
    s = jnp.where(m_ref[0][None, :], s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    vs = vs_ref[0, :, 0]                                 # (S,)
    v = v_ref[0, :, 0].astype(jnp.float32)               # (S, D)
    o_ref[0, 0] = jnp.dot(p * vs[None, :], v,
                          preferred_element_type=jnp.float32
                          ).astype(o_ref.dtype)


def int8_cache_decode_attention(q, k_cache, k_scale, v_cache, v_scale,
                                key_valid, sm_scale: float | None = None,
                                interpret: bool = False):
    """q: (B, H, D) post-RoPE queries (one decode step).
    k_cache/v_cache: (B, S, KVH, D) int8; k_scale/v_scale: (B, S, KVH) f32;
    key_valid: (B, S) bool. Returns (B, H, D) in q.dtype."""
    b, h, d = q.shape
    _, s, kvh, _ = k_cache.shape
    g = h // kvh
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(d))
    qg = q.reshape(b, kvh, g, d)
    grid = (b, kvh)
    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=float(sm_scale)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, g, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, s, 1, d), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, s, 1), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, s, 1, d), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, s, 1), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, s), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, d), q.dtype),
        interpret=interpret,
    )(qg, k_cache, k_scale, v_cache, v_scale, key_valid)
    return out.reshape(b, h, d)


def fits_vmem(max_len: int) -> bool:
    """Whether one (S, D) slab per program stays within the VMEM guard."""
    return max_len <= MAX_CACHE_TOKENS
