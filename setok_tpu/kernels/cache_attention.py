"""Decode attention over an int8 KV cache, dequantized in-kernel.

STATUS — opt-in, measured SLOWER than the XLA path it was built to beat.
The on-chip A/B (perf/ab_int8_cache.py @ b801966; PERF.md "int8 KV
cache") at B=8, S=4096, 8 layers: this kernel 11.09 ms/step vs 6.19 for
the same int8 cache dequantized by XLA outside the kernel (bf16 cache:
8.65). The design premise — that XLA would materialize a full bf16
dequant copy and give back the saved bandwidth — is disproven by that
experiment: XLA fuses `cache * scale` into the attention dots fine.
The kernel's own deficit is layout: each (batch, kv-head) program
streams its (S, D) head slab as a strided column block of the flattened
(B, S, KVH·D) cache — 128-byte contiguous runs, poor HBM efficiency —
plus every program re-reads all KVH scale columns. models/llama.py
routes int8-cache decode through XLA dequant by default; this kernel
stays behind `cache_kernel=True` for study/regression tracking.

Original design: each (batch, kv-head) program streams its (S, D)
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
            sm_scale: float, kvh: int):
    # Block layouts are chosen so every block's last two dims are either
    # equal to the array dims or 128-divisible (Mosaic's lowering rule —
    # a (1, S, 1, D) block over (B, S, KVH, D) is NOT lowerable; caught on
    # the first real-chip run of perf/ab_int8_cache.py).
    j = pl.program_id(1)
    q = q_ref[0, 0].astype(jnp.float32)                  # (G, D)
    k = k_ref[0].astype(jnp.float32)                     # (S, D)
    # scale blocks carry all KVH columns (tiny vs the int8 slab); pick
    # this program's head column with a one-hot reduce (no dynamic lane
    # indexing in Mosaic)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, kvh), 1) == j)
    ks = jnp.sum(ks_ref[0] * sel, axis=-1)               # (S,)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * (ks * sm_scale)[None, :]                     # (G, S)
    s = jnp.where(m_ref[0, 0][None, :], s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    vs = jnp.sum(vs_ref[0] * sel, axis=-1)               # (S,)
    v = v_ref[0].astype(jnp.float32)                     # (S, D)
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
    # (B, S, KVH, D) → (B, S, KVH·D) is a free view of the same bytes; each
    # program then streams its head's (S, D) slab as a 128-aligned column
    # block of the flattened axis.
    k2 = k_cache.reshape(b, s, kvh * d)
    v2 = v_cache.reshape(b, s, kvh * d)
    m3 = key_valid.reshape(b, 1, s)
    grid = (b, kvh)
    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=float(sm_scale), kvh=kvh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, g, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, s, kvh), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, s, kvh), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, d), q.dtype),
        interpret=interpret,
    )(qg, k2, k_scale, v2, v_scale, m3)
    return out.reshape(b, h, d)


def fits_vmem(max_len: int, head_dim: int = 128, kv_heads: int = 1,
              interpret: bool = False) -> bool:
    """Whether the kernel can run: VMEM slab guard + Mosaic layout rule
    (the flattened KV column block must be 128-aligned unless it spans the
    whole axis). Interpret mode (CPU tests) has no layout rule."""
    return (max_len <= MAX_CACHE_TOKENS
            and (interpret or head_dim % 128 == 0 or kv_heads == 1))
