"""w8a8 quantized matmul as a Pallas TPU kernel (dynamic activation quant).

The frozen SigLIP encoder dominates the tokenizer's inference FLOPs; int8
runs the v5e MXU at ~2× bf16 rate, which is the main remaining lever toward
the throughput north-star (PARITY.md). Pattern follows the quantization
section of the Pallas guide:

  * weights are quantized offline per-output-channel (`quantize_weight`);
  * activations are quantized *inside the kernel* per row with a dynamic
    scale (abs-max / 127) — no calibration pass needed;
  * the int8×int8 dot accumulates in int32 on the MXU, then dequantizes
    with the outer product of scales.

`quant_dense` is the drop-in for `x @ w + b` on frozen layers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


class QuantizedWeight(NamedTuple):
    values: jnp.ndarray    # (K, N) int8
    scales: jnp.ndarray    # (1, N) float32 — per-output-channel


def quantize_weight(w: jnp.ndarray) -> QuantizedWeight:
    """Per-output-channel symmetric int8 quantization of a (K, N) kernel."""
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QuantizedWeight(values=q, scales=scale)


def _quant_matmul_kernel(x_ref, w_ref, ws_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)                  # (BM, K)
    # dynamic per-row activation scale
    xs = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                     1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o_ref[...] = (acc.astype(jnp.float32) * xs
                  * ws_ref[...]).astype(o_ref.dtype)


def quant_matmul(x: jnp.ndarray, qw: QuantizedWeight,
                 block_m: int = 256, out_dtype=None,
                 interpret: bool = False) -> jnp.ndarray:
    """x: (..., K) float → (..., N) in out_dtype (default x.dtype)."""
    out_dtype = out_dtype or x.dtype
    *lead, k = x.shape
    n = qw.values.shape[1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    bm = min(block_m, m)
    pad = (-m) % bm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    mp = x2.shape[0]

    out = pl.pallas_call(
        _quant_matmul_kernel,
        grid=(mp // bm,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0)),
                  pl.BlockSpec((1, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        interpret=interpret,
    )(x2, qw.values, qw.scales)
    return out[:m].reshape(*lead, n)


def quant_dense(x: jnp.ndarray, qw: QuantizedWeight,
                bias: Optional[jnp.ndarray] = None,
                interpret: bool = False) -> jnp.ndarray:
    y = quant_matmul(x, qw, interpret=interpret)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def matmul_reference(x, qw: QuantizedWeight):
    """Dequantized reference (same weight error, exact activation math)."""
    w = qw.values.astype(jnp.float32) * qw.scales
    return x.astype(jnp.float32) @ w


# ---------------------------------------------------------------- int4
class Quant4Weight(NamedTuple):
    """Half-packed w4: two int4 rows per byte. Row i of the logical (K, N)
    int4 matrix lives in the LOW nibble of packed row i for i < K/2 and in
    the HIGH nibble of packed row i - K/2 otherwise (contiguous halves —
    Mosaic cannot lower the strided slices an interleaved packing would
    need)."""
    packed: jnp.ndarray    # (K//2, N) int8 — two nibbles per byte
    scales: jnp.ndarray    # (1, N) float32 — per-output-channel


def quantize_weight_int4(w: jnp.ndarray) -> Quant4Weight:
    """Per-output-channel symmetric int4 ([-7, 7]) quantization + packing.

    Round-to-nearest int4 costs ~7e-2 max-rel output error on LLaMA-shaped
    linears (vs ~1e-2 at int8, perf/ab_int4_decode.py) — acceptable for
    drafting/latency-first serving; calibrate offline if that matters.
    """
    w = w.astype(jnp.float32)
    k = w.shape[0]
    assert k % 2 == 0, f"int4 packing needs even K, got {k}"
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True),
                        1e-8) / 7.0
    q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int32)
    lo = q[: k // 2] & 0xF
    hi = (q[k // 2:] & 0xF) << 4
    return Quant4Weight(packed=(lo | hi).astype(jnp.int8),
                        scales=scale.astype(jnp.float32))


def unpack_nibbles(p: jnp.ndarray):
    """int8 bytes → two sign-extended int8 planes (low, high). int8 out so
    the dots still run at the MXU's int8 rate."""
    p32 = p.astype(jnp.int32)
    lo = ((p32 & 0xF) << 28) >> 28
    hi = (p32 << 24) >> 28
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def _quant4_matmul_kernel(x_ref, p_ref, s_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)                  # (BM, K)
    xs = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                     1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    k_half = p_ref.shape[0]
    lo, hi = unpack_nibbles(p_ref[...])
    acc = (jax.lax.dot_general(xq[:, :k_half], lo, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
           + jax.lax.dot_general(xq[:, k_half:], hi,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32))
    o_ref[...] = (acc.astype(jnp.float32) * xs
                  * s_ref[...]).astype(o_ref.dtype)


def _pick_block_n(k: int, n: int, budget_bytes: int = 8 << 20) -> int:
    """Largest 128-multiple divisor of n whose VMEM need (packed block +
    two unpacked planes ≈ 1.5·k·bn bytes) fits the budget; whole-n if no
    such divisor exists (tiny test shapes)."""
    best = 0
    for bn in range(128, n + 1, 128):
        if n % bn == 0 and 3 * (k // 2) * bn <= budget_bytes:
            best = bn
    return best or n


def quant4_matmul(x: jnp.ndarray, qw: Quant4Weight,
                  block_m: int = 256, block_n: Optional[int] = None,
                  out_dtype=None, interpret: bool = False) -> jnp.ndarray:
    """x: (..., K) float → (..., N). Weight streams from HBM in (K/2, BN)
    byte blocks — HALF the int8 path's traffic, which is the whole point in
    the weight-streaming-bound decode regime (PERF.md int4-decode section:
    33–38% faster per linear than int8 at B=8 on v5e). The in-kernel nibble
    unpack (3 VPU int ops/elem) hides under the DMA wait it halves."""
    out_dtype = out_dtype or x.dtype
    *lead, k = x.shape
    n = qw.packed.shape[1]
    assert qw.packed.shape[0] * 2 == k, (qw.packed.shape, k)
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    bm = min(block_m, m)
    pad = (-m) % bm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    mp = x2.shape[0]
    bn = block_n or _pick_block_n(k, n)

    out = pl.pallas_call(
        _quant4_matmul_kernel,
        grid=(mp // bm, n // bn),
        in_specs=[pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
                  pl.BlockSpec((k // 2, bn), lambda i, j: (0, j)),
                  pl.BlockSpec((1, bn), lambda i, j: (0, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        interpret=interpret,
    )(x2, qw.packed, qw.scales)
    return out[:m].reshape(*lead, n)


def matmul4_reference(x, qw: Quant4Weight):
    """Dequantized reference (same weight error, exact activation math)."""
    lo, hi = unpack_nibbles(qw.packed)
    w = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32) * qw.scales
    return x.astype(jnp.float32) @ w
