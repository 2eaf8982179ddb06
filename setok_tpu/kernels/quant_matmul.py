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
import numpy as np
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
    """Dequantized reference (same weight error, exact activation math).

    Precision.HIGHEST: on TPU the default f32 matmul runs bf16 MXU passes
    (~1e-2 rel error) — the int32-accumulating kernel is *more* exact than
    that, so the oracle must use full f32 or the on-chip parity test fails
    on oracle error (tests_tpu wave-2, rc=1)."""
    w = qw.values.astype(jnp.float32) * qw.scales
    return jnp.matmul(x.astype(jnp.float32), w,
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------- int4
class Quant4Weight(NamedTuple):
    """Half-packed w4: two int4 rows per byte. Row i of the logical (K, N)
    int4 matrix lives in the LOW nibble of packed row i for i < K/2 and in
    the HIGH nibble of packed row i - K/2 otherwise (contiguous halves —
    Mosaic cannot lower the strided slices an interleaved packing would
    need)."""
    packed: jnp.ndarray    # (K//2, N) int8 — two nibbles per byte
    scales: jnp.ndarray    # (K//G or 1, N) float32 — per-group/-channel


def quantize_weight_int4(w: jnp.ndarray,
                         group_size: Optional[int] = None,
                         clip_search: int = 0,
                         row_weight: Optional[jnp.ndarray] = None
                         ) -> Quant4Weight:
    """Symmetric int4 ([-7, 7]) quantization + packing.

    Per-output-channel (group_size=None) round-to-nearest costs ~7e-2
    max-rel output error on LLaMA-shaped linears (vs ~1e-2 at int8,
    perf/ab_int4_decode.py). `group_size=G` gives each (G, 1) slab of the
    input dim its own scale — the GPTQ/AWQ-standard remedy: outlier rows
    no longer inflate the whole column's step. Scale rows are laid out to
    match the nibble planes: row g scales logical K-rows [gG, (g+1)G),
    so planes lo/hi consume scale rows [0, K/2G) and [K/2G, K/G).

    `clip_search=R` (R>0) refines each scale by trying R clip ratios in
    [0.5, 1.0]·absmax and keeping the one minimizing the group's weighted
    reconstruction error — absmax RTN wastes quantization steps on the
    single largest entry, and clipping it trades its (bounded) error for
    a finer step everywhere else. `row_weight` (K,) optionally weights
    error rows by calibration second moments E[x_k²] (a diagonal-Hessian
    / AWQ-style importance), so output-MSE — not weight-MSE — is what the
    search minimizes. Offline cost: R extra quantize passes. The packed
    layout and kernel are unchanged; reference: GPTQ/AWQ lineage, recast
    as a vectorized scale search (no per-column Cholesky)."""
    w = w.astype(jnp.float32)
    k = w.shape[0]
    assert k % 2 == 0, f"int4 packing needs even K, got {k}"
    if group_size is None:
        g, wg = 1, w.reshape(1, k, -1)
    else:
        assert k % group_size == 0 and (k // 2) % group_size == 0, \
            (k, group_size)
        g = k // group_size
        wg = w.reshape(g, group_size, -1)
    scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=1), 1e-8) / 7.0  # (g, N)
    if clip_search:
        dw = (jnp.ones((1, wg.shape[1], 1), jnp.float32)
              if row_weight is None else
              jnp.asarray(row_weight, jnp.float32).reshape(
                  g, wg.shape[1], 1))
        best_err = jnp.full(scale.shape, jnp.inf, jnp.float32)
        best_scale = scale
        for r in np.linspace(1.0, 0.5, clip_search):
            s = scale * float(r)
            q = jnp.clip(jnp.round(wg / s[:, None, :]), -7, 7)
            err = jnp.sum(dw * (wg - q * s[:, None, :]) ** 2, axis=1)
            best_scale = jnp.where(err < best_err, s, best_scale)
            best_err = jnp.minimum(err, best_err)
        scale = best_scale
    q = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7)
    q = q.reshape(k, -1).astype(jnp.int32)
    if group_size is None:
        scale = scale.reshape(1, -1)
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


def _quant4_matmul_kernel(x_ref, p_ref, s_ref, o_ref, *, group_rows):
    x = x_ref[...].astype(jnp.float32)                  # (BM, K)
    xs = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                     1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    k_half = p_ref.shape[0]
    lo, hi = unpack_nibbles(p_ref[...])
    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    if group_rows == 0:                     # one scale per output channel
        acc = dot(xq[:, :k_half], lo) + dot(xq[:, k_half:], hi)
        o_ref[...] = (acc.astype(jnp.float32) * xs
                      * s_ref[...]).astype(o_ref.dtype)
        return
    # per-group: one int32 dot per (G-deep) slab, scaled into an fp32
    # accumulator. The slab dots still run the MXU at the int8 rate; the
    # extra VPU multiply-adds are noise next to the weight DMA this
    # kernel pipelines.
    s = s_ref[...]
    n_half = k_half // group_rows
    accf = jnp.zeros((x.shape[0], o_ref.shape[1]), jnp.float32)
    for g in range(n_half):
        sl = slice(g * group_rows, (g + 1) * group_rows)
        a = dot(xq[:, :k_half][:, sl], lo[sl])
        accf += a.astype(jnp.float32) * s[g:g + 1, :]
    for g in range(n_half):
        sl = slice(g * group_rows, (g + 1) * group_rows)
        a = dot(xq[:, k_half:][:, sl], hi[sl])
        accf += a.astype(jnp.float32) * s[n_half + g:n_half + g + 1, :]
    o_ref[...] = (accf * xs).astype(o_ref.dtype)


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
    n_scales = qw.scales.shape[0]
    group_rows = 0 if n_scales == 1 else (k // 2) // (n_scales // 2)

    out = pl.pallas_call(
        functools.partial(_quant4_matmul_kernel, group_rows=group_rows),
        grid=(mp // bm, n // bn),
        in_specs=[pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
                  pl.BlockSpec((k // 2, bn), lambda i, j: (0, j)),
                  pl.BlockSpec((n_scales, bn), lambda i, j: (0, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        interpret=interpret,
    )(x2, qw.packed, qw.scales)
    return out[:m].reshape(*lead, n)


def matmul4_reference(x, qw: Quant4Weight):
    """Dequantized reference (same weight error, exact activation math)."""
    lo, hi = unpack_nibbles(qw.packed)
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    g = qw.scales.shape[0]
    if g == 1:
        w = q * qw.scales
    else:
        rows = q.shape[0] // g
        w = (q.reshape(g, rows, -1) * qw.scales[:, None, :]).reshape(q.shape)
    # HIGHEST: see matmul_reference — the TPU default (bf16 passes) is less
    # exact than the kernel's int32 accumulation.
    return jnp.matmul(x.astype(jnp.float32), w,
                      precision=jax.lax.Precision.HIGHEST)
