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
