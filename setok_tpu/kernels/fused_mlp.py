"""Fused int8 MLP kernel: quant → fc1 → gelu → quant → fc2 in ONE pallas call.

Why: routing each Dense through its own quantized pallas_call (quant_matmul)
turned out e2e-neutral — every pallas_call is a fusion barrier, so the
intermediate (tokens × hidden) activation does a full HBM round trip that
XLA would otherwise fuse away (ROADMAP.md #1). This kernel keeps the
intermediate in VMEM: both matmuls run int8 on the MXU, the GELU runs on the
VPU between them, and only the (tokens × C) input/output touch HBM.

VMEM budget at (BM=256, C=768, H=3072): w1+w2 int8 ≈ 4.5 MB, x/out tiles
≈ 1.6 MB, intermediate ≈ 3 MB — comfortably inside 16 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from setok_tpu.kernels.quant_matmul import QuantizedWeight, quantize_weight


def _fused_mlp_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                      o_ref):
    x = x_ref[...].astype(jnp.float32)                    # (BM, C)

    xs = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                     1e-8) / 127.0
    x8 = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    h = jax.lax.dot_general(x8, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    h = h.astype(jnp.float32) * xs * s1_ref[...] + b1_ref[...]
    h = jax.nn.gelu(h)

    hs = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True),
                     1e-8) / 127.0
    h8 = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(h8, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * hs * s2_ref[...] + b2_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


def fused_mlp_int8(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                   w2: jnp.ndarray, b2: jnp.ndarray,
                   block_m: int = 256, interpret: bool = False
                   ) -> jnp.ndarray:
    """x: (..., C) → gelu-MLP output (..., C_out); weights are float params
    (quantized per-output-channel on the fly — O(K·N), trivial next to the
    matmuls and fused into the preamble by XLA)."""
    q1: QuantizedWeight = quantize_weight(w1)
    q2: QuantizedWeight = quantize_weight(w2)

    *lead, c = x.shape
    hdim = w1.shape[1]
    c_out = w2.shape[1]
    x2 = x.reshape(-1, c)
    m = x2.shape[0]
    bm = min(block_m, m)
    pad = (-m) % bm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    mp = x2.shape[0]

    out = pl.pallas_call(
        _fused_mlp_kernel,
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((c, hdim), lambda i: (0, 0)),
            pl.BlockSpec((1, hdim), lambda i: (0, 0)),
            pl.BlockSpec((1, hdim), lambda i: (0, 0)),
            pl.BlockSpec((hdim, c_out), lambda i: (0, 0)),
            pl.BlockSpec((1, c_out), lambda i: (0, 0)),
            pl.BlockSpec((1, c_out), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, c_out), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, c_out), x.dtype),
        interpret=interpret,
    )(x2, q1.values, q1.scales, b1[None].astype(jnp.float32),
      q2.values, q2.scales, b2[None].astype(jnp.float32))
    return out[:m].reshape(*lead, c_out)


def mlp_reference(x, w1, b1, w2, b2):
    """Float reference with the same structure (gelu between)."""
    h = jax.nn.gelu(x.astype(jnp.float32) @ w1.astype(jnp.float32)
                    + b1.astype(jnp.float32))
    return h @ w2.astype(jnp.float32) + b2.astype(jnp.float32)
