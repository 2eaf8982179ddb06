"""Fused masked attention as Pallas TPU kernels (flash-attention style).

Replaces the reference's flash-attn/xformers monkey patches
(/root/reference/src/train/llama_flash_attn_monkey_patch.py,
llama_xformers_attn_monkey_patch.py) with a native TPU kernel: the (Lq, Lk)
attention matrix never touches HBM — each q-tile program keeps K/V resident
in VMEM, computes scores on the MXU, softmaxes in fp32, and writes only the
(BQ, D) output tile. The backward pass recomputes probabilities from the
saved log-sum-exp (no attention-matrix residuals), split into a dq kernel
(q-tiled) and a dk/dv kernel (k-tiled) so every accumulation stays
race-free within one program.

Supports an arbitrary boolean mask (B, Lq, Lk) — the Setokim splicing needs
holes mid-sequence (masked invalid slots), which fixed causal-only flash
kernels can't express. Sequence lengths up to a few thousand keep K/V/mask
tiles within the ~16 MB VMEM budget (the reference's own ceiling is 2048,
scripts/finetune.sh).

Interpret mode runs the same kernels on CPU for the test harness.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30
DEFAULT_BLOCK_Q = 128


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, sm_scale):
    # mask arrives as float32 0/1 and masking is arithmetic throughout —
    # Mosaic's vector layouts reject large i1 vectors (relayout bug), and
    # multiply-masking fuses better on the VPU anyway
    q = q_ref[0, 0]                                     # (BQ, D) native dtype
    k = k_ref[0, 0]                                     # — MXU takes bf16 in,
    v = v_ref[0, 0]                                     # f32 accumulates
    mf = mask_ref[0]                                    # (BQ, LK) 0/1 f32

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    s = s * mf + NEG_INF * (1.0 - mf)
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -1e30)
    # masked entries contribute exactly 0 (grad-blocking where-mask)
    p = jnp.exp(s - m) * mf
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) / l
    # fully-masked rows (invalid query slots) → defined zero output
    row_valid = jnp.minimum(jnp.sum(mf, axis=-1, keepdims=True), 1.0)
    o = o * row_valid
    o_ref[0, 0] = o.astype(o_ref.dtype)
    lse_ref[0, 0, 0] = (m[:, 0] + jnp.log(l[:, 0])).astype(lse_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, do_ref, lse_ref,
                   dq_ref, *, sm_scale):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    mf = mask_ref[0]
    o = o_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0, 0].astype(jnp.float32)          # (BQ,)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    s = s * mf + NEG_INF * (1.0 - mf)
    p = jnp.exp(s - lse[:, None]) * mf                  # (BQ, LK)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - delta) * sm_scale
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, do_ref, lse_ref,
                    dk_ref, dv_ref, *, sm_scale):
    q = q_ref[0, 0].astype(jnp.float32)                 # (LQ, D)
    k = k_ref[0, 0].astype(jnp.float32)                 # (BK, D)
    v = v_ref[0, 0].astype(jnp.float32)
    mf = mask_ref[0]                                    # (LQ, BK)
    o = o_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0, 0].astype(jnp.float32)          # (LQ,)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    s = s * mf + NEG_INF * (1.0 - mf)
    p = jnp.exp(s - lse[:, None]) * mf                  # (LQ, BK)
    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - delta) * sm_scale                    # (LQ, BK)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(q, k, v, mask, sm_scale: Optional[float] = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    interpret: bool = False):
    """Fused attention. q: (B, H, Lq, D); k/v: (B, H, Lk, D);
    mask: (B, Lq, Lk) bool (True = attend). Returns (B, H, Lq, D)."""
    o, _ = _fwd(q, k, v, mask, sm_scale, block_q, interpret)
    return o


def _resolve_scale(q, sm_scale):
    return sm_scale if sm_scale is not None else 1.0 / (q.shape[-1] ** 0.5)


def _fwd(q, k, v, mask, sm_scale, block_q, interpret):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = _resolve_scale(q, sm_scale)
    bq = min(block_q, lq)

    qp = _pad_to(q, 2, bq)
    maskp = _pad_to(mask.astype(jnp.float32), 1, bq)
    lqp = qp.shape[2]
    grid = (b, h, lqp // bq)

    out_shape = (jax.ShapeDtypeStruct((b, h, lqp, d), q.dtype),
                 jax.ShapeDtypeStruct((b, h, 1, lqp), jnp.float32))
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, lk, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, lk, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, bq, lk), lambda bi, hi, qi: (bi, qi, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 1, bq), lambda bi, hi, qi: (bi, hi, 0, qi)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(qp, k, v, maskp)
    return o[:, :, :lq], lse[:, :, :, :lq]


def _flash_fwd_rule(q, k, v, mask, sm_scale, block_q, interpret):
    o, lse = _fwd(q, k, v, mask, sm_scale, block_q, interpret)
    return o, (q, k, v, mask, o, lse)


def _flash_bwd_rule(sm_scale, block_q, interpret, res, do):
    q, k, v, mask, o, lse = res
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = _resolve_scale(q, sm_scale)
    bq = min(block_q, lq)
    bk = min(block_q, lk)

    # ---- dq: tile over q blocks, K/V resident ----
    qp = _pad_to(q, 2, bq)
    op = _pad_to(o, 2, bq)
    dop = _pad_to(do, 2, bq)
    lsep = _pad_to(lse, 3, bq)
    maskq = _pad_to(mask.astype(jnp.float32), 1, bq)
    lqp = qp.shape[2]
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sm_scale=scale),
        grid=(b, h, lqp // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, lk, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, lk, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, bq, lk), lambda bi, hi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 1, bq), lambda bi, hi, qi: (bi, hi, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, lqp, d), q.dtype),
        interpret=interpret,
    )(qp, k, v, maskq, op, dop, lsep)[:, :, :lq]

    # ---- dk/dv: tile over k blocks, Q/dO resident ----
    kp = _pad_to(k, 2, bk)
    vp = _pad_to(v, 2, bk)
    maskk = _pad_to(mask.astype(jnp.float32), 2, bk)
    lkp = kp.shape[2]
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, sm_scale=scale),
        grid=(b, h, lkp // bk),
        in_specs=[
            pl.BlockSpec((1, 1, lq, d), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, lq, bk), lambda bi, hi, ki: (bi, 0, ki)),
            pl.BlockSpec((1, 1, lq, d), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, lq, d), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, 1, lq), lambda bi, hi, ki: (bi, hi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
        ),
        out_shape=(jax.ShapeDtypeStruct((b, h, lkp, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, lkp, d), v.dtype)),
        interpret=interpret,
    )(q, kp, vp, maskk, o, do, lse)
    return dq, dk[:, :, :lk], dv[:, :, :lk], None


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def attention_reference(q, k, v, mask, sm_scale: Optional[float] = None):
    """Plain-jax reference for tests: identical math, materialized scores.
    Fully-masked rows output zero (the kernel's defined semantics)."""
    scale = _resolve_scale(q, sm_scale)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s = jnp.where(mask[:, None], s, NEG_INF)
    p = jnp.where(mask[:, None], jax.nn.softmax(s, axis=-1), 0.0)
    p = p / jnp.maximum(jnp.sum(p, -1, keepdims=True), 1e-30)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return jnp.where(mask[:, None].any(-1, keepdims=True), o,
                     0.0).astype(q.dtype)
