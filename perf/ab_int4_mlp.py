"""int4-weight experiment on the MLP sublayer (VERDICT r3 item 3).

The only argued route past the ~1600 img/s per-kernel envelope is lower
precision. This measures what int4 WEIGHTS actually buy on v5e for the
bench's hot MLP sublayer (8192,768)x(768,3072)x(3072,768):

  a) int8 baseline — the shipped `mlp_sublayer_int8` (w8a8);
  b) w4a8-packed — weights stored as two int4 nibbles per int8 byte
     (HALF the weight bytes in VMEM/HBM), unpacked in-kernel to int8 and
     fed to the same int8 MXU dots;
  c) w4a8-native — weights passed as jnp.int4 arrays, letting
     Mosaic/XLA pick the lowering (if int4 refs are supported at all).

v5e's MXU is spec'd at 394 TOPS *int8*; there is no published int4
double-rate on this generation, so the expected win is memory/bandwidth
only — which the compute-bound MLP kernel doesn't need. The experiment
pins that expectation with device time.

Run ON THE TPU: python perf/ab_int4_mlp.py
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")
from perf.trace_ab import device_time_ab  # noqa: E402
from setok_tpu.kernels.fused_sublayer import (  # noqa: E402
    _layernorm, _quant_rows, mlp_sublayer_int8)


def quantize_weight_int4(w):
    """Per-output-channel symmetric int4: values in [-7, 7] + f32 scales."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-8) / 7.0
    q = jnp.clip(jnp.round(w / s), -7, 7).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def pack_nibbles(q):
    """(C, N) int4-range int8 → (C/2, N) bytes: row i in the low nibble,
    row i + C/2 in the high nibble (half-packing → the kernel unpacks to
    contiguous row blocks; Mosaic cannot lower strided slices)."""
    c = q.shape[0]
    lo = q[: c // 2].astype(jnp.int32) & 0xF
    hi = (q[c // 2:].astype(jnp.int32) & 0xF) << 4
    return (lo | hi).astype(jnp.int8)


def _unpack_nibbles(p):
    """int8 bytes → two int4-sign-extended int8 planes (low, high) —
    int8 out so the dots still hit the MXU's int8 rate."""
    p32 = p.astype(jnp.int32)
    lo = ((p32 & 0xF) << 28) >> 28          # sign-extend low nibble
    hi = (p32 << 24) >> 28                  # sign-extend high nibble
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def _mlp_w4_kernel(x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref, w2_ref,
                   s2_ref, b2_ref, o_ref, *, ln_eps):
    x = x_ref[...].astype(jnp.float32)
    y = _layernorm(x, g_ref[...], b_ref[...], ln_eps)
    y8, ys = _quant_rows(y)

    c_half = w1_ref.shape[0]
    lo1, hi1 = _unpack_nibbles(w1_ref[...])
    # half-packed: first C/2 activation columns dot the low nibbles,
    # the rest dot the high nibbles — contiguous slices only
    h = (jax.lax.dot_general(y8[:, :c_half], lo1, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
         + jax.lax.dot_general(y8[:, c_half:], hi1, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32))
    h = h.astype(jnp.float32) * ys * s1_ref[...] + b1_ref[...]
    h = jax.nn.gelu(h)

    h8, hs = _quant_rows(h)
    h_half = w2_ref.shape[0]
    lo2, hi2 = _unpack_nibbles(w2_ref[...])
    z = (jax.lax.dot_general(h8[:, :h_half], lo2, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
         + jax.lax.dot_general(h8[:, h_half:], hi2, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32))
    z = z.astype(jnp.float32) * hs * s2_ref[...] + b2_ref[...]
    o_ref[...] = (x + z).astype(o_ref.dtype)


def mlp_sublayer_w4(x, ln_g, ln_b, w1, b1, w2, b2, block_m=256):
    q1, s1 = quantize_weight_int4(w1)
    q2, s2 = quantize_weight_int4(w2)
    p1, p2 = pack_nibbles(q1), pack_nibbles(q2)
    *lead, c = x.shape
    hdim = w1.shape[1]
    x2 = x.reshape(-1, c)
    m = x2.shape[0]
    bm = min(block_m, m)
    assert m % bm == 0
    out = pl.pallas_call(
        functools.partial(_mlp_w4_kernel, ln_eps=1e-5),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c // 2, hdim), lambda i: (0, 0)),
            pl.BlockSpec((1, hdim), lambda i: (0, 0)),
            pl.BlockSpec((1, hdim), lambda i: (0, 0)),
            pl.BlockSpec((hdim // 2, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
    )(x2, ln_g[None].astype(jnp.float32), ln_b[None].astype(jnp.float32),
      p1, s1, b1[None].astype(jnp.float32),
      p2, s2, b2[None].astype(jnp.float32))
    return out.reshape(*lead, c)


def main():
    print("devices:", jax.devices())
    rs = np.random.RandomState(0)
    B, N, C, H = 32, 256, 768, 3072
    x = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
    g = jnp.ones((C,), jnp.float32)
    bb = jnp.zeros((C,), jnp.float32)
    w1 = jnp.asarray(rs.randn(C, H).astype(np.float32) * 0.02)
    b1 = jnp.asarray(rs.randn(H).astype(np.float32) * 0.01)
    w2 = jnp.asarray(rs.randn(H, C).astype(np.float32) * 0.02)
    b2 = jnp.asarray(rs.randn(C).astype(np.float32) * 0.01)
    args = (x, g, bb, w1, b1, w2, b2)

    def int8(xx, *w):
        return mlp_sublayer_int8(xx, *w)

    def w4(xx, *w):
        return mlp_sublayer_w4(xx, *w)

    ya = int8(*args)
    yb = w4(*args)
    rel = float(jnp.max(jnp.abs(ya - yb))
                / jnp.maximum(jnp.max(jnp.abs(ya)), 1e-9))
    variants = {"int8": int8, "w4packed": w4}

    # variant c: native jnp.int4 refs, if Mosaic takes them at all
    try:
        def _native_kernel(x_ref, w_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                x_ref[...].astype(jnp.int8), w_ref[...].astype(jnp.int8),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        q4 = jnp.clip(jnp.round(w1 / 0.02), -7, 7).astype(jnp.int4)
        x8 = jnp.clip(jnp.round(x.reshape(-1, C)), -127, 127).astype(jnp.int8)
        out = pl.pallas_call(
            _native_kernel,
            in_specs=[pl.BlockSpec((B * N, C), lambda: (0, 0)),
                      pl.BlockSpec((C, H), lambda: (0, 0))],
            out_specs=pl.BlockSpec((B * N, H), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((B * N, H), jnp.int32),
        )(x8, q4)
        jax.block_until_ready(out)
        print("native int4 refs: compile OK")
    except Exception as e:
        print(f"native int4 refs: NOT SUPPORTED ({type(e).__name__}: "
              f"{str(e)[:120]})")

    ms = device_time_ab(variants, args, iters=24)
    print(f"int8 baseline : {ms['int8']:.4f} ms/call")
    print(f"w4 packed     : {ms['w4packed']:.4f} ms/call "
          f"({100 * (1 - ms['w4packed'] / max(ms['int8'], 1e-9)):+.1f}%)")
    print(f"max rel diff int8 vs w4: {rel:.2e}")


if __name__ == "__main__":
    main()
