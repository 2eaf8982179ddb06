"""int4 weights for the HBM-bound LLaMA decode path (ROADMAP item 8).

The tokenizer-bench int4 experiment (perf/ab_int4_mlp.py) was negative
because that kernel is COMPUTE-bound: weights persist in VMEM across grid
steps, so halving their bytes buys nothing and the nibble unpack costs 12%.
The serving decode step is the opposite regime — at slot-batch B≤8 every
linear is weight-STREAMING-bound: each token reads the full (K, N) matrix
from HBM to multiply an (B, K) sliver, so time ≈ weight_bytes / HBM_BW and
the MXU idles. There, bytes are the whole game: bf16→int8 already halves
decode weight traffic (the shipped bits=8 trunk); int4 would halve it
again IF the in-kernel unpack hides under the DMA wait.

This measures device-time/call on Vicuna-7B decode shapes, B=8 slots:

  up   : (8, 4096)  x (4096, 11008)
  down : (8, 11008) x (11008, 4096)

variants:
  bf16          — plain XLA dot, bf16 weights          (90.2 MB streamed)
  int8_whole    — shipped quant_matmul (weight as one pallas block)
  int8_stream   — w8a8, grid over N so weight blocks pipeline (45.1 MB)
  w4a8_stream   — half-packed nibbles (two int4 rows per byte), unpacked
                  to int8 in-kernel, same int8 MXU dots  (22.6 MB)

Run ON THE TPU: python perf/ab_int4_decode.py
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")
from perf.trace_ab import device_time_ab                    # noqa: E402
from perf.ab_int4_mlp import (quantize_weight_int4,          # noqa: E402
                              pack_nibbles, _unpack_nibbles)
from setok_tpu.kernels.quant_matmul import (                 # noqa: E402
    QuantizedWeight, quant_matmul, quantize_weight)


# ---------------------------------------------------------------- kernels
def _w8_stream_kernel(x_ref, w_ref, ws_ref, o_ref):
    """One N-block per program: (B, K) x (K, BN) int8 dot. The activation
    quant is recomputed per program — B*K VPU work, noise next to the
    K*BN-byte weight DMA this kernel exists to overlap."""
    x = x_ref[...].astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                     1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o_ref[...] = (acc.astype(jnp.float32) * xs
                  * ws_ref[...]).astype(o_ref.dtype)


def w8_stream_matmul(x, qw: QuantizedWeight, block_n: int = 1408):
    b, k = x.shape
    n = qw.values.shape[1]
    bn = min(block_n, n)
    assert n % bn == 0, (n, bn)
    return pl.pallas_call(
        _w8_stream_kernel,
        grid=(n // bn,),
        in_specs=[pl.BlockSpec((b, k), lambda i: (0, 0)),
                  pl.BlockSpec((k, bn), lambda i: (0, i)),
                  pl.BlockSpec((1, bn), lambda i: (0, i))],
        out_specs=pl.BlockSpec((b, bn), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, n), x.dtype),
    )(x, qw.values, qw.scales)


def _w4_stream_kernel(x_ref, w_ref, ws_ref, o_ref):
    """Half-packed w4a8: weight block is (K/2, BN) bytes; low nibbles are
    rows [0, K/2), high nibbles rows [K/2, K) — contiguous activation
    halves dot each plane (Mosaic can't lower strided slices)."""
    x = x_ref[...].astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                     1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    k_half = w_ref.shape[0]
    lo, hi = _unpack_nibbles(w_ref[...])
    acc = (jax.lax.dot_general(xq[:, :k_half], lo, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
           + jax.lax.dot_general(xq[:, k_half:], hi,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32))
    o_ref[...] = (acc.astype(jnp.float32) * xs
                  * ws_ref[...]).astype(o_ref.dtype)


def w4_stream_matmul(x, packed, scales, block_n: int = 1408):
    b, k = x.shape
    n = packed.shape[1]
    bn = min(block_n, n)
    assert n % bn == 0, (n, bn)
    return pl.pallas_call(
        _w4_stream_kernel,
        grid=(n // bn,),
        in_specs=[pl.BlockSpec((b, k), lambda i: (0, 0)),
                  pl.BlockSpec((k // 2, bn), lambda i: (0, i)),
                  pl.BlockSpec((1, bn), lambda i: (0, i))],
        out_specs=pl.BlockSpec((b, bn), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, n), x.dtype),
    )(x, packed, scales)


# ---------------------------------------------------------------- harness
def run_shape(tag, b, k, n, block_n, block_n4=None):
    # the w4 kernel holds packed + both unpacked nibble planes in VMEM —
    # its block must be smaller to stay under the 16M scoped limit (and a
    # multiple of 128 that divides n)
    if block_n4 is None:
        block_n4 = next(bn for bn in range(block_n // 2 // 128 * 128, 0, -128)
                        if n % bn == 0)
    print(f"\n== {tag}: ({b}, {k}) x ({k}, {n}), block_n={block_n} "
          f"(w4: {block_n4}) ==")
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, k).astype(np.float32))
    w = jnp.asarray((rs.randn(k, n) * 0.02).astype(np.float32))
    wb = w.astype(jnp.bfloat16)
    q8 = quantize_weight(w)
    q4, s4 = quantize_weight_int4(w)
    p4 = pack_nibbles(q4)

    # x carries through the chain; slice the output back to (b, k)
    def back(y):
        return y[:, :k] if y.shape[1] >= k else jnp.pad(
            y, ((0, 0), (0, k - y.shape[1])))

    def bf16(xc):
        return back((xc.astype(jnp.bfloat16) @ wb).astype(jnp.float32))

    def int8_whole(xc):
        return back(quant_matmul(xc, q8))

    def int8_stream(xc):
        return back(w8_stream_matmul(xc, q8, block_n))

    def w4a8_stream(xc):
        return back(w4_stream_matmul(xc, p4, s4, block_n4))

    # correctness vs dequantized references before timing
    ref8 = x @ (q8.values.astype(jnp.float32) * q8.scales)
    got8 = w8_stream_matmul(x, q8, block_n)
    err8 = float(jnp.max(jnp.abs(got8 - ref8))
                 / jnp.maximum(jnp.max(jnp.abs(ref8)), 1e-8))
    ref4 = x @ (q4.astype(jnp.float32) * s4)
    got4 = w4_stream_matmul(x, p4, s4, block_n4)
    err4 = float(jnp.max(jnp.abs(got4 - ref4))
                 / jnp.maximum(jnp.max(jnp.abs(ref4)), 1e-8))
    print(f"   int8_stream rel-err {err8:.2e} | w4 unpack rel-err "
          f"{err4:.2e} (vs own dequant refs)")

    # production-path variants (kernels/quant_matmul.quant4_matmul):
    # per-channel and per-group-128 scales. The grouped kernel splits each
    # plane dot into G-deep slab dots + fp32 scale-accumulate — this
    # measures what that costs on top of the same 22 MB weight stream.
    from setok_tpu.kernels.quant_matmul import (
        quant4_matmul, quantize_weight_int4 as q4_prod)
    q4c = q4_prod(w)
    q4g = q4_prod(w, group_size=128)

    def w4a8_prod(xc):
        return back(quant4_matmul(xc, q4c, block_n=block_n4))

    def w4a8_g128(xc):
        return back(quant4_matmul(xc, q4g, block_n=block_n4))

    variants = {"bf16": bf16, "int8_whole": int8_whole,
                "int8_stream": int8_stream, "w4a8_stream": w4a8_stream,
                "w4a8_prod": w4a8_prod, "w4a8_g128": w4a8_g128}
    for name in list(variants):
        try:  # int8_whole's one-block weight (~44 MB) may not fit VMEM
            jax.block_until_ready(variants[name](x))
        except Exception as e:  # noqa: BLE001
            print(f"   {name}: DROPPED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:90]})")
            del variants[name]
    ms = device_time_ab(variants, (x,), iters=24)
    mb = {"bf16": k * n * 2, "int8_whole": k * n, "int8_stream": k * n,
          "w4a8_stream": k * n // 2, "w4a8_prod": k * n // 2,
          "w4a8_g128": k * n // 2}
    for name, t in ms.items():
        bw = mb[name] / 1e9 / (t / 1e3)
        print(f"   {name:12s} {t:7.3f} ms/call   "
              f"({mb[name]/2**20:6.1f} MB weights -> {bw:5.0f} GB/s eff)")
    return ms


def main():
    assert jax.devices()[0].platform == "tpu", "run on the TPU"
    # 11008 has no nice 128-multiple divisor chain (128*86); pad to
    # 128*88=11264 as the serving trunk would (and the down-proj input
    # pads the same way) -> 8 blocks of 1408
    up = run_shape("up-proj", 8, 4096, 11264, 1408)
    down = run_shape("down-proj", 8, 11264, 4096, 512)
    print("\nweight-quality note: int4 per-channel max-rel output error is "
          "~7e-2 (vs ~1e-2 int8) — see PERF.md int4 section; serving at "
          "bits=4 would need that accepted or GPTQ-style calibration.")
    return up, down


if __name__ == "__main__":
    main()
