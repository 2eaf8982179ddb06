"""Decode attention cache-READ microbench: bf16 vs int8 vs packed int4.

One layer's decode attention at serving shapes — q (B, H, dh) against a
prefilled (B, S, H, dh) K/V cache — isolated from the trunk so the cache
format is the only variable. The product ships bf16 and int8 caches
(models/llama.py KVCache); the int4 variant here is a measurement probe:
if unpacking nibbles hides under the cache DMA the way it does for
weights (perf/ab_int4_decode.py, w4a8 +33-38%/linear), an int4 cache is
worth product work; if the (B,S,H,dh) unpack is VPU-bound like the int8
score-dot negative result, it is not.

Per-variant bytes read/step at defaults (B=8, S=4096, H=8, dh=128):
  bf16 : 64 MB    int8 : 32 MB + 1 MB scales    int4 : 16 MB + 1 MB

Run ON THE TPU: python perf/ab_cache_read.py
"""

import argparse
import json
import subprocess
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from perf.trace_ab import device_time_ab                    # noqa: E402


def attn(q, k, v):
    """q (B,H,dh) f32/bf16, k/v (B,S,H,dh) same dtype → (B,H,dh)."""
    s = jnp.einsum("bhd,bshd->bhs", q, k) / np.sqrt(q.shape[-1])
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhs,bshd->bhd", p, v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dh", type=int, default=128)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    B, S, H, D = args.batch, args.seq, args.heads, args.dh
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, H, D), jnp.bfloat16)
    kf = rs.randn(B, S, H, D).astype(np.float32)
    vf = rs.randn(B, S, H, D).astype(np.float32)

    # per-token-per-head symmetric scales (the product's int8 layout)
    ks8 = np.maximum(np.abs(kf).max(-1), 1e-8) / 127.0
    vs8 = np.maximum(np.abs(vf).max(-1), 1e-8) / 127.0
    k8 = np.clip(np.round(kf / ks8[..., None]), -127, 127).astype(np.int8)
    v8 = np.clip(np.round(vf / vs8[..., None]), -127, 127).astype(np.int8)

    ks4 = np.maximum(np.abs(kf).max(-1), 1e-8) / 7.0
    vs4 = np.maximum(np.abs(vf).max(-1), 1e-8) / 7.0
    k4 = np.clip(np.round(kf / ks4[..., None]), -7, 7).astype(np.int8)
    v4 = np.clip(np.round(vf / vs4[..., None]), -7, 7).astype(np.int8)

    # grouped int4: G scales per head-dim (finer than per-token-per-head)
    G = 32
    kg = kf.reshape(B, S, H, D // G, G)
    vg = vf.reshape(B, S, H, D // G, G)
    ks4g = np.maximum(np.abs(kg).max(-1), 1e-8) / 7.0
    vs4g = np.maximum(np.abs(vg).max(-1), 1e-8) / 7.0
    k4g = np.clip(np.round(kg / ks4g[..., None]), -7, 7).astype(np.int8)
    v4g = np.clip(np.round(vg / vs4g[..., None]), -7, 7).astype(np.int8)

    def pack(x):                       # (..., D) int4-valued → (..., D//2)
        lo, hi = x[..., 0::2], x[..., 1::2]
        return ((hi.astype(np.int32) << 4)
                | (lo.astype(np.int32) & 0xF)).astype(np.int8)

    def unpack(p):                     # (..., D//2) int8 → (..., D) int8
        lo = jnp.left_shift(p, 4)
        lo = jnp.right_shift(lo, 4)                 # sign-extend low nibble
        hi = jnp.right_shift(p, 4)                  # arithmetic on int8
        return jnp.stack([lo, hi], axis=-1).reshape(*p.shape[:-1],
                                                    p.shape[-1] * 2)

    kb, vb = jnp.asarray(kf, jnp.bfloat16), jnp.asarray(vf, jnp.bfloat16)
    k8j, v8j = jnp.asarray(k8), jnp.asarray(v8)
    ks8j, vs8j = jnp.asarray(ks8), jnp.asarray(vs8)
    k4j, v4j = jnp.asarray(pack(k4)), jnp.asarray(pack(v4))
    ks4j, vs4j = jnp.asarray(ks4), jnp.asarray(vs4)
    k4gj = jnp.asarray(pack(k4g.reshape(B, S, H, D)))
    v4gj = jnp.asarray(pack(v4g.reshape(B, S, H, D)))
    ks4gj, vs4gj = jnp.asarray(ks4g), jnp.asarray(vs4g)

    def f_bf16(q):
        return attn(q, kb, vb)

    def f_int8(q):
        k = k8j.astype(jnp.bfloat16) * ks8j[..., None].astype(jnp.bfloat16)
        v = v8j.astype(jnp.bfloat16) * vs8j[..., None].astype(jnp.bfloat16)
        return attn(q, k, v)

    def f_int4(q):
        k = (unpack(k4j).astype(jnp.bfloat16)
             * ks4j[..., None].astype(jnp.bfloat16))
        v = (unpack(v4j).astype(jnp.bfloat16)
             * vs4j[..., None].astype(jnp.bfloat16))
        return attn(q, k, v)

    def f_int4g(q):
        k = (unpack(k4gj).reshape(B, S, H, D // G, G).astype(jnp.bfloat16)
             * ks4gj[..., None].astype(jnp.bfloat16)).reshape(B, S, H, D)
        v = (unpack(v4gj).reshape(B, S, H, D // G, G).astype(jnp.bfloat16)
             * vs4gj[..., None].astype(jnp.bfloat16)).reshape(B, S, H, D)
        return attn(q, k, v)

    ms = device_time_ab({"bf16": f_bf16, "int8": f_int8, "int4": f_int4,
                         "int4_g32": f_int4g}, (q,), iters=args.iters)
    git = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True,
                         cwd="/root/repo").stdout.strip()
    hist = (open("/root/repo/perf/history.jsonl", "a")
            if not args.cpu else open("/dev/null", "w"))
    for name, v in ms.items():
        line = {"metric": "cache_read_attention_device_ms",
                "value": round(v, 4), "unit": "ms/layer-step",
                "variant": name, "batch": B, "seq": S, "heads": H,
                "git": git, "time": time.time()}
        print(json.dumps(line), flush=True)
        hist.write(json.dumps(line) + "\n")

    # numeric cost of each format on the attention output
    o = np.asarray(f_bf16(q), np.float32)
    for name, f in (("int8", f_int8), ("int4", f_int4),
                    ("int4_g32", f_int4g)):
        d = np.abs(np.asarray(f(q), np.float32) - o).max()
        print(f"{name} max-abs output delta vs bf16: {d:.4f} "
              f"(out scale {np.abs(o).max():.2f})", flush=True)


if __name__ == "__main__":
    main()
