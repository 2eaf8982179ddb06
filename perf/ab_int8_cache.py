"""int8 KV cache A/B: decode-step device time at cache-read-bound shapes.

The int8 trunk (bits=8) shrank decode WEIGHT traffic; at long context the
other HBM stream takes over — every decode step re-reads the whole KV
cache (layers · B · S · kv_heads · head_dim · 2 tensors). At the shapes
below the bf16 cache read is ~1.07 GB/step vs ~103 MB of int8 weights, so
cache bytes set the step time and cache_dtype=int8 (per-token scales,
models/llama.py KVCache) should approach a 2x cut of the dominant term.

Shapes: 8-layer h=1024 trunk (weights int8), B=8 slots, cache S=4096
prefilled to ~4000 tokens — decode reads ~98% of the cache every step.

  bf16_cache : 1.07 GB cache read / step
  int8_cache : 0.54 GB + 17 MB scales / step

Run ON THE TPU: python perf/ab_int8_cache.py [--iters 24]
Wall clocks jitter through the tunnel; device time from the profiler
trace is the number (perf/trace_ab.py).
"""

import argparse
import json
import shutil
import subprocess
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from perf.trace_ab import _trace_device_ms                  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from setok_tpu import config as cfgs
    from setok_tpu.models.llama import (LlamaModel, init_cache,
                                        quantize_trunk_weights)

    cfg = cfgs.LlamaConfig(vocab_size=8192, hidden_size=1024,
                           intermediate_size=2816, num_layers=args.layers,
                           num_heads=8, num_kv_heads=8, head_dim=128,
                           max_seq_len=args.seq)
    B, S = args.batch, args.seq
    fill = S - args.iters - 8
    cache_gb = (args.layers * B * S * cfg.num_kv_heads * cfg.head_dim
                * 2 * 2) / 2**30
    print(f"cache read/step: bf16 {cache_gb:.2f} GB, "
          f"int8 {cache_gb/2:.2f} GB (+scales)", flush=True)

    model = LlamaModel(cfg, dtype=jnp.bfloat16, weight_bits=8)
    ids0 = np.ones((B, 16), np.int64)
    params = quantize_trunk_weights(
        LlamaModel(cfg, dtype=jnp.bfloat16).init(
            jax.random.PRNGKey(0), jnp.asarray(ids0)), bits=8)

    # prefill once per variant: write `fill` tokens of junk K/V so decode
    # reads a nearly full cache
    chains = {}
    for name, cdt in (("bf16_cache", jnp.bfloat16), ("int8_cache", jnp.int8)):
        cache = init_cache(cfg, B, S, dtype=cdt)
        chunk = 512
        emb = jax.jit(lambda p, i, c: model.apply(p, i, cache=c)[1],
                      donate_argnums=(2,))
        ids = jnp.asarray(np.random.RandomState(0)
                          .randint(1, 8000, size=(B, chunk)))
        for _ in range(fill // chunk):
            cache = emb(params, ids, cache)
        print(f"{name}: prefilled to {int(cache.length)}", flush=True)

        def step(tok, c, _model=model, _p=params):
            x, nc = _model.apply(_p, tok, cache=c)
            return jnp.argmax(x[:, -1:], -1).astype(tok.dtype), nc

        def chained(tok, c, _step=step):
            def body(carry, _):
                t, cc = carry
                return _step(t, cc), ()
            (t, cc), _ = jax.lax.scan(body, (tok, c), None,
                                      length=args.iters)
            return t, cc.length
        chained.__name__ = f"chain_{name}"
        jitted = jax.jit(chained)
        tok0 = jnp.ones((B, 1), jnp.int32)
        jax.block_until_ready(jitted(tok0, cache))          # compile+warm
        chains[name] = (jitted, tok0, cache)

    trace_dir = "/tmp/trace_ab_cache"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for name, (fn, tok0, cache) in chains.items():
            jax.block_until_ready(fn(tok0, cache))
    per = _trace_device_ms(trace_dir, list(chains))
    git = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True,
                         cwd="/root/repo").stdout.strip()
    hist = (open("/root/repo/perf/history.jsonl", "a")
            if not args.cpu else open("/dev/null", "w"))
    for name, ms in per.items():
        line = {"metric": "decode_step_device_ms_long_context",
                "value": round(ms / args.iters, 3), "unit": "ms/step",
                "variant": name, "batch": B, "seq": S,
                "layers": args.layers, "git": git, "time": time.time()}
        print(json.dumps(line), flush=True)
        hist.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
