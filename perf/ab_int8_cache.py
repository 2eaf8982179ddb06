"""int8 KV cache A/B: decode-step device time at cache-read-bound shapes.

The int8 trunk (bits=8) shrank decode WEIGHT traffic; at long context the
other HBM stream takes over — every decode step re-reads the whole KV
cache (layers · B · S · kv_heads · head_dim · 2 tensors). At the default
shapes below the bf16 cache read is ~1.0 GB/step vs ~103 MB of int8
weights, so cache bytes set the step time and cache_dtype=int8
(per-token scales, models/llama.py KVCache) should approach a 2x cut of
the dominant term.

Defaults: 8-layer h=1024 trunk (weights int8), B=8 slots, cache S=4096
prefilled to ~3968 tokens — decode reads ~97% of the cache every step.

Run ON THE TPU: python perf/ab_int8_cache.py [--iters 24]
Wall clocks jitter through the tunnel; device time from the profiler
trace is the number (perf/trace_ab.py).
"""

import argparse
import json
import os
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
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from setok_tpu import config as cfgs
    from setok_tpu.models.llama import quantize_trunk_weights
    from setok_tpu.models.setokim import Setokim

    h = args.hidden
    llama = cfgs.LlamaConfig(vocab_size=8192, hidden_size=h,
                             intermediate_size=int(2.75 * h),
                             num_layers=args.layers,
                             num_heads=h // 128, num_kv_heads=h // 128,
                             head_dim=128, max_seq_len=args.seq)
    tok = cfgs.tiny_tokenizer()
    det = cfgs.tiny_detokenizer()
    diff = cfgs.DiffLossConfig(target_channels=tok.token_feat_dim,
                               z_channels=det.token_feat_dim, width=32,
                               depth=1, num_sampling_steps="4",
                               diffusion_batch_mul=2)
    cfg = cfgs.SetokimConfig(llama=llama, tokenizer=tok, detokenizer=det,
                             diffloss=diff, target_num=tok.k_max)
    B, S = args.batch, args.seq
    fill = max(32, S - args.iters - 64)
    cache_gb = (args.layers * B * S * llama.num_kv_heads * llama.head_dim
                * 2 * 2) / 2**30
    print(f"cache read/step: bf16 {cache_gb:.2f} GB, "
          f"int8 {cache_gb/2:.2f} GB (+scales)", flush=True)

    ids0 = np.ones((B, 16), np.int64)
    params = quantize_trunk_weights(
        Setokim(cfg, target_token_id=3).init(
            jax.random.PRNGKey(0), jnp.asarray(ids0),
            method=lambda m, i: m.llama(i)), bits=8)
    print("init done", flush=True)

    ids = jnp.asarray(np.random.RandomState(0)
                      .randint(1, 8000, size=(B, fill)))

    chains = {}
    # int8_xla = the shipping default (cache_kernel=False): int8 cache
    # dequantized by XLA, fused into the attention dots. int8_kernel =
    # the opt-in Pallas in-kernel dequant — measured 1.8x slower (PERF.md
    # "int8 KV cache"), kept here so regressions/fixes stay visible.
    for name, cdt, use_kernel in (("bf16_cache", jnp.bfloat16, False),
                                  ("int8_kernel", jnp.int8, True),
                                  ("int8_xla", jnp.int8, False)):
        model = Setokim(cfg, target_token_id=3, weight_bits=8,
                        cache_kernel=use_kernel)
        logits, _, cache, valid, pos = jax.jit(
            lambda p, i, _dt=cdt: model.apply(
                p, i, S, cache_dtype=_dt, method=model.prefill_text)
        )(params, ids)
        next_pos = jnp.sum(valid.astype(jnp.int32), axis=1)
        print(f"{name}: prefilled to {int(cache.length)}", flush=True)

        def chained(tok0, c, cv, npos, _p=params):
            def body(carry, _):
                t, cc, v, np_ = carry
                lg, _, cc, v = model.apply(_p, t, cc, v, np_,
                                           method=model.decode_step)
                t = jnp.argmax(lg, -1).astype(t.dtype)[:, None]
                return (t, cc, v, np_ + 1), ()
            (t, cc, v, np_), _ = jax.lax.scan(
                body, (tok0, c, cv, npos), None, length=args.iters)
            return t, cc.length
        chained.__name__ = f"chain_{name}"
        jitted = jax.jit(chained)
        tok0 = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        jax.block_until_ready(jitted(tok0, cache, valid, next_pos))
        chains[name] = (jitted, (tok0, cache, valid, next_pos))

    # one trace PER variant: the hosted tunnel erases jit names from the
    # trace (`jit__unknown(...)`), so per-name attribution in a shared
    # trace is impossible there — a single-variant window lets the helper
    # fall back to total jit_* module time (trace_ab.py)
    trace_dir = "/tmp/trace_ab_cache"
    shutil.rmtree(trace_dir, ignore_errors=True)
    per = {}
    for name, (fn, a) in chains.items():
        vdir = os.path.join(trace_dir, name)
        with jax.profiler.trace(vdir):
            out = fn(*a)
            # host readback, not block_until_ready: on the hosted tunnel
            # block_until_ready returns at dispatch-enqueue (train_bench.py
            # measured 138% MFU from exactly this), which would close the
            # trace window before the device finishes
            int(jax.device_get(out[0][0, 0]))
        per[name] = _trace_device_ms(vdir, [name])[name]
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
