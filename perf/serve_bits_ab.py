"""Engine-level bits=4 vs bits=8 decode A/B (VERDICT r3 next #4).

The w4a8 per-linear win is proven (+33-38% on weight-streaming decode
shapes, PERF.md "int4 for the weight-STREAMING decode regime"); this
measures whether it survives the full serving engine: an 8-layer h=1024
trunk (the ab_int8_cache shape — decode is weight-bound at short context,
cache-bound at long) served at 4 slots, wall tok/s + trace device ms/step
per weight precision, with a greedy-token-match quality guard against the
bf16 stream.

Run ON THE TPU: python perf/serve_bits_ab.py [--iters N]
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
    ap.add_argument("--max-new", type=int, default=96)
    ap.add_argument("--decode-block", type=int, default=8,
                    help="on-device steps per host dispatch — at block=1 "
                         "the ~200 ms tunnel dispatch swamps the ~ms device "
                         "step and the bits deltas are invisible in wall "
                         "tok/s (r4 first run)")
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from setok_tpu import config as cfgs
    from setok_tpu.models.llama import quantize_trunk_weights
    from setok_tpu.models.setokim import Setokim
    from setok_tpu.serve import ServeEngine

    h = args.hidden
    llama = cfgs.LlamaConfig(vocab_size=8192, hidden_size=h,
                             intermediate_size=int(2.75 * h),
                             num_layers=args.layers, num_heads=h // 128,
                             num_kv_heads=h // 128, head_dim=128,
                             max_seq_len=args.seq)
    tok = cfgs.tiny_tokenizer()
    det = cfgs.tiny_detokenizer()
    diff = cfgs.DiffLossConfig(target_channels=tok.token_feat_dim,
                               z_channels=det.token_feat_dim, width=32,
                               depth=1, num_sampling_steps="4",
                               diffusion_batch_mul=2)
    cfg = cfgs.SetokimConfig(llama=llama, tokenizer=tok, detokenizer=det,
                             diffloss=diff, target_num=tok.k_max)
    L = 32

    def prompt(seed):
        r = np.random.RandomState(seed)
        ids = np.zeros((L,), np.int64)
        ids[0] = 1
        ids[1:20] = r.randint(10, 8000, size=19)
        return ids

    base_params = Setokim(cfg, target_token_id=3).init(
        jax.random.PRNGKey(0), jnp.asarray(prompt(0))[None],
        method=lambda m, i: m.llama(i))
    print("init done; devices:", jax.devices(), flush=True)

    git = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True,
                         cwd="/root/repo").stdout.strip()
    hist = (open("/root/repo/perf/history.jsonl", "a")
            if not args.cpu else open("/dev/null", "w"))

    streams = {}
    for bits in (16, 8, 4):
        model = Setokim(cfg, target_token_id=3,
                        weight_bits=bits if bits != 16 else 16)
        params = (base_params if bits == 16
                  else quantize_trunk_weights(base_params, bits=bits))
        eng = ServeEngine(model, params, max_batch=args.slots, prompt_len=L,
                          max_len=L + args.max_new + 4, eos_id=-1, pad_id=0,
                          decode_block=args.decode_block)
        reqs = [eng.submit(prompt(s), max_new_tokens=args.max_new)
                for s in range(args.slots)]
        # warm/compile without consuming the whole generation budget (a
        # block dispatch emits decode_block tokens per slot)
        warm = max(1, min(4, (args.max_new // 2) // args.decode_block))
        for _ in range(warm):
            eng.step()
        n0 = sum(len(r.tokens) for r in reqs)
        trace_dir = "/tmp/trace_serve_bits"
        shutil.rmtree(trace_dir, ignore_errors=True)
        t0 = time.time()
        with jax.profiler.trace(trace_dir):
            while any(not r.done for r in reqs):
                eng.step()
        dt = time.time() - t0
        n1 = sum(len(r.tokens) for r in reqs)
        tps = (n1 - n0) / dt
        dev_ms = 0.0
        trace_name = ("_step_multi_impl" if args.decode_block > 1
                      else "_step_impl")
        if not args.cpu:
            dev_ms = _trace_device_ms(trace_dir, [trace_name],
                                      prefix="")[trace_name]
        # a block dispatch runs decode_block device steps; normalize to
        # per-single-step so bits variants compare on device time
        steps = max((n1 - n0) // args.slots, 1)
        streams[bits] = [list(r.tokens) for r in reqs]
        match = ""
        if 16 in streams and bits != 16:
            same = sum(a == b for s16, sb in zip(streams[16], streams[bits])
                       for a, b in zip(s16, sb))
            total = sum(len(s) for s in streams[16])
            match = round(same / max(total, 1), 4)
        line = {"metric": "serve_decode_bits_ab", "bits": bits,
                "value": round(tps, 1), "unit": "tokens/sec",
                "device_ms_per_step": round(dev_ms / steps, 3),
                "slots": args.slots, "layers": args.layers,
                "hidden": h, "greedy_match_vs_bf16": match,
                "git": git, "time": time.time()}
        print(json.dumps(line), flush=True)
        hist.write(json.dumps(line) + "\n")
    hist.close()


if __name__ == "__main__":
    main()
