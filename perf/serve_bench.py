"""Serving-engine throughput micro-bench (VERDICT r3 item 8).

Measures steady-state decode throughput (tokens/s) of the continuous-
batching engine at 1 / 4 / 8 active slots, plus the admission-overlap
case (requests arriving mid-stream while others decode). Appends a
history line per config to perf/history.jsonl.

Run ON THE TPU (tiny model — the number characterizes the ENGINE loop +
dispatch path, not model FLOPs):
    python perf/serve_bench.py [--cpu]
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--max-new", type=int, default=120)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from setok_tpu import config as cfgs
    from setok_tpu.constants import IMAGE_TOKEN_INDEX
    from setok_tpu.models.setokim import Setokim
    from setok_tpu.serve import ServeEngine

    cfg = cfgs.tiny_setokim()
    model = Setokim(cfg, target_token_id=3)
    L = 24
    rs = np.random.RandomState(0)

    def prompt(seed):
        r = np.random.RandomState(seed)
        ids = np.zeros((L,), np.int64)
        ids[0] = 1
        ids[1:1 + cfg.tokenizer.k_max] = IMAGE_TOKEN_INDEX
        ids[9:15] = r.randint(10, 400, size=6)
        return ids, r.rand(32, 32, 3).astype(np.float32) * 2 - 1

    ids0, img0 = prompt(0)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids0)[None],
                        jnp.asarray(img0)[None],
                        jnp.zeros((1, L), jnp.int32),
                        jnp.asarray(img0)[None], jax.random.PRNGKey(1),
                        method=model.init_all)
    print("devices:", jax.devices())

    git = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True,
                         cwd="/root/repo").stdout.strip()
    hist = open("/root/repo/perf/history.jsonl", "a")

    def record(name, tps, slots, block=1):
        line = {"metric": name, "value": round(tps, 1),
                "unit": "tokens/sec", "slots": slots,
                "decode_block": block, "git": git, "time": time.time()}
        print(json.dumps(line))
        hist.write(json.dumps(line) + "\n")

    # slots amortize dispatch latency across requests; decode_block
    # amortizes it across time (K decode steps per host round trip)
    for slots, block in ((1, 1), (4, 1), (8, 1),
                         (1, 8), (4, 4), (4, 8), (4, 16), (8, 8)):
        eng = ServeEngine(model, params, max_batch=slots, prompt_len=L,
                          max_len=L + args.max_new + 4, eos_id=-1,
                          pad_id=0, decode_block=block)
        reqs = [eng.submit(*prompt(s), max_new_tokens=args.max_new)
                for s in range(slots)]
        # warm: admit + a few steps (compiles prefill/insert/step)
        for _ in range(3):
            eng.step()
        n0 = sum(len(r.tokens) for r in reqs)
        t0 = time.time()
        while any(not r.done for r in reqs):
            eng.step()
        dt = time.time() - t0
        n1 = sum(len(r.tokens) for r in reqs)
        record("serve_decode_tokens_per_sec", (n1 - n0) / dt, slots, block)

    # trace-measured DEVICE ms/step (VERDICT r3 weak #3: wall tok/s
    # conflates the engine with ~30 ms of tunnel dispatch — the device
    # number is what the engine costs on real serving hosts). Matches the
    # engine's jitted step by name in the profiler trace.
    if not args.cpu:
        import shutil

        from perf.trace_ab import _trace_device_ms
        for slots, block, match in ((4, 1, "_step_impl"),
                                    (4, 8, "_step_multi_impl")):
            eng = ServeEngine(model, params, max_batch=slots, prompt_len=L,
                              max_len=L + args.max_new + 4, eos_id=-1,
                              pad_id=0, decode_block=block)
            reqs = [eng.submit(*prompt(s), max_new_tokens=args.max_new)
                    for s in range(slots)]
            for _ in range(4):
                eng.step()          # compile everything first
            trace_dir = "/tmp/trace_serve_bench"
            shutil.rmtree(trace_dir, ignore_errors=True)
            done0 = sum(len(r.tokens) for r in reqs)
            with jax.profiler.trace(trace_dir):
                while any(not r.done for r in reqs):
                    eng.step()
            n_tok = sum(len(r.tokens) for r in reqs) - done0
            dev_ms = _trace_device_ms(trace_dir, [match], prefix="")[match]
            # one engine step serves every active slot; per-token device
            # cost is the step cost amortized over slots
            line = {"metric": "serve_decode_device_ms",
                    "value": round(dev_ms / max(n_tok // slots, 1), 3),
                    "per_token": round(dev_ms / max(n_tok, 1), 3),
                    "unit": "ms/step", "slots": slots,
                    "decode_block": block, "git": git,
                    "time": time.time()}
            print(json.dumps(line))
            hist.write(json.dumps(line) + "\n")

    # speculative decoding, both bounds. Natural prompt-lookup drafts on a
    # RANDOM tiny model accept ~never → measures pure verify overhead
    # (worst case); oracle drafts (the known greedy continuation) accept
    # fully → the (1+D)x dispatch-amortization ceiling. Real text sits in
    # between, pushed toward the ceiling by repetitive VQA/edit replies.
    import setok_tpu.serve.speculative as spec_mod

    streams = {}
    eng = ServeEngine(model, params, max_batch=4, prompt_len=L,
                      max_len=L + args.max_new + 8, eos_id=-1, pad_id=0)
    base_reqs = [eng.submit(*prompt(s), max_new_tokens=args.max_new)
                 for s in range(4)]
    eng.run()
    for s, r in enumerate(base_reqs):
        streams[s] = list(r.tokens)

    real_draft = spec_mod.draft_prompt_lookup

    def oracle_draft(context, num_draft, max_ngram=3, pad_id=0):
        ctx = list(context)
        for full in streams.values():
            n = next((n for n in range(min(len(full), len(ctx)), -1, -1)
                      if ctx[len(ctx) - n:] == full[:n]), 0)
            if n > 0:
                out = np.full((num_draft,), pad_id, np.int64)
                nxt = full[n:n + num_draft]
                out[:len(nxt)] = nxt
                return out
        return np.full((num_draft,), pad_id, np.int64)

    for d, drafter, tag in ((3, real_draft, "natural"),
                            (7, real_draft, "natural"),
                            (3, oracle_draft, "oracle"),
                            (7, oracle_draft, "oracle")):
        spec_mod.draft_prompt_lookup = drafter
        eng = ServeEngine(model, params, max_batch=4, prompt_len=L,
                          max_len=L + args.max_new + d + 4, eos_id=-1,
                          pad_id=0, spec_len=d)
        reqs = [eng.submit(*prompt(s), max_new_tokens=args.max_new)
                for s in range(4)]
        for _ in range(3):
            eng.step()
        n0 = sum(len(r.tokens) for r in reqs)
        t0 = time.time()
        while any(not r.done for r in reqs):
            eng.step()
        dt = time.time() - t0
        n1 = sum(len(r.tokens) for r in reqs)
        record(f"serve_decode_tokens_per_sec_spec_{tag}", (n1 - n0) / dt,
               4, block=d)
    spec_mod.draft_prompt_lookup = real_draft

    # admission overlap: 8 requests through 4 slots, arrivals mid-stream —
    # throughput should stay near the 4-slot steady state (prefill rides
    # the worker thread, decode never stalls on it)
    eng = ServeEngine(model, params, max_batch=4, prompt_len=L,
                      max_len=L + args.max_new + 4, eos_id=-1, pad_id=0)
    first = [eng.submit(*prompt(s), max_new_tokens=args.max_new)
             for s in range(4)]
    for _ in range(3):
        eng.step()
    late = []
    n0 = sum(len(r.tokens) for r in first)
    t0 = time.time()
    steps = 0
    all_reqs = list(first)
    while any(not r.done for r in all_reqs) or late is not None:
        if steps == 10 and late is not None and len(late) == 0:
            late = [eng.submit(*prompt(100 + s),
                               max_new_tokens=args.max_new // 2)
                    for s in range(4)]
            all_reqs += late
        eng.step()
        steps += 1
        if all(r.done for r in all_reqs):
            break
    dt = time.time() - t0
    n1 = sum(len(r.tokens) for r in all_reqs)
    record("serve_decode_tokens_per_sec_with_midstream_admits",
           (n1 - n0) / dt, 4)
    hist.close()


if __name__ == "__main__":
    main()
