"""Engine-level weight-precision A/B at trunk scale (bits = 16 / 8 / 4).

The tiny-model serve_bench characterizes the engine loop; this one puts a
~1.1B-param LLaMA trunk behind the engine so the decode step is genuinely
weight-streaming-bound and the at-rest precision shows up in tokens/s —
the end-to-end confirmation of the per-linear A/B (perf/ab_int4_decode.py:
w4a8 33-38% faster than int8). Text-only prompts ride the engine's
text-only prefill fast path (no vision tower, so the trunk is the whole
story). Vocab is cut to 8k to keep init time sane; embedding/lm_head stay
float in every variant so only trunk-linear precision differs.

Run ON THE TPU: python perf/serve_trunk_bench.py [--slots 8]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--max-new", type=int, default=48)
    ap.add_argument("--layers", type=int, default=16)
    # spec_len for the oracle-draft speculative variant (0 = skip). At
    # trunk scale every accepted draft saves a full weight-stream pass,
    # so accepted-draft throughput approaches (1+D)x — the oracle drafter
    # (replay of the same bits-variant's own greedy streams) measures
    # that upper envelope; accept rate on real text is workload-dependent
    # (prompt-lookup finds drafts in extractive/repetitive contexts).
    ap.add_argument("--spec", type=int, default=0)
    ap.add_argument("--kv-bits", type=int, default=16, choices=[16, 8],
                    help="8 = int8 KV cache (models/llama.py KVCache)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_dtype = jnp.int8 if args.kv_bits == 8 else jnp.bfloat16

    from setok_tpu import config as cfgs
    from setok_tpu.models.llama import quantize_trunk_weights
    from setok_tpu.models.setokim import Setokim
    from setok_tpu.serve import ServeEngine

    llama = cfgs.LlamaConfig(vocab_size=8192, hidden_size=2048,
                             intermediate_size=5632, num_layers=args.layers,
                             num_heads=16, num_kv_heads=16, head_dim=128,
                             max_seq_len=512)
    tok = cfgs.tiny_tokenizer()
    det = cfgs.tiny_detokenizer()
    diff = cfgs.DiffLossConfig(target_channels=tok.token_feat_dim,
                               z_channels=det.token_feat_dim, width=32,
                               depth=1, num_sampling_steps="4",
                               diffusion_batch_mul=2)
    cfg = cfgs.SetokimConfig(llama=llama, tokenizer=tok, detokenizer=det,
                             diffloss=diff, target_num=tok.k_max)
    nparams = (llama.vocab_size * llama.hidden_size * 2
               + args.layers * (4 * llama.hidden_size ** 2
                                + 3 * llama.hidden_size
                                * llama.intermediate_size))
    print(f"trunk ~{nparams/1e9:.2f}B params "
          f"({nparams*4/2**30:.1f} GiB fp32)", flush=True)

    model = Setokim(cfg, target_token_id=3)
    L = 32
    ids0 = np.zeros((1, L), np.int64)
    ids0[0, :6] = [1, 17, 23, 99, 5, 8]
    # init the trunk only (text path) — the vision/diffusion modules are
    # irrelevant here and init_all at this scale is slow
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids0),
                        method=lambda m, i: m.llama(i))
    print("init done", flush=True)

    def prompts(n):
        out = []
        for s in range(n):
            r = np.random.RandomState(s)
            ids = np.zeros((L,), np.int64)
            ids[0] = 1
            ids[1:12] = r.randint(10, 8000, size=11)
            out.append(ids)
        return out

    git = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True,
                         cwd="/root/repo").stdout.strip()
    # CPU runs are for smoke-testing the harness only — keep them out of
    # the device-time history
    hist = (open("/root/repo/perf/history.jsonl", "a")
            if not args.cpu else open("/dev/null", "w"))

    for bits in (16, 8, 4):
        if bits == 16:
            p, kw = params, {}
        elif bits == 8:
            p = quantize_trunk_weights(params, bits=8)
            kw = dict(weight_bits=8)
        else:
            p = quantize_trunk_weights(params, bits=4, group_size=128)
            kw = dict(weight_bits=4, quant_group=128)
        m = Setokim(cfg, target_token_id=3, **kw)
        eng = ServeEngine(m, p, max_batch=args.slots, prompt_len=L,
                          max_len=L + args.max_new + 4, eos_id=-1, pad_id=0,
                          cache_dtype=cache_dtype)
        reqs = [eng.submit(q, max_new_tokens=args.max_new)
                for q in prompts(args.slots)]
        for _ in range(4):
            eng.step()
        n0 = sum(len(r.tokens) for r in reqs)
        t0 = time.time()
        while any(not r.done for r in reqs):
            eng.step()
        dt = time.time() - t0
        n1 = sum(len(r.tokens) for r in reqs)
        line = {"metric": "serve_trunk_decode_tokens_per_sec",
                "value": round((n1 - n0) / dt, 2), "unit": "tokens/sec",
                "bits": bits, "kv_bits": args.kv_bits, "slots": args.slots,
                "layers": args.layers, "git": git, "time": time.time()}
        print(json.dumps(line), flush=True)
        hist.write(json.dumps(line) + "\n")

        if args.spec:
            # oracle drafter: replay this bits-variant's own greedy
            # streams (decode is deterministic per slot), so every draft
            # chunk verifies — the accepted-draft throughput envelope
            from setok_tpu.serve import speculative as spec_mod
            streams = [list(r.tokens) for r in reqs]
            real_draft = spec_mod.draft_prompt_lookup

            def oracle_draft(context, num_draft, max_ngram=3, pad_id=0,
                             _streams=streams):
                ctx = list(context)
                for full in _streams:
                    n = next((n for n in
                              range(min(len(full), len(ctx)), -1, -1)
                              if ctx[len(ctx) - n:] == full[:n]), 0)
                    if n > 0:
                        out = np.full((num_draft,), pad_id, np.int64)
                        nxt = full[n:n + num_draft]
                        out[:len(nxt)] = nxt
                        return out
                return np.full((num_draft,), pad_id, np.int64)

            spec_mod.draft_prompt_lookup = oracle_draft
            try:
                d = args.spec
                eng = ServeEngine(m, p, max_batch=args.slots, prompt_len=L,
                                  max_len=L + args.max_new + d + 4,
                                  eos_id=-1, pad_id=0, spec_len=d)
                reqs = [eng.submit(q, max_new_tokens=args.max_new)
                        for q in prompts(args.slots)]
                # one warmup step only: each spec step emits up to 1+D
                # tokens, so 4 warmups would finish short streams
                eng.step()
                n0 = sum(len(r.tokens) for r in reqs)
                t0 = time.time()
                while any(not r.done for r in reqs):
                    eng.step()
                dt = time.time() - t0
                n1 = sum(len(r.tokens) for r in reqs)
            finally:
                spec_mod.draft_prompt_lookup = real_draft
            line = {"metric": "serve_trunk_decode_tokens_per_sec_spec_oracle",
                    "value": round((n1 - n0) / dt, 2), "unit": "tokens/sec",
                    "bits": bits, "slots": args.slots, "spec_len": d,
                    "layers": args.layers, "git": git, "time": time.time()}
            print(json.dumps(line), flush=True)
            hist.write(json.dumps(line) + "\n")
        del eng, p, m
    hist.close()


if __name__ == "__main__":
    main()
