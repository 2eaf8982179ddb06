#!/usr/bin/env python
"""Serving CLI: continuous-batching engine over a Setokim checkpoint.

Reads prompts (one per line from --prompts-file, or the built-in demo set),
feeds them through `setok_tpu.serve.ServeEngine` — fixed slot array, one
compiled decode graph, mid-stream admission — and prints each request's
completion as it retires. `--tensor-parallel N` TP-shards the trunk over
an N-way model axis (multi-chip; validated on the virtual CPU mesh).

With no checkpoint this runs the tiny config with random weights as a
living example of the serving API (tokens are arbitrary).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="",
                   help="flat .npz / orbax dir (models/builder.py loaders)")
    p.add_argument("--tokenizer", default=None,
                   help="local HF tokenizer path (word-hash fallback)")
    p.add_argument("--prompts-file", default=None)
    p.add_argument("--max-batch", type=int, default=4)
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--max-len", type=int, default=256)
    p.add_argument("--max-new-tokens", type=int, default=32)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top-p", type=float, default=1.0,
                   help="nucleus sampling at temperature>0 (1.0 = off)")
    p.add_argument("--presence-penalty", type=float, default=0.0,
                   help="subtract from logits of any already-seen token")
    p.add_argument("--frequency-penalty", type=float, default=0.0,
                   help="subtract count-proportionally from seen tokens")
    p.add_argument("--decode-block", type=int, default=1,
                   help="decode steps per host dispatch (on-device scan; "
                        ">1 amortizes dispatch latency over K tokens)")
    p.add_argument("--spec-len", type=int, default=0,
                   help="speculative decoding: draft N tokens per slot by "
                        "prompt lookup, verify in one chunked forward "
                        "(greedy-exact; rejection-sampled at temperature>0; "
                        "exclusive with --decode-block>1)")
    p.add_argument("--spec-ngram", type=int, default=3)
    p.add_argument("--tensor-parallel", type=int, default=1)
    p.add_argument("--bits", type=int, default=16, choices=[16, 8, 4],
                   help="8/4 = int8/packed-int4-at-rest trunk (halves/"
                        "quarters decode weight traffic + memory; "
                        "reference load_8bit/load_4bit)")
    p.add_argument("--quant-group", type=int, default=128,
                   help="int4 scale group size along the input dim "
                        "(0 = per-output-channel; 128 = GPTQ/AWQ-style, "
                        "~2x lower RTN error)")
    p.add_argument("--prefill-chunk", type=int, default=0,
                   help="admit text prompts in C-token chunks (bounds "
                        "prefill memory; prompts up to the cache width)")
    p.add_argument("--system-prompt", default=None,
                   help="text prepended to every prompt and registered as "
                        "a cached KV prefix (requires --prefill-chunk): "
                        "admissions re-run the trunk over their suffix "
                        "only")
    p.add_argument("--kv-bits", type=int, default=16, choices=[16, 8],
                   help="8 = int8 KV cache (per-token scales; ~51% of "
                        "bf16 decode cache-read traffic at long context)")
    p.add_argument("--tiny", action="store_true", default=True)
    p.add_argument("--cpu", action="store_true")
    from setok_tpu.utils.compile_cache import (add_cli_flag,
                                               enable_compilation_cache)
    add_cli_flag(p)
    args = p.parse_args()
    enable_compilation_cache(args.compile_cache)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if args.tensor_parallel > 1:
            # provision a virtual device mesh before the backend initializes
            # (same trick as __graft_entry__.dryrun_multichip)
            n = max(args.tensor_parallel, 2)
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={n}").strip()

    from setok_tpu import config as cfgs
    from setok_tpu.data.tokenizer import load_text_tokenizer
    from setok_tpu.models.setokim import Setokim
    from setok_tpu.serve import ServeEngine

    cfg = cfgs.tiny_setokim() if args.tiny else cfgs.base_setokim()
    model = Setokim(cfg, target_token_id=3)
    tok = load_text_tokenizer(args.tokenizer,
                              vocab_size=cfg.llama.vocab_size)

    if args.prompts_file:
        with open(args.prompts_file) as f:
            prompts = [ln.strip() for ln in f if ln.strip()]
    else:
        prompts = ["Describe the image.", "What color is the sky?",
                   "Write a haiku about clustering.",
                   "Summarize SeTok in one line."]

    rng = jax.random.PRNGKey(0)
    sys_ids = np.asarray([], np.int64)
    if args.system_prompt:
        if args.prefill_chunk <= 0:
            p.error("--system-prompt requires --prefill-chunk")
        sys_ids = np.asarray(tok.encode(args.system_prompt), np.int64)

    def _encode(t):
        ids = np.asarray(tok.encode(t), np.int64)
        if len(sys_ids):
            bos = getattr(tok, "bos_token_id", None)
            if bos is not None and len(ids) and ids[0] == bos:
                ids = ids[1:]         # BOS lives at the prefix head only
            ids = np.concatenate([sys_ids, ids])
        return ids[:max(args.prompt_len, len(sys_ids) + 8)]

    enc = [_encode(t) for t in prompts]

    if args.checkpoint:
        from setok_tpu.models.builder import load_pretrained_model
        model, params = load_pretrained_model(args.checkpoint, cfg,
                                              target_token_id=3,
                                              bits=args.bits)
    else:
        ids0 = np.zeros((1, args.prompt_len), np.int64)
        ids0[0, :len(enc[0])] = enc[0]
        hw = cfg.tokenizer.vit.image_size
        img0 = jax.numpy.zeros((1, hw, hw, 3))
        params = model.init(rng, jax.numpy.asarray(ids0), img0,
                            jax.numpy.asarray(ids0), img0,
                            jax.random.PRNGKey(1), method=model.init_all)

    if args.bits in (8, 4) and not args.checkpoint:
        from setok_tpu.models.llama import (quantize_trunk_weights,
                                            valid_quant_group)
        from setok_tpu.models.setokim import Setokim as _S
        gs = (valid_quant_group(cfg.llama, args.quant_group)
              if args.bits == 4 else 0)
        params = quantize_trunk_weights(
            params, bits=args.bits, group_size=gs,
            clip_search=8 if args.bits == 4 else 0)
        model = _S(cfg, target_token_id=3, weight_bits=args.bits,
                   quant_group=gs)

    mesh = None
    if args.tensor_parallel > 1:
        from setok_tpu.parallel.mesh import make_mesh
        n = len(jax.devices())
        mesh = make_mesh(cfgs.MeshConfig(
            data=n // args.tensor_parallel, model=args.tensor_parallel))

    import jax.numpy as jnp
    eng = ServeEngine(model, params, max_batch=args.max_batch,
                      prompt_len=args.prompt_len, max_len=args.max_len,
                      temperature=args.temperature, top_p=args.top_p,
                      presence_penalty=args.presence_penalty,
                      frequency_penalty=args.frequency_penalty,
                      mesh=mesh,
                      cache_dtype=(jnp.int8 if args.kv_bits == 8
                                   else jnp.bfloat16),
                      prefill_chunk=args.prefill_chunk,
                      decode_block=args.decode_block,
                      spec_len=args.spec_len, spec_ngram=args.spec_ngram,
                      eos_id=getattr(tok, "eos_token_id", 2),
                      pad_id=getattr(tok, "pad_token_id", 0))
    if args.system_prompt and len(sys_ids):
        eng.register_prefix(sys_ids)
        print(f"registered {len(sys_ids)}-token system-prompt prefix")
    t0 = time.time()
    reqs = [eng.submit(e, max_new_tokens=args.max_new_tokens) for e in enc]
    pending = set(range(len(reqs)))
    while pending:
        eng.step()
        for i in sorted(pending):
            if reqs[i].done:
                pending.discard(i)
                print(f"[{i}] {prompts[i]!r} -> "
                      f"{tok.decode(reqs[i].tokens)!r}")
        if eng._queue.empty() and not eng._active.any() and all(
                r.done for r in reqs):
            break
    ntok = sum(len(r.tokens) for r in reqs)
    dt = time.time() - t0
    print(f"{len(reqs)} requests, {ntok} tokens in {dt:.1f}s "
          f"({ntok / max(dt, 1e-9):.1f} tok/s incl. compile)")
    ttfts = [r.ttft for r in reqs if r.ttft is not None]
    lats = [r.latency for r in reqs if r.latency is not None]
    if ttfts:
        print(f"TTFT mean {1e3 * sum(ttfts) / len(ttfts):.0f} ms, "
              f"latency mean {1e3 * sum(lats) / len(lats):.0f} ms; "
              f"engine stats: {eng.stats()}")


if __name__ == "__main__":
    main()
