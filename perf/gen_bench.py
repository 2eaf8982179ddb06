"""Image-GENERATION path bench: MaskGIT sampling + detokenizer render.

The tokenizer bench (bench.py) covers the encode path; this measures the
other reference headline (SURVEY §3.4): `sample_tokens`'s iterative
MaskGIT decoding — num_iter iterations, each running the DiffLoss MLP's
respaced diffusion sampler (reference default: 64 iters x 100 denoise
steps, setokim_llama.py:206-264) — followed by one pixel-decoder render.
The LLaMA trunk is NOT in this path (hidden spans come in as data), so
the bench builds base-scale diffloss+detokenizer on a tiny trunk.

Methodology: same two-point scan-slope as bench.py (the tunneled chip's
~90 ms dispatch and the readback cancel in the subtraction).

Run ON THE TPU: python perf/gen_bench.py [--num-iter 16 --batch 8]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num-iter", type=int, default=16,
                    help="MaskGIT iterations (reference default 64)")
    ap.add_argument("--cfg-scale", type=float, default=1.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from setok_tpu import config as cfgs
    from setok_tpu.models.setokim import Setokim

    if args.cpu:
        cfg = cfgs.tiny_setokim()
    else:
        tok = cfgs.base_tokenizer()
        det = cfgs.base_detokenizer()
        diff = cfgs.DiffLossConfig(target_channels=tok.token_feat_dim,
                                   z_channels=det.token_feat_dim,
                                   width=1024, depth=3,
                                   num_sampling_steps="100")
        cfg = cfgs.SetokimConfig(llama=cfgs.tiny_setokim().llama,
                                 tokenizer=tok, detokenizer=det,
                                 diffloss=diff, target_num=tok.k_max)
    model = Setokim(cfg, target_token_id=3)

    B, K = args.batch, cfg.target_num
    D = cfg.llama.hidden_size
    rng = jax.random.PRNGKey(0)
    # params must come from init_all (param creation can't happen inside
    # the sampling scan) — one B=1 multimodal forward, then discard
    from setok_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
    size = cfg.tokenizer.vit.image_size
    L = K + 16
    ids = np.zeros((1, L), np.int64)
    ids[:, 0] = 1
    ids[:, 1:9] = IMAGE_TOKEN_INDEX
    ids[:, 9:14] = 7
    img0 = jnp.zeros((1, size, size, 3), jnp.float32)
    labels = np.full((1, L), IGNORE_INDEX, np.int64)
    params = model.init(rng, jnp.asarray(ids), img0, jnp.asarray(labels),
                        img0, jax.random.PRNGKey(1),
                        method=model.init_all)

    def chained(params, span, rng, iters):
        def body(carry, i):
            h, r = carry
            r, k = jax.random.split(r)
            toks = model.apply(params, h, k, args.num_iter, args.cfg_scale,
                               1.0, method=model.sample_image_tokens)
            img = model.apply(params, toks, method=model.render_image).image
            # data-dependent chain: perturb the span by the image mean
            h = h + jnp.mean(img).astype(h.dtype) * 1e-6
            return (h, r), jnp.sum(img[..., 0, 0, :])
        (_, _), outs = jax.lax.scan(body, (span, rng), None, length=iters)
        return jnp.sum(outs)

    fn = jax.jit(chained, static_argnums=3)

    def timed(iters, seed):
        span = jax.random.normal(jax.random.PRNGKey(seed), (B, K, D),
                                 jnp.float32)
        t0 = time.perf_counter()
        float(fn(params, span, jax.random.PRNGKey(seed + 1), iters))
        return time.perf_counter() - t0

    small, big = (1, 4) if not args.cpu else (1, 2)
    timed(small, 100)
    timed(big, 101)
    t_small = min(timed(small, 1), timed(small, 2))
    t_big = min(timed(big, 3), timed(big, 4))
    dt = t_big - t_small
    ips = B * (big - small) / dt
    ms = 1000.0 * dt / ((big - small) * B)
    print(f"t_small={t_small:.3f}s t_big={t_big:.3f}s", file=sys.stderr)
    line = {"metric": "setok_image_generation_throughput",
            "value": round(ips, 2), "unit": "images/sec",
            "ms_per_image": round(ms, 2), "num_iter": args.num_iter,
            "diffusion_steps": cfg.diffloss.num_sampling_steps,
            "cfg_scale": args.cfg_scale, "batch": B,
            "platform": "cpu" if args.cpu else "tpu",
            "git": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                  capture_output=True, text=True,
                                  cwd="/root/repo").stdout.strip(),
            "time": time.time()}
    print(json.dumps(line))
    if not args.cpu:
        with open("/root/repo/perf/history.jsonl", "a") as f:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
