"""Component split for the token-merge variant: where does the time go?

ab_merge.py (chip, r4): merge_layer=1 = 1988 img/s vs 1561 unmerged —
+27%, far below the ~3x the encoder-FLOP cut alone would suggest. This
splits the forward into tokenize (ViT encode + DPC-KNN cluster + group
encode) vs detokenize (Q-Former mapper at grid^2 queries + pixel head),
per config, with bench.py's slope methodology — the detokenizer does not
shrink with merge_layer (its query count is grid^2, independent of N), so
it bounds the variant's ceiling (Amdahl).

Run ON THE TPU: python perf/ab_merge_split.py
"""

import dataclasses
import json
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from setok_tpu import config as cfgs                        # noqa: E402
from setok_tpu.models.setok import SeTok                    # noqa: E402

BATCH = 64
ITERS_SMALL = 2
ITERS_BIG = 22


def slope(fn, params, shape, mk_next):
    """bench.py methodology: jitted scan chain, slope between two lengths,
    completion via host readback."""

    def chained(params, images, iters):
        def body(x, _):
            out, nxt = mk_next(params, x)
            return nxt, out
        _, accum = jax.lax.scan(body, images, None, length=iters)
        return jnp.sum(accum)

    jfn = jax.jit(chained, static_argnums=2)

    def timed(iters, seed):
        imgs = jax.random.uniform(jax.random.PRNGKey(seed), shape,
                                  jnp.float32, -1.0, 1.0)
        t0 = time.perf_counter()
        float(jfn(params, imgs, iters))
        return time.perf_counter() - t0

    timed(ITERS_SMALL, 100)
    timed(ITERS_BIG, 101)
    t_small = min(timed(ITERS_SMALL, 1), timed(ITERS_SMALL, 2))
    t_big = min(timed(ITERS_BIG, 3), timed(ITERS_BIG, 4))
    return (t_big - t_small) / (ITERS_BIG - ITERS_SMALL) / BATCH * 1e3


def measure(merge_layer, detok_patch=None):
    tok_cfg = cfgs.base_tokenizer()
    if merge_layer is not None:
        vit = dataclasses.replace(tok_cfg.vit, merge_layer=merge_layer)
        tok_cfg = dataclasses.replace(tok_cfg, vit=vit, k_max=48, knn=32,
                                      min_cluster_num=48)
    det_cfg = cfgs.base_detokenizer()
    if detok_patch is not None:
        det_cfg = dataclasses.replace(det_cfg, patch_size=detok_patch)
    model = SeTok(tok_cfg, det_cfg, dtype=jnp.bfloat16,
                  param_dtype=jnp.float32, quant8=True)
    rng = jax.random.PRNGKey(0)
    size = tok_cfg.vit.image_size
    shape = (BATCH, size, size, 3)
    params = model.init(rng, jax.random.uniform(rng, (1, size, size, 3),
                                                jnp.float32, -1.0, 1.0))

    def full(params, x):
        out = model.apply(params, x)
        return (jnp.sum(out.num_clusters),
                jnp.clip(out.recon, -1, 1).astype(x.dtype))

    def tok_only(params, x):
        out = model.apply(params, x, method=SeTok.tokenize)
        # chain: fold the token summary back into the image input
        return (jnp.sum(out.num_clusters),
                x + jnp.mean(out.tokens).astype(x.dtype))

    ms_full = slope(full, params, shape, lambda p, x: full(p, x))
    ms_tok = slope(tok_only, params, shape, lambda p, x: tok_only(p, x))
    return ms_full, ms_tok


def main():
    git = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True,
                         cwd="/root/repo").stdout.strip()
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="-:-,1:-",
                    help="comma-separated ml:dp pairs ('-' = None)")
    args = ap.parse_args()
    pairs = []
    for s in args.configs.split(","):
        ml, dp = s.split(":")
        pairs.append((None if ml == "-" else int(ml),
                      None if dp == "-" else int(dp)))
    for ml, dp in pairs:
        ms_full, ms_tok = measure(ml, dp)
        line = {"metric": "merge_component_split_ms_per_img",
                "merge_layer": ml, "detok_patch": dp,
                "full": round(ms_full, 4),
                "tokenize": round(ms_tok, 4),
                "detokenize_residual": round(ms_full - ms_tok, 4),
                "batch": BATCH, "git": git, "time": time.time()}
        print(json.dumps(line))
        with open("/root/repo/perf/history.jsonl", "a") as f:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
