"""A/B: token-merge (smaller-N) tokenizer variant vs the headline config.

VERDICT r2 / PERF.md conclusion: 5k img/s at ViT-B int8 N=256 exceeds the
chip's int8 peak — "a smaller-N architecture" is one of the two honest
routes. This measures it: ViTConfig.merge_layer folds the 16x16 patch grid
to 8x8 after `merge_layer+1` blocks, so (depth - merge_layer - 1) encoder
blocks, DPC-KNN clustering, and both tokenizer transformers run at N=64.

Quality is NOT free — the variant trains its own checkpoint (see PERF.md
"token-merge" for the synthetic-recipe PSNR deltas measured with
scripts/train_setok.py --merge-layer + scripts/eval_recon.py).

Timing methodology = bench.py (chained scan, slope between two lengths).
"""

import dataclasses
import json
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

from setok_tpu import config as cfgs
from setok_tpu.models.setok import SeTok

BATCH = 64
ITERS_SMALL = 2
ITERS_BIG = 22


def measure(tok_cfg, det_cfg, quant8=True):
    model = SeTok(tok_cfg, det_cfg, dtype=jnp.bfloat16,
                  param_dtype=jnp.float32, quant8=quant8)
    rng = jax.random.PRNGKey(0)
    shape = (BATCH, tok_cfg.vit.image_size, tok_cfg.vit.image_size, 3)
    params = model.init(rng, jax.random.uniform(
        rng, (1,) + shape[1:], jnp.float32, -1.0, 1.0))

    def chained(params, images, iters):
        def body(x, _):
            out = model.apply(params, x)
            r = jnp.clip(out.recon, -1, 1).astype(x.dtype)
            nxt = r if r.shape == x.shape else x + jnp.mean(r)
            return nxt, jnp.sum(out.num_clusters)
        _, ncs = jax.lax.scan(body, images, None, length=iters)
        return jnp.sum(ncs)

    fn = jax.jit(chained, static_argnums=2)

    def timed(iters, seed):
        imgs = jax.random.uniform(jax.random.PRNGKey(seed), shape,
                                  jnp.float32, -1.0, 1.0)
        t0 = time.perf_counter()
        float(fn(params, imgs, iters))
        return time.perf_counter() - t0

    timed(ITERS_SMALL, 100)
    timed(ITERS_BIG, 101)
    t_small = min(timed(ITERS_SMALL, 1), timed(ITERS_SMALL, 2))
    t_big = min(timed(ITERS_BIG, 3), timed(ITERS_BIG, 4))
    return BATCH * (ITERS_BIG - ITERS_SMALL) / (t_big - t_small)


def merged_cfgs(merge_layer=3, k_max=48, knn=32, detok_patch=None,
                detok_depth=None):
    tok = cfgs.base_tokenizer()
    if merge_layer is not None:
        vit = dataclasses.replace(tok.vit, merge_layer=merge_layer)
        tok = dataclasses.replace(tok, vit=vit, k_max=k_max, knn=knn,
                                  min_cluster_num=min(64, k_max))
    # the detokenizer consumes (B, k_max, D) + validity mask — its own query
    # count is grid², independent of k_max. detok_patch=32 quarters it (the
    # decode-side counterpart of merge_layer; ab_merge_split.py shows the
    # detokenizer bounds the merge variant's ceiling). detok_depth shrinks
    # the same residual WITHOUT coarsening the query grid — the lever that
    # stays inside the quality-proven patch-16 decode geometry.
    det = cfgs.base_detokenizer()
    if detok_patch is not None:
        det = dataclasses.replace(det, patch_size=detok_patch)
    if detok_depth is not None:
        det = dataclasses.replace(det, decoder_depth=detok_depth)
    return tok, det


def _record(value, merge_layer, base, detok_patch=None, detok_depth=None):
    git = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True,
                         cwd="/root/repo").stdout.strip()
    line = {"metric": "setok_tokenizer_throughput_merge_ab",
            "value": round(value, 2), "unit": "images/sec",
            "merge_layer": merge_layer, "detok_patch": detok_patch,
            "detok_depth": detok_depth, "batch": BATCH,
            "vs_unmerged": round(value / base, 4) if base else 1.0,
            "git": git, "time": time.time()}
    print(json.dumps(line))
    with open("/root/repo/perf/history.jsonl", "a") as f:
        f.write(json.dumps(line) + "\n")


def _parse_cfg(s):
    """'ml:dp' or 'ml:dp:dd' with '-' for None — e.g. '0:32', '-:32',
    '1:-:8' (merge1 + default patch + decoder_depth 8)."""
    parts = s.split(":")
    ml, dp = parts[0], parts[1]
    dd = parts[2] if len(parts) > 2 else "-"
    return (None if ml == "-" else int(ml), None if dp == "-" else int(dp),
            None if dd == "-" else int(dd))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="",
                    help="comma-separated ml:dp pairs ('-' = None) to "
                         "measure INSTEAD of the default 6-config sweep "
                         "(baseline is always measured for the ratio)")
    args = ap.parse_args()

    base = measure(cfgs.base_tokenizer(), cfgs.base_detokenizer())
    print(f"baseline (N=256, k_max=80): {base:.1f} img/s", file=sys.stderr)
    _record(base, None, base)
    if args.configs:
        triples = [_parse_cfg(s) for s in args.configs.split(",")]
    else:
        triples = [(1, None, None), (3, None, None), (5, None, None),
                   (None, 32, None), (1, 32, None)]
    for ml, dp, dd in triples:
        tok, det = merged_cfgs(merge_layer=ml, detok_patch=dp,
                               detok_depth=dd)
        v = measure(tok, det)
        print(f"merge_layer={ml} detok_patch={dp} detok_depth={dd}: "
              f"{v:.1f} img/s ({v / base:.2f}x)", file=sys.stderr)
        _record(v, ml, base, detok_patch=dp, detok_depth=dd)


if __name__ == "__main__":
    main()
