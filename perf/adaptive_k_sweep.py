#!/usr/bin/env python
"""Adaptive-K restoration sweep on a merged checkpoint (PERF.md item).

The reference's absolute score threshold (0.3/0.55) is calibrated on raw
frozen-backbone features (/root/reference/src/model/setok/tokenizer.py:88-91,
103-107). The merge variant needs merge_out_norm (LN) to survive training,
and on LN'd features that calibration breaks in the opposite direction:
threshold 0.3 → only the density peak clears → K=1 (r4 wave-3 train log).
The scale-invariant recast (`cluster_dist_norm`, ops/clustering.py) reads
the threshold in units of the mean pairwise distance; this harness asks
whether ANY such threshold restores healthy adaptive-K on a merged
checkpoint:

  phase 1 — tokenize the eval set once (threshold=inf ⇒ scores are
            computed identically regardless; score is threshold-free) and
            take score quantiles → candidate thresholds;
  phase 2 — full recon eval per candidate: PSNR/SSIM + the K distribution
            (mean/std/min/max — adaptive means K VARIES by image).

Success = some threshold gives per-image-varying K in a sane band with
SSIM within ~1% of the checkpoint's fixed-K row; else an honest negative.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage1-dir", required=True)
    p.add_argument("--merge-layer", type=int, default=None)
    p.add_argument("--detok-patch", type=int, default=None)
    p.add_argument("--detok-depth", type=int, default=None,
                   help="pixel-decoder depth — MUST match the trained "
                        "run's (see train_setok.py --detok-depth)")
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--eval-seed", type=int, default=10_000)
    p.add_argument("--quantiles", default="0.70,0.80,0.875,0.9375",
                   help="score quantiles → candidate thresholds (expected "
                        "K ≈ (1-q)·N if scores were iid per token)")
    p.add_argument("--min-cluster-num", type=int, default=16,
                   help="fallback K when nothing clears (reference "
                        "semantics); ALSO the fixed-K control row")
    args = p.parse_args()

    from setok_tpu import config as cfgs
    from setok_tpu.models.setok import SeTok
    from setok_tpu.utils import checkpoint as ckpt
    from setok_tpu.utils.metrics import psnr, ssim
    from setok_tpu.utils.synthetic import structured_images

    tok_cfg = cfgs.base_tokenizer()
    det_cfg = cfgs.base_detokenizer()
    overrides = {"min_cluster_num": args.min_cluster_num,
                 "threshold": 1e9, "cluster_dist_norm": True}
    if args.merge_layer is not None:
        vit = cfgs.replace(tok_cfg.vit, merge_layer=args.merge_layer)
        n_out = vit.num_output_patches
        overrides["vit"] = vit
        overrides["k_max"] = min(tok_cfg.k_max, n_out)
        overrides["min_cluster_num"] = min(args.min_cluster_num, n_out)
        overrides["knn"] = min(tok_cfg.knn, n_out)
    tok_cfg = cfgs.replace(tok_cfg, **overrides)
    if args.detok_patch is not None:
        det_cfg = cfgs.replace(det_cfg, patch_size=args.detok_patch)
    if args.detok_depth is not None:
        det_cfg = cfgs.replace(det_cfg, decoder_depth=args.detok_depth)
    model = SeTok(tok_cfg, det_cfg)
    size = tok_cfg.vit.image_size

    images = structured_images(args.n, size, seed=args.eval_seed)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images[:1]))
    cdir = (args.stage1_dir
            if ckpt.latest_step(args.stage1_dir) is not None
            else os.path.join(args.stage1_dir, "checkpoints"))
    step = ckpt.latest_step(cdir)
    if step is None:
        raise SystemExit(f"no checkpoint under {args.stage1_dir}")
    state = ckpt.restore_checkpoint(cdir, step)
    params = jax.tree.map(jnp.asarray, state["gen_params"]["setok"])

    # phase 1: scores (threshold-independent) → candidate thresholds
    tok_fn = jax.jit(lambda p, x: model.apply(p, x, method=model.tokenize))
    scores = []
    for i in range(0, args.n, args.batch_size):
        out = tok_fn(params, jnp.asarray(images[i:i + args.batch_size]))
        scores.append(np.asarray(out.score, np.float32))
    scores = np.concatenate(scores)                      # (n, N)
    qs = [float(q) for q in args.quantiles.split(",")]
    cands = [float(np.quantile(scores, q)) for q in qs]
    print(json.dumps({"score_quantiles": dict(zip(map(str, qs), cands)),
                      "score_min": float(scores.min()),
                      "score_max": float(scores.max())}))

    # phase 2: recon eval at each candidate (+ the fixed-K control row at
    # threshold=1e9, same dist_norm config — separates dist_norm cost from
    # threshold choice)
    def eval_at(thr):
        def full(p, x):
            t = model.apply(p, x, method=model.tokenize, threshold=thr)
            d = model.apply(p, t.tokens, t.token_valid,
                            method=model.detokenize)
            return d.image, t.num_clusters
        full = jax.jit(full)
        ps, ss, ks = [], [], []
        for i in range(0, args.n, args.batch_size):
            x = jnp.asarray(images[i:i + args.batch_size])
            recon, k = full(params, x)
            ps.append(float(psnr(recon, x)))
            ss.append(float(ssim(recon, x)))
            ks.append(np.asarray(k, np.float32))
        ks = np.concatenate(ks)
        return {"psnr": float(np.mean(ps)), "ssim": float(np.mean(ss)),
                "k_mean": float(ks.mean()), "k_std": float(ks.std()),
                "k_min": float(ks.min()), "k_max": float(ks.max())}

    git = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__)))).stdout.strip()
    hist = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "perf", "history.jsonl")
    rows = []
    for label, thr in [("fixedK_control", 1e9)] + [
            (f"q{q}", c) for q, c in zip(qs, cands)]:
        r = eval_at(thr)
        row = {"metric": "adaptive_k_sweep", "label": label,
               "threshold": thr, "dist_norm": True,
               "stage1_dir": args.stage1_dir,
               "merge_layer": args.merge_layer,
               "detok_patch": args.detok_patch,
               "detok_depth": args.detok_depth, "n": args.n,
               "eval_seed": args.eval_seed, **r,
               "git": git, "time": time.time()}
        rows.append(row)
        print(json.dumps(row))
        with open(hist, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
