#!/usr/bin/env python
"""Reconstruction-quality eval: PSNR / SSIM (+ optional FID) over a folder
of images through the SeTok encode→cluster→decode path.

This is the harness that produces the BASELINE.md north-star numbers once
pretrained weights are ported (recon parity within 1% of the reference).
`--synthetic N` exercises the loop without data or weights.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-folder", default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--stage1-dir", default="",
                   help="stage-1 output dir — loads the trained SeTok "
                        "subtree from its orbax checkpoints")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--fid", action="store_true",
                   help="also compute FID with frozen-ViT features")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--synthetic-structured", action="store_true",
                   help="synthetic = colored shapes (utils/synthetic.py)")
    p.add_argument("--image-size", type=int, default=None,
                   help="override config image size (match training)")
    p.add_argument("--min-cluster-num", type=int, default=None)
    p.add_argument("--threshold", type=float, default=None,
                   help="cluster threshold — MUST match the trained run's")
    p.add_argument("--k-max", type=int, default=None)
    p.add_argument("--merge-layer", type=int, default=None,
                   help="2x2 token merge after this ViT block — MUST match "
                        "the trained run's (cluster knobs are clamped to "
                        "the merged patch count, like train_setok.py)")
    p.add_argument("--detok-patch", type=int, default=None,
                   help="detokenizer patch size — MUST match the trained "
                        "run's (see train_setok.py --detok-patch)")
    p.add_argument("--detok-depth", type=int, default=None,
                   help="pixel-decoder depth — MUST match the trained "
                        "run's (see train_setok.py --detok-depth)")
    p.add_argument("--cluster-dist-norm", action="store_true",
                   help="scale-invariant DPC-KNN (ops/clustering.py "
                        "dist_norm): --threshold then reads in units of the "
                        "mean pairwise distance. Eval-time swap is "
                        "legitimate — clustering is under stop_gradient, "
                        "not a trained path (adaptive-K experiment, "
                        "PERF.md)")
    p.add_argument("--eval-seed", type=int, default=10_000,
                   help="seed offset for the synthetic eval set (held out "
                        "from training's seeds)")
    p.add_argument("--precision", default="fp32",
                   choices=["fp32", "bf16", "quant8"],
                   help="inference precision variant (quant8 = the fused "
                        "int8 kernel path the bench headline uses)")
    from setok_tpu.utils.compile_cache import (add_cli_flag,
                                               enable_compilation_cache)
    add_cli_flag(p)
    args = p.parse_args()
    enable_compilation_cache(args.compile_cache)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from setok_tpu import config as cfgs
    from setok_tpu.data.image_processing import GeneratorImageProcessor
    from setok_tpu.models.setok import SeTok
    from setok_tpu.utils.metrics import compute_fid, psnr, ssim

    if args.tiny:
        # mirror scripts/train_setok.py's tiny branch EXACTLY, including
        # its --image-size DEFAULT (256): train builds
        # tiny_tokenizer(image_size, max(image_size // 4, 8)), so a
        # different default or patch rule here cannot load a train-CLI
        # tiny checkpoint (orbax shape mismatch on patch_embed)
        size = args.image_size or 256
        patch = max(size // 4, 8)
        tok_cfg = cfgs.tiny_tokenizer(size, patch)
        det_cfg = cfgs.tiny_detokenizer(size, patch)
    else:
        tok_cfg = cfgs.base_tokenizer()
        det_cfg = cfgs.base_detokenizer()
        if args.image_size:
            tok_cfg = cfgs.replace(
                tok_cfg, vit=cfgs.replace(tok_cfg.vit,
                                          image_size=args.image_size))
            det_cfg = cfgs.replace(det_cfg, image_size=args.image_size)
    overrides = {k: v for k, v in
                 (("min_cluster_num", args.min_cluster_num),
                  ("threshold", args.threshold),
                  ("k_max", args.k_max)) if v is not None}
    if args.cluster_dist_norm:
        overrides["cluster_dist_norm"] = True
    if args.merge_layer is not None:
        vit = cfgs.replace(tok_cfg.vit, merge_layer=args.merge_layer)
        n_out = vit.num_output_patches
        overrides["k_max"] = min(overrides.get("k_max", tok_cfg.k_max),
                                 n_out)
        overrides["min_cluster_num"] = min(
            overrides.get("min_cluster_num", tok_cfg.min_cluster_num),
            overrides["k_max"])
        overrides["knn"] = min(tok_cfg.knn, n_out)
        # ONE atomic replace: vit + clamped knobs together — replacing the
        # vit alone trips TokenizerConfig.__post_init__ (k_max > merged N)
        # before the clamps land (r4 qd_eval_merge3 rc=1)
        overrides["vit"] = vit
    if overrides:
        tok_cfg = cfgs.replace(tok_cfg, **overrides)
    if args.detok_patch is not None:
        if det_cfg.image_size % args.detok_patch:
            raise SystemExit(f"--detok-patch {args.detok_patch} must divide "
                             f"image size {det_cfg.image_size}")
        det_cfg = cfgs.replace(det_cfg, patch_size=args.detok_patch)
    if args.detok_depth is not None:
        det_cfg = cfgs.replace(det_cfg, decoder_depth=args.detok_depth)
    kw = {}
    if args.precision == "bf16":
        kw = dict(dtype=jnp.bfloat16)
    elif args.precision == "quant8":
        kw = dict(quant8=True)
    model = SeTok(tok_cfg, det_cfg, **kw)
    size = tok_cfg.vit.image_size

    if args.synthetic:
        if args.synthetic_structured:
            from setok_tpu.utils.synthetic import structured_images
            images = structured_images(args.synthetic, size,
                                       seed=args.eval_seed)
        else:
            rs = np.random.RandomState(0)
            images = (rs.rand(args.synthetic, size, size, 3) * 2 - 1
                      ).astype(np.float32)
    else:
        from PIL import Image
        proc = GeneratorImageProcessor(size=size)
        paths = sorted(sum((glob.glob(os.path.join(args.image_folder, e))
                            for e in ("*.jpg", "*.png", "*.jpeg")), []))
        if args.limit:
            paths = paths[: args.limit]
        images = np.stack([proc(Image.open(p)) for p in paths])

    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.asarray(images[:1]))
    if args.checkpoint:
        from setok_tpu.utils.checkpoint import load_subtree
        params = load_subtree(args.checkpoint, params)
    if args.stage1_dir:
        # load the trained SeTok subtree straight from a stage-1 run's
        # orbax checkpoints (scripts/train_setok.py output)
        from setok_tpu.utils import checkpoint as ckpt
        cdir = (args.stage1_dir
                if ckpt.latest_step(args.stage1_dir) is not None
                else os.path.join(args.stage1_dir, "checkpoints"))
        step = ckpt.latest_step(cdir)
        if step is None:
            raise SystemExit(f"no checkpoint under {args.stage1_dir}")
        state = ckpt.restore_checkpoint(cdir, step)
        params = jax.tree.map(jnp.asarray, state["gen_params"]["setok"])

    fwd = jax.jit(lambda p, x: model.apply(p, x))
    recons, psnrs, ssims, ncs = [], [], [], []
    for i in range(0, len(images), args.batch_size):
        x = jnp.asarray(images[i:i + args.batch_size])
        out = fwd(params, x)
        recons.append(np.asarray(out.recon, np.float32))
        psnrs.append(float(psnr(out.recon, x)))
        ssims.append(float(ssim(out.recon, x)))
        ncs.append(float(jnp.mean(out.num_clusters.astype(jnp.float32))))

    result = {"n": int(len(images)),
              "precision": args.precision,
              "psnr": float(np.mean(psnrs)),
              "ssim": float(np.mean(ssims)),
              "mean_clusters": float(np.mean(ncs))}

    if args.fid:
        # jitted: unjitted apply dispatches op-by-op through the hosted
        # tunnel (~15 ms/op) — the r4 quant8 eval blew a 1200 s timeout on
        # exactly this before the fix
        @jax.jit
        def _pooled(p, imgs):
            out = model.apply(p, imgs, method=model.tokenize)
            denom = jnp.maximum(
                jnp.sum(out.token_valid, -1, keepdims=True), 1)
            return (jnp.sum(out.tokens * out.token_valid[..., None], 1)
                    / denom)

        def feats(imgs):
            return np.asarray(_pooled(params, jnp.asarray(imgs)),
                              np.float32)
        result["fid_vitfeat"] = compute_fid(
            images, np.concatenate(recons), feats,
            batch_size=args.batch_size)

    print(json.dumps(result))

    if not args.cpu:
        import subprocess
        import time
        git = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__)))).stdout.strip()
        line = {"metric": "eval_recon", **result,
                "stage1_dir": args.stage1_dir,
                "merge_layer": args.merge_layer,
                "detok_patch": args.detok_patch,
                "detok_depth": args.detok_depth,
                "threshold": args.threshold, "eval_seed": args.eval_seed,
                "cluster_dist_norm": args.cluster_dist_norm,
                # resolved (post-clamp) clustering knobs: regime-defining
                # under the fixed-K recipe (threshold=1e9 + min_cluster_num)
                # — without them a history row is not reproducible
                "min_cluster_num": tok_cfg.min_cluster_num,
                "k_max": tok_cfg.k_max,
                "git": git, "time": time.time()}
        hist = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "perf", "history.jsonl")
        with open(hist, "a") as f:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
