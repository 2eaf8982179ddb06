#!/usr/bin/env python
"""Stage-1 SeTok training CLI.

Parity: /root/reference/src/train/train_setok.py + scripts/train_setok.sh —
same knob surface (batch size, lr, cluster config, GAN schedule, data
paths), launched as a single process that drives every chip through the
jax mesh (instead of one process per GPU under deepspeed). `--synthetic N`
runs on generated data for smoke/perf testing without a dataset.

Example:
  python scripts/train_setok.py --synthetic 64 --steps 20 --batch-size 8 \
      --image-size 64 --tiny
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", default=None,
                   help="cc3m-style json (or directory of jsons)")
    p.add_argument("--image-folder", default="")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic samples instead of a dataset")
    p.add_argument("--synthetic-structured", action="store_true",
                   help="synthetic = colored shapes/gradients (learnable; "
                        "utils/synthetic.py) instead of uniform noise")
    p.add_argument("--tokenizer", default=None,
                   help="local HF tokenizer path (word-hash fallback)")
    p.add_argument("--output-dir", default="/tmp/setok_stage1")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=24)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--max-grad-norm", type=float, default=1.0,
                   help="global-norm gradient clip (HF Trainer default "
                        "1.0, which the reference inherits); 0 disables")
    p.add_argument("--warmup-steps", type=int, default=100)
    p.add_argument("--grad-accum-steps", type=int, default=1,
                   help="micro-batches per optimizer update (HF "
                        "gradient_accumulation_steps equivalent)")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--min-cluster-num", type=int, default=64)
    p.add_argument("--threshold", type=float, default=None,
                   help="cluster threshold; default = the config's own "
                        "(0.55 for base and tiny)")
    p.add_argument("--k-max", type=int, default=80)
    p.add_argument("--detok-patch", type=int, default=None,
                   help="detokenizer patch size (default 16). 32 quarters "
                        "the grid^2-query mapper+decoder cost — the "
                        "decode-side counterpart of --merge-layer "
                        "(PERF.md 'token-merge'); the variant trains its "
                        "own checkpoint")
    p.add_argument("--merge-layer", type=int, default=None,
                   help="2x2 token merge after this ViT block (smaller-N "
                        "variant; PERF.md 'token-merge'). Cluster knobs are "
                        "clamped to the merged patch count")
    p.add_argument("--detok-depth", type=int, default=None,
                   help="pixel-decoder depth (default 16). Halving it "
                        "roughly halves the detokenize residual that bounds "
                        "the merge recipe's ceiling (PERF.md component "
                        "split) WITHOUT coarsening the query grid — unlike "
                        "--detok-patch, whose >16 values train into a "
                        "degenerate constant-token basin under the "
                        "synthetic recipe. Variant trains its own ckpt")
    p.add_argument("--disc-start", type=int, default=5000)
    p.add_argument("--lpips", action="store_true",
                   help="enable the LPIPS perceptual term (VGG16 weights "
                        "from --lpips-weights, else random init — useful "
                        "only to exercise the full loss graph)")
    p.add_argument("--lpips-weights", default=None,
                   help=".npz from scripts/port_weights.py vgg16")
    p.add_argument("--optim-bits", type=int, default=32, choices=[32, 8],
                   help="8 = int8 block-quantized adam moments "
                        "(train/opt8.py; reference Adam8bit)")
    p.add_argument("--offload-optimizer", action="store_true",
                   help="park adam moments in pinned host memory "
                        "(zero3_offload equivalent; TPU only)")
    p.add_argument("--task-type", default="caption",
                   choices=["caption", "generation"])
    p.add_argument("--tiny", action="store_true",
                   help="test-scale model (CI/smoke)")
    p.add_argument("--checkpoint-every", type=int, default=500)
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-workers", type=int, default=8,
                   help="batch-assembly worker threads (real-data path; "
                        "native preprocessing releases the GIL, so ~8 "
                        "keep a v5e chip fed — perf/data_bench.py)")
    p.add_argument("--no-native-preprocess", action="store_true",
                   help="PIL instead of the C++ fused resize+normalize")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke runs)")
    from setok_tpu.utils.compile_cache import add_cli_flag
    add_cli_flag(p)
    return p.parse_args()


def main():
    args = parse_args()
    from setok_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(args.compile_cache)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from setok_tpu import config as cfgs
    from setok_tpu.parallel.mesh import make_mesh, data_sharding
    from setok_tpu.parallel.sharding import fsdp_shardings
    from setok_tpu.train.stage1 import Stage1Trainer
    from setok_tpu.utils import checkpoint as ckpt
    from setok_tpu.utils.logging import MetricsLogger, build_logger

    logger = build_logger("train_setok", "train_setok.log", args.output_dir)

    if args.tiny:
        tok_cfg = cfgs.tiny_tokenizer(args.image_size,
                                      max(args.image_size // 4, 8))
        det_cfg = cfgs.tiny_detokenizer(args.image_size,
                                        max(args.image_size // 4, 8))
        if args.merge_layer is not None:
            # same clamp discipline as the base branch — silently ignoring
            # --merge-layer under --tiny would train an unmerged model that
            # the merged eval config then can't load
            vit_cfg = cfgs.replace(tok_cfg.vit, merge_layer=args.merge_layer)
            n_out = vit_cfg.num_output_patches
            k_max = min(tok_cfg.k_max, n_out)
            tok_cfg = cfgs.replace(
                tok_cfg, vit=vit_cfg, k_max=k_max,
                min_cluster_num=min(tok_cfg.min_cluster_num, k_max),
                knn=min(tok_cfg.knn, n_out))
        if args.threshold is not None:   # None = keep the config default
            tok_cfg = cfgs.replace(tok_cfg, threshold=args.threshold)
    else:
        vit_cfg = cfgs.replace(cfgs.ViTConfig(), image_size=args.image_size,
                               merge_layer=args.merge_layer)
        # clamp cluster knobs to the patch count the ViT actually emits
        # (merge_layer shrinks it 4x; TokenizerConfig validation rejects
        # anything larger — ADVICE r3 high #1)
        n_out = vit_cfg.num_output_patches
        base = cfgs.base_tokenizer()
        k_max = min(args.k_max, n_out)
        min_cluster = min(args.min_cluster_num, k_max)
        knn = min(base.knn, n_out)
        if (k_max, min_cluster, knn) != (args.k_max, args.min_cluster_num,
                                         base.knn):
            logger.warning(
                "merge_layer=%s: clamped cluster knobs to merged N=%d "
                "(k_max %d→%d, min_cluster_num %d→%d, knn %d→%d)",
                args.merge_layer, n_out, args.k_max, k_max,
                args.min_cluster_num, min_cluster, base.knn, knn)
        tok_cfg = cfgs.replace(
            base, vit=vit_cfg, min_cluster_num=min_cluster,
            threshold=(args.threshold if args.threshold is not None
                       else base.threshold),
            k_max=k_max, knn=knn)
        det_cfg = cfgs.replace(cfgs.base_detokenizer(),
                               image_size=args.image_size)
    if args.detok_patch is not None:
        if args.image_size % args.detok_patch:
            raise SystemExit(f"--detok-patch {args.detok_patch} must divide "
                             f"--image-size {args.image_size}")
        det_cfg = cfgs.replace(det_cfg, patch_size=args.detok_patch)
    if args.detok_depth is not None:
        if args.detok_depth < 1:
            raise SystemExit("--detok-depth must be >= 1")
        det_cfg = cfgs.replace(det_cfg, decoder_depth=args.detok_depth)

    train_cfg = cfgs.TrainConfig(learning_rate=args.learning_rate,
                                 max_grad_norm=args.max_grad_norm,
                                 warmup_steps=args.warmup_steps,
                                 total_steps=args.steps,
                                 batch_size=args.batch_size, seed=args.seed,
                                 grad_accum_steps=args.grad_accum_steps)
    trainer = Stage1Trainer(
        tok_cfg, det_cfg,
        gan_cfg=cfgs.GANLossConfig(disc_start=args.disc_start),
        contrastive_cfg=cfgs.ContrastiveLossConfig(
            text_embed_dim=tok_cfg.token_feat_dim),
        train_cfg=train_cfg, use_lpips=args.lpips,
        offload_optimizer=args.offload_optimizer,
        optim_bits=args.optim_bits,
        use_text_encoder=args.data_path is not None)

    # ------------------------------------------------------------------
    if args.synthetic:
        rs = np.random.RandomState(args.seed)
        n = args.synthetic
        pool = None
        if args.synthetic_structured:
            from setok_tpu.utils.synthetic import structured_images
            pool = structured_images(n, args.image_size, seed=args.seed)
        # ONE fixed "caption" embedding PER IMAGE (a frozen table), so the
        # contrastive task is learnable (memorize image→embedding). The
        # pre-r5 harness drew text_emb from the BATCH seed — the same image
        # got fresh noise every step, making InfoNCE (weight 1.0) an
        # unlearnable target whose optimum is image-INDEPENDENT tokens:
        # measured as the dominant constant-token attractor (6/8 collapsed
        # runs, PERF.md round-5 quality program). Images are data; captions
        # must be a function of the image, exactly like the real pipeline.
        temb = np.random.RandomState(args.seed + 1).randn(
            n, tok_cfg.token_feat_dim).astype(np.float32)

        def batches():
            while True:
                idx = rs.randint(0, n)
                r = np.random.RandomState(idx)
                if pool is not None:
                    pick = rs.randint(0, n, size=args.batch_size)
                    img = pool[pick]
                    te = temb[pick]
                else:
                    img = (r.rand(args.batch_size, args.image_size,
                                  args.image_size, 3) * 2
                           - 1).astype(np.float32)
                    # noise images are keyed by (idx, position): keep the
                    # matching per-draw embedding stream (legacy path)
                    te = r.randn(args.batch_size,
                                 tok_cfg.token_feat_dim).astype(np.float32)
                yield {"comp_image": img,
                       "gen_image": img,
                       "text_emb": te}
        host_batches = batches()
    else:
        from setok_tpu.data.collator import Collator
        from setok_tpu.data.datasets import TextImagePairDataset, load_cc3m
        from setok_tpu.data.image_processing import (GeneratorImageProcessor,
                                                     ImageProcessor)
        from setok_tpu.data.tokenizer import load_text_tokenizer

        vocab = 32000   # stage-1 text only feeds the contrastive tower
        records = load_cc3m(args.data_path, args.image_folder)
        native = not args.no_native_preprocess
        ds = TextImagePairDataset(
            records, load_text_tokenizer(args.tokenizer, vocab_size=vocab), contrastive_tokenizer=load_text_tokenizer(args.tokenizer, vocab_size=vocab),
            task_type=args.task_type,
            image_processor=ImageProcessor(size=args.image_size,
                                           use_native=native),
            gen_processor=GeneratorImageProcessor(size=args.image_size,
                                                  use_native=native))
        col = Collator(max_len=77, k_max=tok_cfg.k_max)
        # threaded batch assembly (data/loader.py BatchLoader — the torch
        # DataLoader role): item decode/resize runs on num_workers threads
        # (native preprocessing releases the GIL), epochs reshuffle by seed
        from setok_tpu.data.loader import BatchLoader
        loader = BatchLoader(ds, args.batch_size, col,
                             num_workers=args.num_workers, seed=args.seed)

        def batches():
            epoch = 0
            while True:
                loader.seed = args.seed + epoch
                for b in loader:
                    # jitted step takes arrays only (passthrough keys like
                    # 'caption' stay host-side)
                    yield {k: v for k, v in b.items()
                           if isinstance(v, np.ndarray)}
                epoch += 1
        host_batches = batches()

    mesh = make_mesh()
    bs = data_sharding(mesh)
    # background prefetch + device transfer: host I/O leaves the step's
    # critical path (data/loader.py DeviceLoader; VERDICT r1 weak #9)
    from setok_tpu.data.loader import DeviceLoader
    it = iter(DeviceLoader(host_batches, sharding=bs, prefetch=2))
    first = next(it)
    state = trainer.create_state(jax.random.PRNGKey(args.seed), first)
    if args.lpips and args.lpips_weights:
        from setok_tpu.utils.porting import load_flat_into
        lp, unmatched = load_flat_into(state.lpips_params,
                                       dict(np.load(args.lpips_weights)))
        if unmatched:
            logger.warning("lpips weights: %d unmatched keys",
                           len(unmatched))
        state = state.replace(lpips_params=lp)
    state = jax.tree.map(jax.device_put, state, fsdp_shardings(state, mesh))

    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    runner = ckpt.CheckpointRunner(ckpt_dir)   # async saves + SIGTERM hook
    start = 0
    if args.resume and runner.latest_step() is not None:
        state = runner.restore(state)
        start = int(state.step)
        logger.info("resumed from step %d", start)

    metrics_log = MetricsLogger(os.path.join(args.output_dir,
                                             "metrics.jsonl"))
    rng = jax.random.PRNGKey(args.seed + 1)
    batch = first
    for step in range(start, args.steps):
        rng, k = jax.random.split(rng)
        state, metrics = trainer.train_step(state, batch, k)
        metrics_log.log(step, metrics)
        if (step + 1) % args.checkpoint_every == 0 or step == args.steps - 1:
            runner.save(step + 1, state)
            logger.info("checkpoint @ %d (async)", step + 1)
        if runner.preempted(step):
            runner.save(step + 1, state, force=True)
            logger.warning("preempted: saved @ %d, exiting", step + 1)
            break
        batch = next(it)
    else:
        step = args.steps - 1              # loop ran to completion
    runner.close()
    logger.info("done: %d/%d steps", step + 1, args.steps)


if __name__ == "__main__":
    main()
