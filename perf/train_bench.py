"""Train-step throughput/MFU bench for both training stages.

The perf program so far measured the inference bench path (PERF.md); this
harness closes the training side: device-time per optimizer step, images/s,
and MFU from the compiled executable's own cost analysis — for the stage-1
GAN/contrastive step (reference: train_setok.sh, bs 24/GPU) and the stage-2
multimodal CE+diffusion step (reference: pretrain_mm_proj.sh, bs 32).

Methodology (memory: tpu-bench-methodology): wall slope over --steps jitted
calls after --warmup, inputs donated as in training, one process per TPU.

Run:  python perf/train_bench.py --stage 1 --scale base --batch 16
      python perf/train_bench.py --stage 2 --scale tiny --batch 8 --cpu
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

V5E_PEAK = {"bf16": 197e12, "f32": 197e12 / 2}


def flops_of(lowered):
    try:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1, choices=[1, 2])
    ap.add_argument("--scale", default="tiny", choices=["tiny", "mid", "base"],
                    help="stage-2 'base' is the 7B trunk — full training "
                         "state is ~112 GB and cannot fit one v5e; 'mid' "
                         "(h=1024 8-layer trunk + ViT-B tokenizer + base "
                         "detokenizer) is the largest single-chip-honest "
                         "stage-2 trainable shape")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--image-size", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from setok_tpu import config as cfgs

    rs = np.random.RandomState(0)
    rng = jax.random.PRNGKey(0)

    if args.stage == 1:
        from setok_tpu.train.stage1 import Stage1Trainer
        if args.scale == "tiny":
            size = args.image_size or 32
            tok, det = (cfgs.tiny_tokenizer(size, max(size // 4, 8)),
                        cfgs.tiny_detokenizer(size, max(size // 4, 8)))
        else:      # stage-1 'mid' == 'base' (ViT-B is already the flagship)
            tok, det = cfgs.base_tokenizer(), cfgs.base_detokenizer()
            size = args.image_size or tok.vit.image_size
            if size != tok.vit.image_size:
                tok = cfgs.replace(
                    tok, vit=cfgs.replace(tok.vit, image_size=size))
                det = cfgs.replace(det, image_size=size)
        trainer = Stage1Trainer(
            tok, det, gan_cfg=cfgs.GANLossConfig(disc_start=0, warm_up_end=0),
            contrastive_cfg=cfgs.ContrastiveLossConfig(
                text_embed_dim=tok.token_feat_dim))
        img = rs.rand(args.batch, size, size, 3).astype(np.float32) * 2 - 1
        batch = {"comp_image": jnp.asarray(img), "gen_image": jnp.asarray(img),
                 "text_emb": jnp.asarray(
                     rs.randn(args.batch, tok.token_feat_dim)
                     .astype(np.float32))}
        state = trainer.create_state(rng, batch)
        lowered = type(trainer).train_step.lower(
            trainer, state, batch, jax.random.PRNGKey(1))
        step = lambda st, r: trainer.train_step(st, batch, r)
        label = f"stage1/{args.scale}@{size}px"
    else:
        from setok_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
        from setok_tpu.train.stage2 import Stage2Trainer
        if args.scale == "tiny":
            cfg = cfgs.tiny_setokim()
        elif args.scale == "mid":
            h = 1024
            llama = cfgs.LlamaConfig(vocab_size=32000, hidden_size=h,
                                     intermediate_size=int(2.75 * h),
                                     num_layers=8, num_heads=h // 128,
                                     num_kv_heads=h // 128, head_dim=128,
                                     max_seq_len=512)
            tokc, detc = cfgs.base_tokenizer(), cfgs.base_detokenizer()
            diff = cfgs.DiffLossConfig(target_channels=tokc.token_feat_dim,
                                       z_channels=detc.token_feat_dim,
                                       width=1024, depth=3,
                                       num_sampling_steps="100")
            cfg = cfgs.SetokimConfig(llama=llama, tokenizer=tokc,
                                     detokenizer=detc, diffloss=diff,
                                     target_num=tokc.k_max)
        else:
            cfg = cfgs.base_setokim()
        tgt = 3
        k_max, t_num = cfg.tokenizer.k_max, cfg.target_num
        size = cfg.tokenizer.vit.image_size
        L = 1 + k_max + 16 + t_num + 7
        b = args.batch
        ids = np.zeros((b, L), np.int64)
        labels = np.full((b, L), IGNORE_INDEX, np.int64)
        ids[:, 0] = 1
        ids[:, 1:1 + k_max] = IMAGE_TOKEN_INDEX
        text = rs.randint(10, cfg.llama.vocab_size - 10, size=(b, 16))
        ids[:, 1 + k_max:17 + k_max] = text
        labels[:, 2 + k_max:17 + k_max] = text[:, 1:]
        ids[:, 17 + k_max:17 + k_max + t_num] = tgt
        labels[:, 17 + k_max:17 + k_max + t_num] = tgt
        img = rs.rand(b, size, size, 3).astype(np.float32) * 2 - 1
        batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
                 "comp_image": jnp.asarray(img), "gen_image": jnp.asarray(img)}
        trainer = Stage2Trainer(cfg, train_cfg=cfgs.TrainConfig(
            warmup_steps=0), target_token_id=tgt)
        state = trainer.create_state(rng, batch)
        lowered = type(trainer)._train_step_full.lower(
            trainer, state, batch, jax.random.PRNGKey(1))
        step = lambda st, r: trainer.train_step(st, batch, r)
        label = f"stage2/{args.scale} L={L}"

    flops = flops_of(lowered) if lowered is not None else 0.0

    # Methodology (bench.py docstring): on the hosted-TPU tunnel
    # jax.block_until_ready does NOT wait for remote execution — only a
    # host READBACK does. The state threads through every step, so reading
    # back the last step's loss forces the whole timed chain. (The r4
    # first-run barrier was block_until_ready and reported 138% MFU —
    # i.e. it timed dispatch enqueue, not execution.)
    for i in range(args.warmup):
        rng, k = jax.random.split(rng)
        state, metrics = step(state, k)
    float(jax.tree_util.tree_leaves(metrics)[0])      # readback barrier
    t0 = time.time()
    for i in range(args.steps):
        rng, k = jax.random.split(rng)
        state, metrics = step(state, k)
    float(jax.tree_util.tree_leaves(metrics)[0])      # readback barrier
    dt = (time.time() - t0) / args.steps

    out = {"bench": label, "batch": args.batch, "ms_per_step": dt * 1e3,
           "examples_per_s": args.batch / dt,
           "total_loss": float(metrics["total_loss"]),
           "device": jax.devices()[0].device_kind}
    if flops:
        out["gflops_per_step"] = flops / 1e9
        if not args.cpu:
            out["mfu_bf16_pct"] = 100.0 * flops / dt / V5E_PEAK["bf16"]
    print(json.dumps(out))
    if not args.cpu:
        import subprocess
        git = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd="/root/repo").stdout.strip()
        with open("/root/repo/perf/history.jsonl", "a") as f:
            f.write(json.dumps({"metric": "train_step_ms", **out,
                                "git": git, "time": time.time()}) + "\n")


if __name__ == "__main__":
    main()
