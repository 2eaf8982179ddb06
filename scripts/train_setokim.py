#!/usr/bin/env python
"""Stage-2/3 Setokim training CLI.

Parity: /root/reference/src/train/train_setokim.py +
scripts/pretrain_mm_proj.sh (stage 2: --tune-mm-in/out-mlp-adapter) and
scripts/finetune.sh (stage 3: --lora-r 128 --lora-alpha 256
--mm-in-projector-lr 2e-5, instruction/edit datasets). One process drives
the whole mesh; `--synthetic N` smoke-runs without data.

Examples:
  # stage-2 projector pretraining (smoke)
  python scripts/train_setokim.py --synthetic 8 --steps 5 --tiny \
      --tune-mm-in-mlp-adapter --tune-mm-out-mlp-adapter
  # stage-3 LoRA finetune (smoke)
  python scripts/train_setokim.py --synthetic 8 --steps 5 --tiny \
      --lora-enable --lora-r 8
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
    p.add_argument("--data-path", nargs="*", default=None)
    p.add_argument("--dataset-name", nargs="*", default=None)
    p.add_argument("--image-folder", nargs="*", default=None)
    p.add_argument("--data-multiple", nargs="*", type=float, default=None)
    p.add_argument("--task-type", default="instruction",
                   choices=["pair", "instruction", "edit"])
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--tokenizer", default=None,
                   help="local HF tokenizer path (word-hash fallback)")
    p.add_argument("--output-dir", default="/tmp/setokim_train")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--max-grad-norm", type=float, default=1.0,
                   help="global-norm gradient clip (HF Trainer default "
                        "1.0, which the reference inherits); 0 disables")
    p.add_argument("--warmup-steps", type=int, default=100)
    p.add_argument("--model-max-length", type=int, default=2048)
    p.add_argument("--grad-accum-steps", type=int, default=1,
                   help="micro-batches per optimizer update (HF "
                        "gradient_accumulation_steps equivalent)")
    p.add_argument("--tiny", action="store_true")
    # freezing / staging flags (training_utils.py parity)
    p.add_argument("--freeze-backbone", action="store_true")
    p.add_argument("--tune-mm-in-mlp-adapter", action="store_true")
    p.add_argument("--tune-mm-out-mlp-adapter", action="store_true")
    p.add_argument("--freeze-mm-in-mlp-adapter", action="store_true")
    p.add_argument("--freeze-mm-out-mlp-adapter", action="store_true")
    p.add_argument("--unfreeze-mm-vision-tower", action="store_true")
    p.add_argument("--mm-in-projector-lr", type=float, default=None)
    p.add_argument("--mm-out-projector-lr", type=float, default=None)
    # LoRA
    p.add_argument("--lora-enable", action="store_true")
    p.add_argument("--lora-r", type=int, default=64)
    p.add_argument("--lora-alpha", type=float, default=16.0)
    p.add_argument("--optim-bits", type=int, default=32, choices=[32, 8],
                   help="8 = int8 adam moments, embeddings fp32 "
                        "(reference Adam8bit carve-out)")
    p.add_argument("--bits", type=int, default=16, choices=[16, 8],
                   help="8 = QLoRA: int8 frozen base + LoRA adapters "
                        "(reference --bits, train_setokim.py:228-244)")
    # staged init from pretrained components
    p.add_argument("--pretrain-vision-tokenizer", default=None,
                   help=".npz subtree from stage-1 (vision_tower keys)")
    p.add_argument("--pretrain-vision-detokenizer", default=None)
    p.add_argument("--pretrain-mm-in-mlp-adapter", default=None)
    p.add_argument("--pretrain-mm-out-mlp-adapter", default=None)
    p.add_argument("--tensor-parallel", type=int, default=1)
    p.add_argument("--sequence-parallel", type=int, default=1,
                   help="shard the sequence over a ring-attention mesh axis "
                        "(parallel/ring_attention.py) — long-context "
                        "training; mutually exclusive with --tensor-parallel")
    p.add_argument("--use-flash", action="store_true",
                   help="Pallas flash attention in the LLaMA trunk")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (virtual devices provisioned "
                        "for --tensor/sequence-parallel smoke runs)")
    p.add_argument("--checkpoint-every", type=int, default=500)
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-workers", type=int, default=8,
                   help="batch-assembly worker threads (real-data path)")
    p.add_argument("--no-native-preprocess", action="store_true",
                   help="PIL instead of the C++ fused resize+normalize")
    from setok_tpu.utils.compile_cache import add_cli_flag
    add_cli_flag(p)
    return p.parse_args()


def synthetic_batches(args, cfg, rs):
    from setok_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
    L = min(args.model_max_length, 48)
    k_max = cfg.tokenizer.k_max
    size = cfg.tokenizer.vit.image_size
    b = args.batch_size
    while True:
        ids = np.zeros((b, L), np.int64)
        labels = np.full((b, L), IGNORE_INDEX, np.int64)
        ids[:, 0] = 1
        ids[:, 1:1 + k_max] = IMAGE_TOKEN_INDEX
        text = rs.randint(10, cfg.llama.vocab_size - 10, size=(b, 6))
        ids[:, 1 + k_max:7 + k_max] = text
        labels[:, 2 + k_max:7 + k_max] = text[:, 1:]
        t0 = 7 + k_max
        ids[:, t0:t0 + cfg.target_num] = 3
        labels[:, t0:t0 + cfg.target_num] = 3
        img = (rs.rand(b, size, size, 3) * 2 - 1).astype(np.float32)
        yield {"input_ids": ids, "labels": labels,
               "comp_image": img, "gen_image": img}


def main():
    args = parse_args()
    from setok_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(args.compile_cache)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        n = max(args.tensor_parallel, args.sequence_parallel, 2)
        if n > 1:
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={n}").strip()
    from setok_tpu import config as cfgs
    from setok_tpu.parallel.mesh import make_mesh, data_sharding
    from setok_tpu.parallel.sharding import setokim_shardings
    from setok_tpu.train.stage2 import Stage2Trainer
    from setok_tpu.utils import checkpoint as ckpt
    from setok_tpu.utils.logging import MetricsLogger, build_logger
    from setok_tpu.utils.porting import load_flat_into

    logger = build_logger("train_setokim", "train_setokim.log",
                          args.output_dir)
    cfg = cfgs.tiny_setokim() if args.tiny else cfgs.base_setokim()

    # register the <target> special token so its id is what the diffusion
    # branch gathers on (setokim_arch.py:357-399 / initialize_vision_tokenizer)
    target_token_id = 3
    tokenizer = None
    if not args.synthetic:
        from setok_tpu.constants import DEFAULT_TARGET_TOKEN
        from setok_tpu.data.tokenizer import load_text_tokenizer
        tokenizer = load_text_tokenizer(args.tokenizer,
                                        vocab_size=cfg.llama.vocab_size - 8)
        tokenizer.add_tokens([DEFAULT_TARGET_TOKEN], special_tokens=True)
        target_token_id = tokenizer.convert_tokens_to_ids(
            DEFAULT_TARGET_TOKEN)

    train_cfg = cfgs.TrainConfig(learning_rate=args.learning_rate,
                                 max_grad_norm=args.max_grad_norm,
                                 warmup_steps=args.warmup_steps,
                                 total_steps=args.steps,
                                 batch_size=args.batch_size, seed=args.seed,
                                 grad_accum_steps=args.grad_accum_steps)

    devs = jax.devices()
    sp = min(args.sequence_parallel, len(devs))
    if sp > 1:
        if args.tensor_parallel > 1:
            raise SystemExit("--sequence-parallel and --tensor-parallel are "
                             "mutually exclusive (one trunk mesh)")
        from setok_tpu.parallel.mesh import make_sp_mesh
        mesh = make_sp_mesh(data=len(devs) // sp, seq=sp)
    else:
        tp = min(args.tensor_parallel, len(devs))
        mesh = make_mesh(cfgs.MeshConfig(data=len(devs) // tp, model=tp))

    trainer = Stage2Trainer(
        cfg, train_cfg=train_cfg, target_token_id=int(target_token_id),
        freeze_backbone=args.freeze_backbone,
        tune_mm_in_mlp_adapter=args.tune_mm_in_mlp_adapter,
        tune_mm_out_mlp_adapter=args.tune_mm_out_mlp_adapter,
        freeze_mm_in_mlp_adapter=args.freeze_mm_in_mlp_adapter,
        freeze_mm_out_mlp_adapter=args.freeze_mm_out_mlp_adapter,
        unfreeze_mm_vision_tower=args.unfreeze_mm_vision_tower,
        mm_in_projector_lr=args.mm_in_projector_lr,
        mm_out_projector_lr=args.mm_out_projector_lr,
        lora_enable=args.lora_enable, lora_r=args.lora_r,
        lora_alpha=args.lora_alpha, quant_base=(args.bits == 8),
        use_flash=args.use_flash, optim_bits=args.optim_bits,
        ring_mesh=(mesh if sp > 1 else None))

    rs = np.random.RandomState(args.seed)
    if args.synthetic:
        host_batches = synthetic_batches(args, cfg, rs)
    else:
        from setok_tpu.data.collator import Collator
        from setok_tpu.data.datasets import (EditingDataset,
                                             InstructionTuningDataset,
                                             TextImagePairDataset,
                                             load_cc3m)
        from setok_tpu.data.image_processing import (GeneratorImageProcessor,
                                                     ImageProcessor)
        from setok_tpu.data.tokenizer import load_text_tokenizer

        size = cfg.tokenizer.vit.image_size
        native = not args.no_native_preprocess
        kw = dict(image_processor=ImageProcessor(size=size,
                                                 use_native=native),
                  gen_processor=GeneratorImageProcessor(size=size,
                                                        use_native=native),
                  target_num=cfg.target_num)
        if args.task_type == "pair":
            ds = TextImagePairDataset(load_cc3m(args.data_path[0]),
                                      tokenizer,
                                      task_type="generation", **kw)
        elif args.task_type == "edit":
            import json
            ds = EditingDataset(json.load(open(args.data_path[0])),
                                tokenizer, **kw)
        else:
            ds = InstructionTuningDataset(
                args.dataset_name, args.data_path, tokenizer,
                image_folders=args.image_folder,
                data_multiple=args.data_multiple, **kw)
        col = Collator(max_len=args.model_max_length,
                       k_max=cfg.tokenizer.k_max)
        from setok_tpu.data.loader import BatchLoader
        loader = BatchLoader(ds, args.batch_size, col,
                             num_workers=args.num_workers, seed=args.seed)

        def batches():
            epoch = 0
            while True:
                loader.seed = args.seed + epoch
                for b in loader:
                    yield {k: v for k, v in b.items()
                           if isinstance(v, np.ndarray)}
                epoch += 1
        host_batches = batches()

    bs = data_sharding(mesh)
    # background prefetch + device transfer (data/loader.py DeviceLoader)
    from setok_tpu.data.loader import DeviceLoader
    it = iter(DeviceLoader(host_batches, sharding=bs, prefetch=2))
    batch = next(it)
    state = trainer.create_state(jax.random.PRNGKey(args.seed), batch)

    # staged init from pretrained component subtrees (setokim_arch.py:73-183)
    for path, pred in [
            (args.pretrain_vision_tokenizer, "vision_tower"),
            (args.pretrain_vision_detokenizer, "vision_generator"),
            (args.pretrain_mm_in_mlp_adapter, "mm_in_projector"),
            (args.pretrain_mm_out_mlp_adapter, "mm_out_projector")]:
        if path:
            flat = dict(np.load(path))
            new_params, unmatched = load_flat_into(state.params, flat)
            state = state.replace(params=new_params)
            logger.info("loaded %s from %s (%d arrays, %d unmatched)",
                        pred, path, len(flat), len(unmatched))

    state = jax.tree.map(jax.device_put, state,
                         setokim_shardings(state, mesh))

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
    for step in range(start, args.steps):
        rng, k = jax.random.split(rng)
        state, metrics = trainer.train_step(state, batch, k)
        metrics_log.log(step, metrics)
        if (step + 1) % args.checkpoint_every == 0 or step == args.steps - 1:
            runner.save(step + 1, state)
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
