#!/usr/bin/env python
"""VQA evaluation harness: batched greedy decode + official soft accuracy.

Parity: the reference ships the VQA annotation API (src/dataset/vqa.py) but
no eval loop; this closes that gap — load a model, run the GQA/VQAv2-style
question records through `generate_text`, score with `vqa_accuracy`.

Smoke mode (--synthetic) fabricates records to exercise the loop without
datasets or trained weights.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--questions", default=None)
    p.add_argument("--annotations", default=None)
    p.add_argument("--image-folder", default="")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-new-tokens", type=int, default=16)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--out", default="/tmp/vqa_eval.json")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from setok_tpu.constants import IMAGE_TOKEN_INDEX
    from setok_tpu.data.vqa_eval import vqa_accuracy
    from setok_tpu.models.builder import load_pretrained_model
    from setok_tpu.models.generate import generate_text

    model, params = load_pretrained_model(args.checkpoint, tiny=args.tiny)
    cfg = model.cfg
    size = cfg.tokenizer.vit.image_size
    k_max = cfg.tokenizer.k_max

    if args.synthetic:
        rs = np.random.RandomState(0)
        records = [{"question_id": i,
                    "question_ids": rs.randint(10, 400, 6).tolist(),
                    "image": (rs.rand(size, size, 3) * 2 - 1)
                    .astype(np.float32),
                    "answers": ["yes"] * 10}
                   for i in range(args.synthetic)]
        decode = lambda ids: " ".join(map(str, ids))
    else:
        raise SystemExit(
            "dataset mode needs a real tokenizer; wire --questions/"
            "--annotations with an HF tokenizer checkpoint "
            "(see data/vqa_eval.py + data/datasets.py loaders)")

    if args.limit:
        records = records[: args.limit]

    results, accs = [], []
    for i in range(0, len(records), args.batch_size):
        chunk = records[i:i + args.batch_size]
        L = k_max + 2 + max(len(r["question_ids"]) for r in chunk)
        ids = np.zeros((len(chunk), L), np.int64)
        imgs = np.zeros((len(chunk), size, size, 3), np.float32)
        for j, r in enumerate(chunk):
            ids[j, 0] = 1
            ids[j, 1:1 + k_max] = IMAGE_TOKEN_INDEX
            q = r["question_ids"]
            ids[j, 1 + k_max:1 + k_max + len(q)] = q
            imgs[j] = r["image"]
        out = generate_text(model, params, jnp.asarray(ids),
                            jnp.asarray(imgs),
                            max_new_tokens=args.max_new_tokens, eos_id=2)
        for j, r in enumerate(chunk):
            pred = decode([t for t in np.asarray(out.tokens)[j].tolist()
                           if t > 2])
            acc = vqa_accuracy(pred, r["answers"])
            accs.append(acc)
            results.append({"question_id": r["question_id"],
                            "prediction": pred, "accuracy": acc})

    summary = {"n": len(results),
               "accuracy": float(np.mean(accs)) if accs else 0.0}
    json.dump({"summary": summary, "results": results}, open(args.out, "w"))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
