#!/usr/bin/env python
"""Assemble a Setokim parameter set from pretrained HF/torch checkpoints.

The reference builds its model from four pretrained pieces at runtime
(SigLIP tower, BERT mapper, Vicuna/LLaMA trunk, + stage-1 SeTok weights —
setokim_arch.py:73-183, builder.py:97-138). In the zero-egress TPU container
this becomes an offline assembly step: port each torch state dict
(scripts/port_weights.py mappings), splice everything into a fresh Setokim
tree, and dump component .npz subtrees that `train_setokim.py --pretrain-*`
or `load_pretrained_model(projector_path=...)` consume.

Usage:
  python scripts/assemble_pretrained.py out_dir \\
      [--siglip path.bin] [--llama path.bin] [--bert path.bin] [--tiny]

Any subset may be given; missing pieces stay at fresh init.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--siglip", default=None,
                   help="SiglipVisionModel state dict (.bin/.safetensors)")
    p.add_argument("--llama", default=None,
                   help="LlamaForCausalLM state dict")
    p.add_argument("--bert", default=None,
                   help="BertModel state dict (Q-Former mapper init)")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    import jax
    import port_weights as pw
    from setok_tpu.models.builder import load_pretrained_model
    from setok_tpu.utils.checkpoint import prefix_predicate, save_subtree
    from setok_tpu.utils.porting import load_flat_into

    model, params = load_pretrained_model("", tiny=args.tiny)
    report = {}

    def splice(flat, root):
        nonlocal params
        flat = {f"{root}/{k}" if not k.startswith(root) else k: v
                for k, v in flat.items()}
        params, unmatched = load_flat_into(params, flat)
        report[root] = (len(flat), len(unmatched))

    if args.siglip:
        sd = pw.load_state_dict(args.siglip)
        if not any(k.startswith("vision_model.") for k in sd):
            sd = {"vision_model." + k: v for k, v in sd.items()}
        splice(pw.port_siglip_vision(sd),
               "vision_tower/image_feature_encoder")
    if args.llama:
        splice(pw.port_llama(pw.load_state_dict(args.llama)), "llama")
    if args.bert:
        n_layers = model.cfg.detokenizer.mapper_layers
        splice(pw.port_qformer_bert(pw.load_state_dict(args.bert),
                                    num_layers=n_layers),
               "vision_generator/mapper")

    os.makedirs(args.out_dir, exist_ok=True)
    for component in ["vision_tower", "vision_generator", "llama",
                      "mm_in_projector", "mm_out_projector", "diffloss"]:
        save_subtree(os.path.join(args.out_dir, f"{component}.npz"),
                     params, prefix_predicate(component))
    for root, (n, unmatched) in report.items():
        print(f"{root}: spliced {n - unmatched}/{n} arrays")
    print(f"wrote component subtrees → {args.out_dir}")


if __name__ == "__main__":
    main()
