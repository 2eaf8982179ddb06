#!/usr/bin/env python
"""Extract pretrained component subtrees from a stage-1 checkpoint for
staged stage-2/3 initialization.

Parity: /root/reference/scripts/extract_mm_projector.py +
setokim_arch.py:94-99 `get_w` key-prefix surgery — the reference loads a
stage-1 SeTok checkpoint and splices `tokenizer.*`/`detokenizer.*` weights
into the MLLM's `vision_tower`/`vision_generator` slots. This CLI does the
rename-and-dump; `scripts/train_setokim.py --pretrain-vision-tokenizer ...`
splices the result.

Usage:
  python scripts/extract_components.py <stage1_output_dir> <out_dir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# stage-1 param prefix → Setokim param prefix
RENAMES = {
    "tokenizer": "vision_tower",
    "detokenizer": "vision_generator",
}


def extract(stage1_dir: str, out_dir: str) -> None:
    from setok_tpu.utils import checkpoint as ckpt

    ckpt_dir = (stage1_dir if ckpt.latest_step(stage1_dir) is not None
                else os.path.join(stage1_dir, "checkpoints"))
    step = ckpt.latest_step(ckpt_dir)
    if step is None:
        raise SystemExit(f"no checkpoint under {stage1_dir}")
    state = ckpt.restore_checkpoint(ckpt_dir, step)
    setok_params = state["gen_params"]["setok"]

    flat = jax.tree_util.tree_flatten_with_path(setok_params)[0]
    buckets = {v: {} for v in RENAMES.values()}
    for path, leaf in flat:
        keys = [str(getattr(p, "key", p)) for p in path]
        if len(keys) >= 2 and keys[1] in RENAMES:
            new_root = RENAMES[keys[1]]
            flat_key = "/".join([new_root] + keys[2:])
            buckets[new_root][flat_key] = np.asarray(leaf)

    os.makedirs(out_dir, exist_ok=True)
    for root, arrays in buckets.items():
        if not arrays:
            print(f"warning: no {root} weights found")
            continue
        path = os.path.join(out_dir, f"{root}.npz")
        np.savez(path, **arrays)
        print(f"wrote {len(arrays)} arrays → {path}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    extract(sys.argv[1], sys.argv[2])
