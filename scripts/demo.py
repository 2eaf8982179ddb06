#!/usr/bin/env python
"""End-to-end demo: tokenize an image, reconstruct it, chat about it, and
generate an image back — the full SeTok + Setokim loop on one page.

Runs with random weights out of the box (--tiny) as a living example of the
public API; point --checkpoint at trained weights for real outputs.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", default=None, help="input image path")
    p.add_argument("--prompt", default="Describe the image.")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--tiny", action="store_true", default=True)
    p.add_argument("--max-new-tokens", type=int, default=8)
    p.add_argument("--cpu", action="store_true")
    from setok_tpu.utils.compile_cache import (add_cli_flag,
                                               enable_compilation_cache)
    add_cli_flag(p)
    args = p.parse_args()
    enable_compilation_cache(args.compile_cache)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from setok_tpu import config as cfgs
    from setok_tpu.constants import IMAGE_TOKEN_INDEX
    from setok_tpu.data.image_processing import GeneratorImageProcessor
    from setok_tpu.models.builder import load_pretrained_model
    from setok_tpu.models.generate import generate_image, generate_text
    from setok_tpu.utils.metrics import psnr

    model, params = load_pretrained_model(args.checkpoint, tiny=args.tiny)
    cfg = model.cfg
    size = cfg.tokenizer.vit.image_size

    if args.image:
        from PIL import Image
        img = GeneratorImageProcessor(size=size)(Image.open(args.image))
    else:
        rs = np.random.RandomState(0)
        img = (rs.rand(size, size, 3) * 2 - 1).astype(np.float32)
    images = jnp.asarray(img)[None]

    # 1) tokenize → concept tokens
    tok = model.apply(params, images, method=model.tokenize)
    print(f"[tokenize] {int(tok.num_clusters[0])} concept tokens "
          f"(k_max={cfg.tokenizer.k_max})")

    # 2) reconstruct through the detokenizer
    det = model.apply(params, tok.tokens, tok.token_valid,
                      method=model.detokenize)
    print(f"[reconstruct] psnr={float(psnr(det.image, images)):.2f} dB")

    # 3) chat: prompt + image slots → greedy decode
    k_max = cfg.tokenizer.k_max
    ids = np.zeros((1, k_max + 8), np.int64)
    ids[0, 0] = 1
    ids[0, 1:1 + k_max] = IMAGE_TOKEN_INDEX
    ids[0, 1 + k_max:1 + k_max + 4] = [11, 12, 13, 14]  # toy prompt ids
    out = generate_text(model, params, jnp.asarray(ids), images,
                        max_new_tokens=args.max_new_tokens, eos_id=-1)
    print(f"[generate] token ids: {np.asarray(out.tokens)[0].tolist()}")

    # 4) image generation from the last hidden span (MaskGIT + diffusion)
    span = out.hidden[:, -min(args.max_new_tokens, 4):]
    gen = generate_image(model, params, span, jax.random.PRNGKey(0),
                         num_iter=4)
    print(f"[image-gen] rendered {gen.shape} image, "
          f"finite={bool(np.isfinite(np.asarray(gen)).all())}")


if __name__ == "__main__":
    main()
