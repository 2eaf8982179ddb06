#!/usr/bin/env python
"""Port pretrained torch checkpoints into setok_tpu flax param trees.

Parity: the reference pulls its backbones straight from HF hub at runtime —
SigLIP ('google/siglip-so400m-patch14-384', setok/clip_encoder.py:29-38),
BERT for the Q-Former mapper (detokenizer.py:80-96), VGG16+LPIPS lin heads
(loss/perceptual.py:25-52), and Vicuna/LLaMA (builder.py:97-123). This
environment is zero-egress, so porting is an offline step: point this script
at local checkpoint files (HF cache dirs, .safetensors, .pth/.bin state
dicts) and it writes .npz subtrees that `setok_tpu.utils.checkpoint.
load_subtree` splices into a model.

Mappings (torch name → flax path):
  SigLIP vision tower → setok_tpu.models.vit.ViT
  hf llama            → setok_tpu.models.llama.LlamaForCausalLM
  torchvision vgg16   → setok_tpu.losses.lpips.VGG16Features (+ lin heads)
  bert (stripped)     → setok_tpu.models.qformer.QFormer

Usage:
  python scripts/port_weights.py siglip  /path/to/pytorch_model.bin out.npz
  python scripts/port_weights.py llama   /path/to/llama out.npz
  python scripts/port_weights.py vgg16   /path/to/vgg16.pth out.npz
  python scripts/port_weights.py qformer /path/to/bert.bin out.npz
"""

import os
import sys
from typing import Dict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .bin/.pth/.safetensors state dict into numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


def _t(x):
    """torch Linear weight (out, in) → flax kernel (in, out)."""
    return np.ascontiguousarray(np.asarray(x).T)


def port_siglip_vision(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """HF SiglipVisionModel → ViT param paths (as flat 'a/b/c' keys)."""
    p = "vision_model."
    out: Dict[str, np.ndarray] = {}
    # conv patch embed: torch (out, in, kh, kw) → flax (kh, kw, in, out)
    w = sd[p + "embeddings.patch_embedding.weight"]
    out["patch_embed/kernel"] = np.transpose(w, (2, 3, 1, 0))
    out["patch_embed/bias"] = sd[p + "embeddings.patch_embedding.bias"]
    out["pos_embed"] = sd[p + "embeddings.position_embedding.weight"][None]
    i = 0
    while f"{p}encoder.layers.{i}.layer_norm1.weight" in sd:
        q = f"{p}encoder.layers.{i}."
        b = f"block_{i}/"
        out[b + "norm1/scale"] = sd[q + "layer_norm1.weight"]
        out[b + "norm1/bias"] = sd[q + "layer_norm1.bias"]
        out[b + "norm2/scale"] = sd[q + "layer_norm2.weight"]
        out[b + "norm2/bias"] = sd[q + "layer_norm2.bias"]
        # fused qkv: concat HF's separate q/k/v
        qw = sd[q + "self_attn.q_proj.weight"]
        kw = sd[q + "self_attn.k_proj.weight"]
        vw = sd[q + "self_attn.v_proj.weight"]
        out[b + "attn/qkv/kernel"] = _t(np.concatenate([qw, kw, vw], 0))
        out[b + "attn/qkv/bias"] = np.concatenate(
            [sd[q + "self_attn.q_proj.bias"],
             sd[q + "self_attn.k_proj.bias"],
             sd[q + "self_attn.v_proj.bias"]], 0)
        out[b + "attn/proj/kernel"] = _t(sd[q + "self_attn.out_proj.weight"])
        out[b + "attn/proj/bias"] = sd[q + "self_attn.out_proj.bias"]
        out[b + "mlp/fc1/kernel"] = _t(sd[q + "mlp.fc1.weight"])
        out[b + "mlp/fc1/bias"] = sd[q + "mlp.fc1.bias"]
        out[b + "mlp/fc2/kernel"] = _t(sd[q + "mlp.fc2.weight"])
        out[b + "mlp/fc2/bias"] = sd[q + "mlp.fc2.bias"]
        i += 1
    return out


def port_llama(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """HF LlamaForCausalLM → LlamaForCausalLM param paths."""
    out: Dict[str, np.ndarray] = {}
    out["embed_tokens/embedding"] = sd["model.embed_tokens.weight"]
    if "lm_head.weight" in sd:
        out["lm_head/kernel"] = _t(sd["lm_head.weight"])
    out["model/final_norm/scale"] = sd["model.norm.weight"]
    i = 0
    while f"model.layers.{i}.input_layernorm.weight" in sd:
        q = f"model.layers.{i}."
        b = f"model/layer_{i}/"
        out[b + "input_norm/scale"] = sd[q + "input_layernorm.weight"]
        out[b + "post_attn_norm/scale"] = sd[
            q + "post_attention_layernorm.weight"]
        for proj in ["q_proj", "k_proj", "v_proj", "o_proj"]:
            out[b + f"attn/{proj}/kernel"] = _t(
                sd[q + f"self_attn.{proj}.weight"])
        for proj in ["gate_proj", "up_proj", "down_proj"]:
            out[b + f"mlp/{proj}/kernel"] = _t(sd[q + f"mlp.{proj}.weight"])
        i += 1
    return out


def port_vgg16(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """torchvision vgg16 features → VGG16Features conv paths."""
    out: Dict[str, np.ndarray] = {}
    conv_idx = 0
    for k in sorted(sd, key=lambda s: [int(t) if t.isdigit() else t
                                       for t in s.split(".")]):
        if k.startswith("features.") and k.endswith(".weight") \
                and sd[k].ndim == 4:
            out[f"conv_{conv_idx}/kernel"] = np.transpose(
                sd[k], (2, 3, 1, 0))
            out[f"conv_{conv_idx}/bias"] = sd[k.replace(".weight", ".bias")]
            conv_idx += 1
    return out


def port_lpips_lins(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """taming LPIPS lin heads (lin0..lin4.model.1.weight 1×1 convs)."""
    out = {}
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in sd:
                out[f"lin_{i}/kernel"] = np.transpose(sd[key], (2, 3, 1, 0))
    return out


def port_qformer_bert(sd: Dict[str, np.ndarray],
                      num_layers: int = 6,
                      cross_attention_freq: int = 2
                      ) -> Dict[str, np.ndarray]:
    """HF bert-base → QFormer paths (the stripped executed subset only:
    self-attn, query FFN re-using BERT's FFN init, embedding LayerNorm).
    Cross-attention weights have no BERT counterpart (fresh in BLIP-2 too).
    """
    pre = "bert." if any(k.startswith("bert.") for k in sd) else ""
    out: Dict[str, np.ndarray] = {}
    out["embed_norm/scale"] = sd[pre + "embeddings.LayerNorm.weight"]
    out["embed_norm/bias"] = sd[pre + "embeddings.LayerNorm.bias"]
    for i in range(num_layers):
        q = f"{pre}encoder.layer.{i}."
        b = f"layer_{i}/"
        m = {
            "self_attn/query": "attention.self.query",
            "self_attn/key": "attention.self.key",
            "self_attn/value": "attention.self.value",
            "self_attn/out": "attention.output.dense",
            "ffn_in": "intermediate.dense",
            "ffn_out": "output.dense",
        }
        for ours, theirs in m.items():
            out[b + ours + "/kernel"] = _t(sd[q + theirs + ".weight"])
            out[b + ours + "/bias"] = sd[q + theirs + ".bias"]
        out[b + "self_attn/out_norm/scale"] = sd[
            q + "attention.output.LayerNorm.weight"]
        out[b + "self_attn/out_norm/bias"] = sd[
            q + "attention.output.LayerNorm.bias"]
        out[b + "ffn_norm/scale"] = sd[q + "output.LayerNorm.weight"]
        out[b + "ffn_norm/bias"] = sd[q + "output.LayerNorm.bias"]
    return out


PORTERS = {
    "siglip": port_siglip_vision,
    "llama": port_llama,
    "vgg16": port_vgg16,
    "lpips_lins": port_lpips_lins,
    "qformer": port_qformer_bert,
}


def main():
    if len(sys.argv) != 4 or sys.argv[1] not in PORTERS:
        print(__doc__)
        sys.exit(1)
    kind, src, dst = sys.argv[1:4]
    sd = load_state_dict(src)
    out = PORTERS[kind](sd)
    np.savez(dst, **out)
    print(f"ported {len(out)} arrays → {dst}")
    for k in list(out)[:5]:
        print(" ", k, out[k].shape)


if __name__ == "__main__":
    main()
