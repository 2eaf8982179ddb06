"""Inference model loader — assemble a Setokim (or SeTok) from checkpoints.

Parity: /root/reference/src/model/builder.py:26-145 `load_pretrained_model`:
full-model path, LoRA path (non-LoRA trainables + adapter merge, 52-86),
projector-only path (87-96), and the vision-tower load + context length
plumbing (124-143). Quantized (4/8-bit bitsandbytes) loading has no TPU
equivalent and is intentionally out of scope (SURVEY.md §2.6: "NF4: out of
scope v1").

Checkpoint layout convention (written by the trainers/CLIs):
  <dir>/checkpoints/<step>/            orbax full-state checkpoints
  <dir>/mm_projector.npz               adapter-only subtree saves
  <dir>/lora.npz                       flat LoRA tree (a/b factors)
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import numpy as np
import jax

from setok_tpu import config as cfgs
from setok_tpu.models.setokim import Setokim
from setok_tpu.train.lora import merge_lora
from setok_tpu.utils import checkpoint as ckpt
from setok_tpu.utils.checkpoint import load_subtree


def _init_params(model: Setokim, cfg: cfgs.SetokimConfig):
    import jax.numpy as jnp
    from setok_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
    k_max = cfg.tokenizer.k_max
    size = cfg.tokenizer.vit.image_size
    ids = np.zeros((1, 2 + k_max), np.int64)
    ids[:, 0] = 1
    ids[:, 1:1 + k_max] = IMAGE_TOKEN_INDEX
    labels = np.full_like(ids, IGNORE_INDEX)
    img = jnp.zeros((1, size, size, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(0), jnp.asarray(ids), img,
                      jnp.asarray(labels), img, jax.random.PRNGKey(1),
                      method=model.init_all)


def load_pretrained_model(model_path: str,
                          model_cfg: Optional[cfgs.SetokimConfig] = None,
                          lora_path: Optional[str] = None,
                          lora_r: int = 64, lora_alpha: float = 16.0,
                          projector_path: Optional[str] = None,
                          target_token_id: int = 3,
                          pad_token_id: int = 0,
                          tiny: bool = False,
                          bits: int = 16,
                          quant_group: int = 128,
                          clip_search: int = 8) -> Tuple[Setokim, Any]:
    """Returns (model, params). `model_path` may be:
      * an orbax checkpoint dir (restores Stage2State.params), or
      * '' / nonexistent → fresh init (weights then spliced from
        `projector_path` / `lora_path`).

    bits=8/4: the LLaMA trunk is converted to int8/packed-int4 at rest
    after all splicing/merging (quantize_trunk_weights) and the returned
    model has `weight_bits` set — the reference's `load_8bit`/`load_4bit`
    serving modes (builder.py:32-41) on the TPU w8a8/w4a8 kernels.
    bits=4 scales are clip-searched by default (`clip_search=8` ratios;
    0 = plain absmax RTN) — a one-time load cost that cuts int4 error,
    see kernels/quant_matmul.quantize_weight_int4.
    """
    cfg = model_cfg or (cfgs.tiny_setokim() if tiny else cfgs.base_setokim())
    model = Setokim(cfg, target_token_id=target_token_id,
                    pad_token_id=pad_token_id)
    params = _init_params(model, cfg)

    if model_path:
        ckpt_dir = (model_path if ckpt.latest_step(model_path) is not None
                    else os.path.join(model_path, "checkpoints"))
        step = ckpt.latest_step(ckpt_dir)
        if step is not None:
            # lazy restore: read ONLY params/lora bytes — the optimizer
            # moments that dominate a training checkpoint never leave disk
            # (utils/checkpoint.restore_lazy; reference loads weight-only
            # state_dicts at inference, builder.py:22-47)
            restored = ckpt.restore_lazy(
                ckpt_dir, ckpt.root_predicate("params", "lora"), step)
            # Stage2State dict layout: {'step','params','lora','opt_state'}
            state_params = (restored.get("params")
                            if isinstance(restored, dict) else
                            restored.params)
            params = jax.tree.map(
                lambda a, b: jax.numpy.asarray(b, a.dtype)
                if hasattr(b, "shape") and a.shape == b.shape else a,
                params, state_params)
            lora_tree = (restored.get("lora")
                         if isinstance(restored, dict) else restored.lora)
            if lora_tree and jax.tree.leaves(lora_tree):
                params = merge_lora(params, lora_tree, lora_alpha, lora_r)

    if projector_path:
        # projector-only path (builder.py:87-96)
        params = load_subtree(projector_path, params)

    if lora_path and os.path.exists(lora_path):
        # external adapter file: flat {path: a/b} npz
        data = np.load(lora_path, allow_pickle=True)
        lora_tree = {}
        for key in data.files:
            path, ab = key.rsplit("/", 1)
            lora_tree.setdefault(path, {})[ab] = data[key]
        params = merge_lora(params, lora_tree, lora_alpha, lora_r)

    if bits in (8, 4):
        from setok_tpu.models.llama import (quantize_trunk_weights,
                                            valid_quant_group)
        gs = valid_quant_group(cfg.llama, quant_group) if bits == 4 else 0
        params = quantize_trunk_weights(
            params, bits=bits, group_size=gs,
            clip_search=clip_search if bits == 4 else 0)
        model = Setokim(cfg, target_token_id=target_token_id,
                        pad_token_id=pad_token_id, weight_bits=bits,
                        quant_group=gs)
    return model, params


def build_vision_tower(vision_tower_name: str,
                       tokenizer_cfg: Optional[cfgs.TokenizerConfig] = None,
                       **kw):
    """Encoder dispatch: only SigLIP-family names map to the SeTok
    tokenizer. Parity: multimodal_encoder/builder.py:6-22 (the reference
    raises for anything that isn't 'siglip'; its EVA/OpenCLIP towers are
    unreachable dead code, SURVEY.md §2.7)."""
    from setok_tpu.models.tokenizer import SetokTokenizer
    if "siglip" in vision_tower_name.lower():
        return SetokTokenizer(tokenizer_cfg or cfgs.base_tokenizer(), **kw)
    raise ValueError(f"Unknown vision tower: {vision_tower_name}")


def build_vision_generator(detokenizer_cfg: Optional[
        cfgs.DetokenizerConfig] = None, **kw):
    """Parity: multimodal_generator/builder.py:4-12 (always the SeTok
    detokenizer)."""
    from setok_tpu.models.detokenizer import SetokDeTokenizer
    return SetokDeTokenizer(detokenizer_cfg or cfgs.base_detokenizer(), **kw)


def get_obj_from_str(string: str, reload: bool = False):
    """Parity: src/model/utils.py:6-14."""
    import importlib
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def instantiate_from_config(config: dict):
    """Parity: src/model/utils.py:16-21 ({'target': ..., 'params': {...}})."""
    if "target" not in config:
        raise KeyError("Expected key `target` to instantiate.")
    return get_obj_from_str(config["target"])(**config.get("params", {}))


def make_delta(base_params: Any, target_params: Any) -> Any:
    """target − base weight deltas. Parity: src/model/make_delta.py."""
    return jax.tree.map(lambda t, b: t - b, target_params, base_params)


def apply_delta(base_params: Any, delta: Any) -> Any:
    """base + delta. Parity: src/model/apply_delta.py."""
    return jax.tree.map(lambda b, d: b + d, base_params, delta)


def consolidate(params: Any, dtype=np.float16) -> Any:
    """Cast a param tree for single-file export.
    Parity: src/model/consolidate.py (fp16 consolidation)."""
    return jax.tree.map(
        lambda x: jax.numpy.asarray(x, dtype) if hasattr(x, "shape") else x,
        params)
