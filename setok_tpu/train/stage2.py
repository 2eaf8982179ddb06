"""Stage-2/3 Setokim training: multimodal CE + MAR diffusion loss.

Parity: /root/reference/src/train/train_setokim.py:217-447 +
setokim_trainer.py. The reference's staged-freezing story — freeze the LLaMA
backbone (256-257), tune only the mm projectors with their own LRs
(setokim_trainer.py:166-199), LoRA-wrap the trunk (272-288) — maps to one
mechanism here: an optax.multi_transform over path-derived labels
('main' / 'proj_in' / 'proj_out' / 'frozen'), with LoRA as a separate
trainable tree beside the frozen base (train/lora.py).

The step is global/GSPMD like stage-1: batch sharded over `data`, params
FSDP- or TP-sharded by the rules in parallel/sharding.py; XLA inserts the
ZeRO-style collectives.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from setok_tpu.config import SetokimConfig, TrainConfig
from setok_tpu.models.setokim import Setokim
from setok_tpu.train.lora import apply_lora, default_target_filter, init_lora
from setok_tpu.train.qlora import (apply_overlay, dequantize, extract_overlay,
                                   quantize_base)


class Stage2State(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any                 # full model params (base when LoRA on)
    lora: Optional[Any]         # LoRA tree or None
    opt_state: Any
    qscales: Optional[Any] = None   # QLoRA: per-kernel int8 scales


@dataclasses.dataclass(eq=False)
class Stage2Trainer:
    cfg: SetokimConfig
    train_cfg: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    target_token_id: int = 3
    pad_token_id: int = 0     # real tokenizers' pad id (setokim_arch.py:221)
    # freezing flags (parity: training_utils.py:103-141 + ModelArguments)
    freeze_backbone: bool = False
    tune_mm_in_mlp_adapter: bool = False
    tune_mm_out_mlp_adapter: bool = False
    freeze_mm_in_mlp_adapter: bool = False
    freeze_mm_out_mlp_adapter: bool = False
    unfreeze_mm_vision_tower: bool = False
    mm_in_projector_lr: Optional[float] = None
    mm_out_projector_lr: Optional[float] = None
    # LoRA (parity: lora_enable/lora_r/lora_alpha, training_utils.py:134-139)
    lora_enable: bool = False
    lora_r: int = 64
    lora_alpha: float = 16.0
    # QLoRA: int8 frozen base + LoRA (train/qlora.py — the TPU-native
    # answer to the reference's bitsandbytes 4/8-bit path,
    # train_setokim.py:228-244)
    quant_base: bool = False
    use_flash: bool = False   # Pallas flash attention in the LLaMA trunk
    # 8 = int8 block-quantized adam moments for every trainable param
    # EXCEPT embedding tables, which stay fp32 — exactly the reference's
    # Adam8bit + GlobalOptimManager embedding carve-out
    # (setok_trainer.py:164-181). train/opt8.py.
    optim_bits: int = 32
    # sequence parallelism: a (data, seq) Mesh (parallel/mesh.make_sp_mesh)
    # routes trunk attention through the K/V ring — long-context training
    # where one device cannot hold the (L, L) score matrix
    ring_mesh: Any = None

    def __post_init__(self):
        if self.quant_base and not self.lora_enable:
            raise ValueError("quant_base (QLoRA) requires lora_enable: the "
                             "int8 base is frozen; adapters carry training")
        # mixed precision: bf16 activations, fp32 params/optimizer (parity:
        # bf16/fp16 flags, train_setokim.py:223-250) — mirrors stage-1
        dtype = jnp.dtype(self.train_cfg.compute_dtype)
        param_dtype = jnp.dtype(self.train_cfg.param_dtype)
        self.model = Setokim(self.cfg, target_token_id=self.target_token_id,
                             pad_token_id=self.pad_token_id,
                             dtype=dtype, param_dtype=param_dtype,
                             remat=self.train_cfg.remat,
                             use_flash=self.use_flash,
                             ring_mesh=self.ring_mesh)
        tc = self.train_cfg
        warmup = min(tc.warmup_steps, max(tc.total_steps - 1, 0))
        sched = optax.warmup_cosine_decay_schedule(
            0.0, tc.learning_rate, warmup, tc.total_steps)

        def adamw(lr):
            return optax.adamw(lr, b1=tc.beta1, b2=tc.beta2,
                               weight_decay=tc.weight_decay)

        if self.optim_bits == 8:
            from setok_tpu.train.opt8 import adam8bit
            opt = lambda lr: adam8bit(lr, b1=tc.beta1, b2=tc.beta2)
        else:
            opt = adamw
        self._tx = optax.multi_transform(
            {"main": opt(sched),
             "embed32": adamw(sched),      # embeddings always fp32 moments
             "proj_in": opt(self.mm_in_projector_lr or tc.learning_rate),
             "proj_out": opt(self.mm_out_projector_lr or tc.learning_rate),
             "lora": opt(sched),
             "frozen": optax.set_to_zero()},
            self._labels)
        if tc.max_grad_norm > 0:
            # Parity: HF Trainer's default max_grad_norm=1.0 clip. Frozen
            # leaves are excluded from the norm (HF never sees grads for
            # requires_grad=False params; here they exist until
            # set_to_zero drops them, so the mask keeps the norms equal).
            def _not_frozen(tree):
                return jax.tree.map(lambda l: l != "frozen",
                                    self._labels(tree))
            self._tx = optax.chain(
                optax.masked(optax.clip_by_global_norm(tc.max_grad_norm),
                             _not_frozen),
                self._tx)
        if tc.grad_accum_steps > 1:
            # HF gradient_accumulation_steps equivalent: k micro-batches
            # accumulate (mean) before one optimizer update; the schedule
            # advances per UPDATE, so lr semantics match the reference's
            # per-effective-batch stepping
            self._tx = optax.MultiSteps(
                self._tx, every_k_schedule=tc.grad_accum_steps)

    # ------------------------------------------------------------------
    def _label_of(self, name: str, in_lora_tree: bool) -> str:
        if in_lora_tree:
            return "lora"
        if "vision_tower" in name:
            return "main" if self.unfreeze_mm_vision_tower else "frozen"
        if "vision_generator" in name:
            return "frozen"          # stage-1 pretrained, frozen here
        if "mm_in_projector" in name:
            return ("frozen" if self.freeze_mm_in_mlp_adapter
                    else "proj_in")
        if "mm_out_projector" in name:
            return ("frozen" if self.freeze_mm_out_mlp_adapter
                    else "proj_out")
        if "diffloss" in name:
            return "main"
        # LLaMA trunk + embeddings + lm head
        adapters_only = (self.tune_mm_in_mlp_adapter
                         or self.tune_mm_out_mlp_adapter)
        if self.freeze_backbone or adapters_only or self.lora_enable:
            return "frozen"
        if self.optim_bits == 8 and "embed_tokens" in name:
            return "embed32"              # reference fp32 carve-out
        return "main"

    def _labels(self, tree):
        has_lora = isinstance(tree, dict) and "lora" in tree

        def walk(path, _):
            name = jax.tree_util.keystr(path)
            in_lora = has_lora and name.startswith("['lora']")
            return self._label_of(name, in_lora)

        return jax.tree_util.tree_map_with_path(walk, tree)

    # ------------------------------------------------------------------
    def create_state(self, rng: jax.Array, batch: Dict[str, Any]
                     ) -> Stage2State:
        k_init, k_lora, k_diff = jax.random.split(rng, 3)
        params = self.model.init(
            k_init, jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["comp_image"]), jnp.asarray(batch["labels"]),
            jnp.asarray(batch["gen_image"]), k_diff,
            method=self.model.init_all)
        lora = None
        if self.lora_enable:
            lora = init_lora(params, k_lora, self.lora_r,
                             default_target_filter)
        if self.quant_base:
            params, qscales = quantize_base(params, default_target_filter)
            overlay = extract_overlay(params, self._wants_training)
            tp = {"params": overlay, "lora": lora}
            return Stage2State(step=jnp.zeros((), jnp.int32), params=params,
                               lora=lora, opt_state=self._tx.init(tp),
                               qscales=qscales)
        tp = {"params": params, "lora": lora} if lora is not None else \
            {"params": params}
        return Stage2State(step=jnp.zeros((), jnp.int32), params=params,
                           lora=lora, opt_state=self._tx.init(tp))

    def _wants_training(self, name: str, leaf) -> bool:
        """QLoRA overlay membership: float leaves whose label trains."""
        return (jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
                and self._label_of(name, False) != "frozen")

    def _effective_params(self, params, lora, qscales=None):
        if qscales is not None:
            params = dequantize(params, qscales,
                                jnp.dtype(self.train_cfg.compute_dtype))
        if lora is None:
            return params
        return apply_lora(params, lora, self.lora_alpha, self.lora_r)

    # ------------------------------------------------------------------
    def train_step(self, state: Stage2State, batch: Dict[str, Any],
                   rng: jax.Array) -> Tuple[Stage2State, Dict[str, Any]]:
        if self.quant_base:
            return self._train_step_qlora(state, batch, rng)
        return self._train_step_full(state, batch, rng)

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _train_step_qlora(self, state: Stage2State, batch: Dict[str, Any],
                          rng: jax.Array
                          ) -> Tuple[Stage2State, Dict[str, Any]]:
        """Differentiates only the float trainable overlay + LoRA; the int8
        base rides along as a constant and is dequantized at use."""
        drop_rng, diff_rng = jax.random.split(rng)
        ids = batch["input_ids"]
        labels = batch["labels"]
        comp = batch["comp_image"]
        gen = batch.get("gen_image")
        overlay = extract_overlay(state.params, self._wants_training)
        tp = {"params": overlay, "lora": state.lora}

        def loss_fn(tp):
            full = apply_overlay(state.params, tp["params"])
            p = self._effective_params(full, tp["lora"], state.qscales)
            out = self.model.apply(p, ids, comp, labels, gen, diff_rng,
                                   deterministic=False,
                                   rngs={"dropout": drop_rng})
            metrics = {"lm_loss": out.lm_loss, "diff_loss": out.diff_loss,
                       "total_loss": out.loss}
            return out.loss, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(tp)
        updates, opt_state = self._tx.update(grads, state.opt_state, tp)
        tp = optax.apply_updates(tp, updates)
        params = apply_overlay(state.params, tp["params"])
        return state.replace(step=state.step + 1, params=params,
                             lora=tp["lora"], opt_state=opt_state), metrics

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _train_step_full(self, state: Stage2State, batch: Dict[str, Any],
                         rng: jax.Array) -> Tuple[Stage2State, Dict[str, Any]]:
        drop_rng, diff_rng = jax.random.split(rng)
        ids = batch["input_ids"]
        labels = batch["labels"]
        comp = batch["comp_image"]
        gen = batch.get("gen_image")

        def loss_fn(tp):
            p = self._effective_params(tp["params"], tp.get("lora"))
            out = self.model.apply(p, ids, comp, labels, gen, diff_rng,
                                   deterministic=False,
                                   rngs={"dropout": drop_rng})
            metrics = {"lm_loss": out.lm_loss, "diff_loss": out.diff_loss,
                       "total_loss": out.loss}
            return out.loss, metrics

        tp = ({"params": state.params, "lora": state.lora}
              if state.lora is not None else {"params": state.params})
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(tp)
        updates, opt_state = self._tx.update(grads, state.opt_state, tp)
        tp = optax.apply_updates(tp, updates)
        return state.replace(step=state.step + 1, params=tp["params"],
                             lora=tp.get("lora"),
                             opt_state=opt_state), metrics

    # ------------------------------------------------------------------
    def merged_params(self, state: Stage2State):
        """LoRA-merged full params (merge_lora_weights.py equivalent).
        In QLoRA mode the int8 base dequantizes first, so the merged tree
        is a plain float checkpoint servable by models/builder.py."""
        return self._effective_params(state.params, state.lora,
                                      state.qscales)
