"""Setokim MLLM: LLaMA trunk + SeTok vision modules + MAR generation head.

Parity: /root/reference/src/model/setokim_arch.py (module inventory +
multimodal splicing) and src/model/language_model/setokim_llama.py (forward
with CE + diffusion branch, MaskGIT sampling). Re-architected static-shaped:

  * **Splicing without dynamic shapes** (SURVEY.md §7 hard-part 3): the
    collator pre-expands each `<image>` into `k_max` slots holding the
    IMAGE_TOKEN_INDEX sentinel and each `<target>` into `target_num` slots
    of the `<target>` vocab token, padding to max_len. In-model, image-slot
    embeddings are gathered from the tokenizer's padded (k_max, D) output;
    slots beyond an image's actual cluster count are *masked out* of
    attention and positions are recomputed by cumsum over the valid mask —
    mathematically the packed variable-K sequence of the reference
    (setokim_arch.py:262-338), with holes instead of shifts.
  * **Diffusion branch** (setokim_llama.py:162-180): hidden states at
    `<target>` label positions condition the MAR head; the target latents
    are the gold image's concept tokens (the reference computes them in the
    dataloader, pairDataset.py:419 — here they come from the in-graph frozen
    tokenizer, one less host round-trip). The reference leaves the
    hidden→generator-space mapping incoherent (mm_out_projector is built but
    unused in the loss; unpatchify treats LLM hidden as pixels); this
    rebuild wires it coherently: z = mm_out_projector(hidden), diffloss
    denoises concept tokens, the detokenizer renders them.
  * **MaskGIT sampling** (setokim_llama.py:206-264): fixed-iteration
    cosine-schedule loop with full-width diffusion sampling and masked
    scatter — no `nonzero` indexing, one compiled graph.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from setok_tpu.config import SetokimConfig
from setok_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from setok_tpu.losses.diffloss import DiffLoss
from setok_tpu.models.detokenizer import SetokDeTokenizer
from setok_tpu.models.llama import (KVCache, LlamaForCausalLM, init_cache,
                                    make_attention_mask)
from setok_tpu.models.projector import build_projector
from setok_tpu.models.tokenizer import SetokTokenizer


class SetokimOutput(NamedTuple):
    loss: jnp.ndarray
    lm_loss: jnp.ndarray
    diff_loss: jnp.ndarray
    logits: jnp.ndarray
    hidden: jnp.ndarray
    valid: jnp.ndarray


def mask_by_order(mask_len: jnp.ndarray, orders: jnp.ndarray,
                  seq_len: int) -> jnp.ndarray:
    """(B,) mask_len + (B, S) orders → (B, S) bool: True for the first
    mask_len entries of each order. Parity: setokim_llama.py:32-35."""
    ranks = jnp.argsort(orders, axis=-1)       # position → its rank in order
    return ranks < mask_len[:, None]


class Setokim(nn.Module):
    cfg: SetokimConfig
    target_token_id: int = 3                  # vocab id of <target>
    pad_token_id: int = 0                     # tokenizer pad id (≠0 for real
    #   tokenizers; reference derives validity from it, setokim_arch.py:221)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_flash: bool = False                   # Pallas attention in the trunk
    weight_bits: int = 16                     # 8/4-at-rest trunk (serving)
    quant_group: int = 0                      # int4 group size (0 = chan)
    # sequence-parallel training: a (data, seq) mesh routes trunk attention
    # through the K/V ring (parallel/ring_attention.py); the global (L, L)
    # attention mask is never materialized (long-context, SURVEY §5)
    ring_mesh: Any = None
    # opt-in Pallas int8-cache decode kernel (measured slower than the XLA
    # dequant default — PERF.md "int8 KV cache"); kept for study
    cache_kernel: bool = False

    def setup(self):
        cfg = self.cfg
        self.llama = LlamaForCausalLM(cfg.llama, self.dtype,
                                      self.param_dtype, remat=self.remat,
                                      use_flash=self.use_flash,
                                      weight_bits=self.weight_bits,
                                      quant_group=self.quant_group,
                                      ring_mesh=self.ring_mesh,
                                      cache_kernel=self.cache_kernel)
        self.vision_tower = SetokTokenizer(cfg.tokenizer,
                                           freeze_backbone=True,
                                           dtype=self.dtype,
                                           param_dtype=self.param_dtype)
        self.mm_in_projector = build_projector(
            cfg.mm_in_projector_type, cfg.llama.hidden_size, self.dtype,
            self.param_dtype, name="mm_in_projector")
        # keyword args only: positional dtype would land in `quant8`
        self.vision_generator = SetokDeTokenizer(cfg.detokenizer,
                                                 dtype=self.dtype,
                                                 param_dtype=self.param_dtype)
        self.mm_out_projector = build_projector(
            cfg.mm_out_projector_type, cfg.diffloss.z_channels, self.dtype,
            self.param_dtype, name="mm_out_projector")
        self.diffloss = DiffLoss(cfg.diffloss, dtype=self.dtype,
                                 param_dtype=self.param_dtype)

    # ------------------------------------------------------------------
    def tokenize(self, images, *, deterministic=True):
        """Vision-tower concept tokens (SeTok encode). Parity:
        get_vision_tower() access, setokim_arch.py:191-192."""
        return self.vision_tower(images, deterministic=deterministic)

    def detokenize(self, tokens, token_valid=None, *, deterministic=True):
        """Render concept tokens to pixels (vision generator)."""
        return self.vision_generator(tokens, token_valid,
                                     deterministic=deterministic)

    def encode_images(self, images, *, deterministic=True):
        """images (N, H, W, 3) → (N, k_max, llama_hidden), valid (N, k_max).

        Parity: setokim_arch.py:206-211 (vision tower → mm_in_projector)."""
        tok = self.vision_tower(images, deterministic=deterministic)
        feats = self.mm_in_projector(tok.tokens)
        return feats, tok.token_valid

    def prepare_multimodal(self, input_ids, images, *, deterministic=True):
        """Static splice: returns (embeds, valid, positions).

        input_ids: (B, L) with IMAGE_TOKEN_INDEX at pre-reserved image slots
        (k_max per image, from the collator) and 0/pad elsewhere as needed.
        images: (B, H, W, 3) single image per sample, or (B, M, H, W, 3)
        multi-image — slot rank order matches image order (the reference
        splices image_features in encounter order, setokim_arch.py:287-299).
        """
        b, l = input_ids.shape
        k_max = self.cfg.tokenizer.k_max

        if images.ndim == 5:
            m = images.shape[1]
            flat = images.reshape(b * m, *images.shape[2:])
            f, v = self.encode_images(flat, deterministic=deterministic)
            img_feats = f.reshape(b, m * k_max, -1)
            img_valid = v.reshape(b, m * k_max)
            n_slots = m * k_max
        else:
            img_feats, img_valid = self.encode_images(
                images, deterministic=deterministic)      # (B, k_max, D)
            n_slots = k_max

        is_image = input_ids == IMAGE_TOKEN_INDEX          # (B, L)
        # rank of each image slot within its row: 0..n_slots-1
        slot_rank = jnp.cumsum(is_image.astype(jnp.int32), axis=1) - 1
        slot_rank = jnp.clip(slot_rank, 0, n_slots - 1)

        text_emb = self.llama.embed(input_ids)             # clips negatives
        gathered = jnp.take_along_axis(img_feats, slot_rank[..., None],
                                       axis=1)             # (B, L, D)
        embeds = jnp.where(is_image[..., None], gathered, text_emb)

        pad_valid = input_ids != self.pad_token_id
        slot_valid = jnp.take_along_axis(img_valid, slot_rank, axis=1)
        valid = jnp.where(is_image, slot_valid, pad_valid)
        positions = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
        return embeds, valid, positions

    # ------------------------------------------------------------------
    def __call__(self, input_ids, images=None, labels=None,
                 gen_images=None, rng: Optional[jax.Array] = None, *,
                 deterministic: bool = True) -> SetokimOutput:
        """Training/eval forward. Parity: setokim_llama.py:94-192.

        labels: (B, L) token ids with IGNORE_INDEX masking; `<target>` slots
        carry target_token_id (gathered for the diffusion branch, IGNOREd
        for CE — setokim_arch.py:344-345).
        gen_images: (B, H, W, 3) gold images for the generation loss.
        """
        if images is not None:
            embeds, valid, positions = self.prepare_multimodal(
                input_ids, images, deterministic=deterministic)
        else:
            valid = input_ids != self.pad_token_id
            positions = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
            embeds = self.llama.embed(input_ids)

        if self.ring_mesh is not None:
            # ring attention derives causality from positions/valid per
            # shard — no (B, 1, L, L) global mask tensor exists
            hidden, _ = self.llama.model(embeds, None, positions,
                                         valid=valid)
        else:
            mask = make_attention_mask(valid, positions)
            hidden, _ = self.llama.model(embeds, mask, positions)
        logits = self.llama.logits(hidden)

        lm_loss = jnp.zeros(())
        if labels is not None:
            is_target = labels == self.target_token_id
            ce_labels = jnp.where(is_target, IGNORE_INDEX, labels)
            # Shifted CE in the hole layout: the predictor of token j is the
            # LAST VALID position before j, not raw index j-1 — a hole (an
            # unused image slot / interior pad) right before a text token
            # must not contribute its garbage logits. This matches the
            # reference's packed layout, where the predictor is always the
            # preceding *real* token (setokim_llama.py:146-160).
            l_idx = jnp.arange(labels.shape[1])
            last_valid = jax.lax.cummax(
                jnp.where(valid, l_idx[None, :], -1), axis=1)   # (B, L)
            pred_idx = last_valid[:, :-1]                       # predictor of j+1
            shift_labels = ce_labels[:, 1:]
            shift_valid = (valid[:, 1:] & (shift_labels != IGNORE_INDEX)
                           & (pred_idx >= 0))
            pred_logits = jnp.take_along_axis(
                logits, jnp.maximum(pred_idx, 0)[..., None], axis=1)
            logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), -1)
            picked = jnp.take_along_axis(
                logp, jnp.maximum(shift_labels, 0)[..., None], -1)[..., 0]
            denom = jnp.maximum(jnp.sum(shift_valid), 1)
            lm_loss = -jnp.sum(picked * shift_valid) / denom

        diff_loss = jnp.zeros(())
        if gen_images is not None and labels is not None and rng is not None:
            diff_loss = self._diffusion_branch(hidden, labels, gen_images,
                                               rng,
                                               deterministic=deterministic)

        return SetokimOutput(loss=lm_loss + diff_loss, lm_loss=lm_loss,
                             diff_loss=diff_loss, logits=logits,
                             hidden=hidden, valid=valid)

    def init_all(self, input_ids, images, labels, gen_images, rng):
        """Init-time entry touching every submodule (the training forward
        never runs the detokenizer — its weights come from stage-1 in the
        reference, setokim_arch.py:124-170 — but its params must exist)."""
        out = self(input_ids, images, labels, gen_images, rng=rng)
        dummy = jnp.zeros((1, self.cfg.tokenizer.k_max,
                           self.cfg.detokenizer.token_feat_dim))
        self.vision_generator(dummy, None)
        return out

    # ------------------------------------------------------------------
    def _diffusion_branch(self, hidden, labels, gen_images, rng, *,
                          deterministic=True):
        """MAR loss over `<target>` positions. Parity:
        setokim_llama.py:162-180 + 65-92 (orders / truncnorm masking /
        diffusion_batch_mul)."""
        cfg = self.cfg
        b, l, _ = hidden.shape
        k_max = cfg.tokenizer.k_max
        assert cfg.target_num == k_max, (
            "target_num must equal tokenizer k_max so every concept token "
            "has a conditioning slot")
        is_target = labels == self.target_token_id            # (B, L)
        has_target = jnp.any(is_target, axis=1)               # (B,)

        # static gather of the first target_num target positions per row
        order = jnp.argsort(~is_target, axis=1, stable=True)  # targets first
        slots = order[:, :cfg.target_num]                     # (B, T)
        z = jnp.take_along_axis(hidden, slots[..., None], axis=1)
        z = self.mm_out_projector(z)                          # (B, T, zc)

        # gold concept tokens from the frozen tokenizer (dataloader-side in
        # the reference, pairDataset.py:419)
        gold = self.vision_tower(gen_images, deterministic=True)
        target = jax.lax.stop_gradient(gold.tokens)           # (B, T, C)
        target_valid = gold.token_valid                       # (B, T)

        r_order, r_rate, r_diff = jax.random.split(rng, 3)
        orders = jax.random.permutation(
            r_order, jnp.broadcast_to(jnp.arange(cfg.target_num),
                                      (b, cfg.target_num)),
            axis=1, independent=True)
        # truncnorm((min-1)/0.25, 0, loc=1, scale=0.25) — setokim_llama.py:78
        mr = cfg.diffloss.mask_ratio_min
        rate = jax.random.truncated_normal(
            r_rate, (mr - 1.0) / 0.25, 0.0, ()) * 0.25 + 1.0
        num_masked = jnp.ceil(cfg.target_num * rate).astype(jnp.int32)
        diff_mask = mask_by_order(
            jnp.full((b,), num_masked), orders, cfg.target_num)
        diff_mask = (diff_mask & target_valid
                     & has_target[:, None]).astype(jnp.float32)

        mul = cfg.diffloss.diffusion_batch_mul
        flat_t = jnp.tile(target.reshape(b * cfg.target_num, -1), (mul, 1))
        flat_z = jnp.tile(z.reshape(b * cfg.target_num, -1), (mul, 1))
        flat_m = jnp.tile(diff_mask.reshape(-1), (mul,))
        return self.diffloss(flat_t, flat_z, r_diff, flat_m)

    # ------------------------------------------------------------------
    # Generation
    def prefill(self, input_ids, images, max_len: int, *,
                cache_dtype=jnp.float32):
        """Run the spliced prompt through the trunk, build the KV cache.

        Returns (logits_last, hidden_last, cache, valid, positions)."""
        embeds, valid, positions = self.prepare_multimodal(input_ids, images)
        return self._prefill_trunk(embeds, valid, positions, max_len,
                                   cache_dtype)

    def prefill_text(self, input_ids, max_len: int, *,
                     cache_dtype=jnp.float32):
        """Text-only prefill: same contract as `prefill` but skips the
        vision tower entirely (serving fast-path for text-only requests —
        the reference's generate() also only encodes when images are
        passed, setokim_llama.py:285-300)."""
        valid = input_ids != self.pad_token_id
        positions = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
        embeds = self.llama.embed(input_ids)
        return self._prefill_trunk(embeds, valid, positions, max_len,
                                   cache_dtype)

    def _prefill_trunk(self, embeds, valid, positions, max_len, cache_dtype):
        b, l = valid.shape
        cache = init_cache(self.cfg.llama, b, max_len, dtype=cache_dtype)
        # key validity over the whole cache width: prompt part = valid,
        # future part filled during decode
        cache_valid = jnp.pad(valid, ((0, 0), (0, max_len - l)))
        mask = make_attention_mask(valid, positions, cache_valid=cache_valid)
        hidden, cache = self.llama.model(embeds, mask, positions, cache)
        logits = self.llama.logits(hidden)
        # index of the last valid *slot* (holes make it ≠ sum(valid)-1)
        last = l - 1 - jnp.argmax(valid[:, ::-1].astype(jnp.int32), axis=1)
        take = lambda x: jnp.take_along_axis(
            x, last[:, None, None], axis=1)[:, 0]
        return take(logits), take(hidden), cache, cache_valid, positions

    def decode_step(self, token_ids, cache: KVCache, cache_valid,
                    next_position):
        """One decode step: token_ids (B, 1) → (logits, hidden, new cache)."""
        b = token_ids.shape[0]
        embeds = self.llama.embed(token_ids)
        if getattr(cache.length, "ndim", 0) == 1:
            # per-slot write columns (serve/engine.py continuous batching);
            # OOB columns of retired slots drop (jnp scatter semantics)
            cache_valid = cache_valid.at[jnp.arange(b), cache.length].set(
                True, mode="drop")
        else:
            cache_valid = jax.lax.dynamic_update_slice(
                cache_valid, jnp.ones((b, 1), cache_valid.dtype),
                (0, cache.length))
        valid = jnp.ones((b, 1), bool)
        positions = next_position[:, None]
        mask = make_attention_mask(valid, positions, cache_valid=cache_valid)
        hidden, cache = self.llama.model(embeds, mask, positions, cache)
        return (self.llama.logits(hidden)[:, 0], hidden[:, 0], cache,
                cache_valid)

    def prefill_text_chunk(self, token_ids, cache: KVCache, cache_valid,
                           pos_offset):
        """One chunk of a chunked text-only prefill: token_ids (B, C) →
        (logits (B, C, V), hidden, cache, cache_valid).

        Prompts are left-aligned, so feeding them in fixed C-token chunks
        reproduces single-shot `prefill_text` exactly: the chunk is
        appended at [cache.length, cache.length+C) with pad slots marked
        invalid (the same pad holes the one-shot path leaves), positions
        continue from `pos_offset` (valid-token count of earlier chunks),
        and within-chunk causality rides `make_attention_mask`. Bounds
        prefill peak memory to O(C·S) instead of O(P·S) and admits
        prompts up to the cache width instead of the prompt_len bucket
        (serve/engine.py `prefill_chunk`). Beyond parity: the reference
        prefills via HF generate in one shot (setokim_llama.py:285-300)."""
        b, t = token_ids.shape
        chunk_valid = token_ids != self.pad_token_id
        embeds = self.llama.embed(token_ids)
        if getattr(cache.length, "ndim", 0) == 1:
            rows = jnp.arange(b)[:, None]
            cols = cache.length[:, None] + jnp.arange(t)[None, :]
            cache_valid = cache_valid.at[rows, cols].set(chunk_valid,
                                                         mode="drop")
        else:
            cache_valid = jax.lax.dynamic_update_slice(
                cache_valid, chunk_valid, (0, cache.length))
        positions = (pos_offset[:, None]
                     + jnp.cumsum(chunk_valid.astype(jnp.int32), axis=1) - 1)
        positions = jnp.maximum(positions, 0)
        mask = make_attention_mask(chunk_valid, positions,
                                   cache_valid=cache_valid)
        hidden, cache = self.llama.model(embeds, mask, positions, cache)
        return self.llama.logits(hidden), hidden, cache, cache_valid

    def verify_step(self, token_ids, cache: KVCache, cache_valid,
                    next_position):
        """Chunked decode for speculative verification: token_ids (B, T) =
        [current token, T-1 draft tokens] → (logits (B, T, V), hidden
        (B, T, H), cache, cache_valid). One forward scores every draft
        position (causal within the chunk, per-row cache append at
        [length, length+T)) — T tokens of logits for ONE weight-streaming
        pass, which is the whole speculative-decoding win in the
        HBM-bound decode regime. The caller rewinds `cache.length` and the
        chunk's `cache_valid` bits past the accepted prefix
        (serve/engine.py::_spec_step_impl); K/V written for rejected
        drafts become invalid and are overwritten by later appends.
        Beyond parity: the reference decodes strictly one token per
        forward (HF generate, setokim_llama.py:285-300)."""
        b, t = token_ids.shape
        embeds = self.llama.embed(token_ids)
        if getattr(cache.length, "ndim", 0) == 1:
            rows = jnp.arange(b)[:, None]
            cols = cache.length[:, None] + jnp.arange(t)[None, :]
            cache_valid = cache_valid.at[rows, cols].set(True, mode="drop")
        else:
            cache_valid = jax.lax.dynamic_update_slice(
                cache_valid, jnp.ones((b, t), cache_valid.dtype),
                (0, cache.length))
        valid = jnp.ones((b, t), bool)
        positions = next_position[:, None] + jnp.arange(t)[None, :]
        mask = make_attention_mask(valid, positions, cache_valid=cache_valid)
        hidden, cache = self.llama.model(embeds, mask, positions, cache)
        return self.llama.logits(hidden), hidden, cache, cache_valid

    def sample_image_tokens(self, cond, rng, num_iter: int = 16,
                            cfg_scale: float = 1.0, temperature: float = 1.0):
        """MaskGIT/MAR iterative decoding of concept tokens.

        cond: (B, T, H_llm) hidden states at the generation span.
        Returns (B, T, token_feat_dim) concept-token latents.
        Parity: setokim_llama.py:206-264, recast mask-scatter static.
        """
        b, seq_len, _ = cond.shape
        z_all = self.mm_out_projector(cond)                  # (B, T, zc)
        c_dim = self.cfg.diffloss.target_channels

        r_orders, rng = jax.random.split(rng)
        orders = jax.random.permutation(
            r_orders, jnp.broadcast_to(jnp.arange(seq_len), (b, seq_len)),
            axis=1, independent=True)

        tokens = jnp.zeros((b, seq_len, c_dim))
        mask = jnp.ones((b, seq_len), bool)
        for step in range(num_iter):
            ratio = jnp.cos(jnp.pi / 2.0 * (step + 1) / num_iter)
            mask_len = jnp.floor(seq_len * ratio)
            mask_len = jnp.maximum(
                1.0, jnp.minimum(jnp.sum(mask, axis=-1) - 1.0, mask_len))
            mask_next = mask_by_order(mask_len.astype(jnp.int32), orders,
                                      seq_len)
            if step >= num_iter - 1:
                mask_to_pred = mask
            else:
                mask_to_pred = jnp.logical_xor(mask, mask_next)
            mask = mask_next

            # CFG schedule follows Muse (linear) — setokim_llama.py:248-251;
            # cfg_iter is per-batch-row (mask_len varies), reference uses
            # mask_len[0]'s scalar — match that
            cfg_iter = 1.0 + (cfg_scale - 1.0) * (seq_len
                                                  - mask_len[0]) / seq_len
            rng, rk = jax.random.split(rng)
            flat_z = z_all.reshape(b * seq_len, -1)
            if cfg_scale != 1.0:
                flat_z = jnp.concatenate(
                    [flat_z, jnp.zeros_like(flat_z)], axis=0)
                sampled = self.diffloss.sample(flat_z, rk, temperature,
                                               cfg_iter, use_cfg=True)
                sampled = sampled[: b * seq_len]
            else:
                sampled = self.diffloss.sample(flat_z, rk, temperature, 1.0)
            sampled = sampled.reshape(b, seq_len, c_dim)
            tokens = jnp.where(mask_to_pred[..., None], sampled, tokens)
        return tokens

    def render_image(self, concept_tokens, token_valid=None, *,
                     deterministic=True):
        """Concept tokens → pixels via the detokenizer."""
        return self.vision_generator(concept_tokens, token_valid,
                                     deterministic=deterministic)
