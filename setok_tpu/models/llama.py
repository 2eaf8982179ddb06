"""LLaMA trunk (flax) — the Setokim language model backbone.

Parity: the reference rides HF `transformers.LlamaModel/LlamaForCausalLM`
(/root/reference/src/model/language_model/setokim_llama.py:24-57) with
flash-attn monkey patches (src/train/llama_flash_attn_monkey_patch.py).
The rebuild is a native implementation — RMSNorm, rotary embeddings, GQA
attention, SwiGLU MLP — shaped for TPU:

  * attention runs through one einsum path with an additive mask; padding
    *inside* the sequence is supported (multimodal splicing leaves masked
    holes — see setokim.py) by combining causal + validity masks and
    cumsum-derived positions;
  * a static-shape KV cache (B, max_len, kv_heads, head_dim) updated with
    `lax.dynamic_update_slice` makes the decode loop a single compiled graph;
  * tensor parallelism is a sharding rule on the param tree
    (parallel/sharding.py llama_tp_rules), not a code path.

Weights port from HF llama checkpoints via scripts/port_weights.py.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from setok_tpu.config import LlamaConfig

NEG_INF = -1e30


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           self.param_dtype)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps)
        return (y * scale.astype(jnp.float32)).astype(self.dtype)


def rope_tables(positions: jnp.ndarray, head_dim: int,
                theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for the given positions: (..., L, head_dim/2)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2,
                                           dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, L, H, D). HF 'rotate_half' convention (pairs are (i, i+D/2))."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos[..., None, :]   # (B, L, 1, D/2)
    sin = sin[..., None, :]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                           axis=-1).astype(x.dtype)


class KVCache(NamedTuple):
    k: jnp.ndarray        # (layers, B, max_len, kv_heads, head_dim)
    v: jnp.ndarray
    length: jnp.ndarray   # () int32 — filled positions ((B,) per-slot
                          # write offsets in serving/continuous batching)
    # int8 cache (k/v dtype int8): per-written-token symmetric scales,
    # (layers, B, max_len, kv_heads) f32. Decode attention is
    # cache-READ-bandwidth-bound (engine.py cache_dtype note), so cache
    # bytes set its speed: int8+scales is ~51% of bf16 traffic. None for
    # float caches.
    k_scale: Any = None
    v_scale: Any = None


def init_cache(cfg: LlamaConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    # distinct buffers (not one aliased array): donated caches may not
    # contain the same buffer twice
    sc = (lambda: jnp.zeros(shape[:-1], jnp.float32)) \
        if dtype == jnp.int8 else (lambda: None)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   length=jnp.zeros((), jnp.int32),
                   k_scale=sc(), v_scale=sc())


def _dense_factory(weight_bits: int, dtype, param_dtype,
                   quant_group: int = 0):
    """Trunk linear constructor for the weight-at-rest precision.

    16 → plain Dense; 8 → QuantDense (w8a8 kernel, reference `load_8bit`,
    builder.py:32-41); 4 → Quant4Dense (packed-nibble w4a8, reference
    `load_4bit` — RTN int4, see ops/blocks.Quant4Dense for the NF4
    non-goal argument)."""
    if weight_bits == 8:
        from setok_tpu.ops.blocks import QuantDense
        return lambda feats, name: QuantDense(feats, dtype=dtype, name=name)
    if weight_bits == 4:
        from setok_tpu.ops.blocks import Quant4Dense
        return lambda feats, name: Quant4Dense(feats, dtype=dtype,
                                               quant_group=quant_group,
                                               name=name)
    assert weight_bits == 16, weight_bits
    return lambda feats, name: nn.Dense(feats, use_bias=False, dtype=dtype,
                                        param_dtype=param_dtype, name=name)


class LlamaAttention(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = False     # Pallas fused kernel (kernels/flash_attention)
    weight_bits: int = 16   # 8/4 = quantized-at-rest linears (ops/blocks)
    quant_group: int = 0    # int4 group size (0 = per-output-channel)
    # Sequence parallelism: a (data, seq) Mesh routes prefill/training
    # attention through the K/V ring (parallel/ring_attention.py) with the
    # sequence sharded over SEQ_AXIS. mask may then be None (no global
    # (L, L) mask is ever materialized); pass `valid` instead.
    ring_mesh: Any = None
    # Opt-in Pallas in-kernel-dequant decode attention over the int8 cache
    # (kernels/cache_attention.py). Off by default: the on-chip A/B
    # (perf/ab_int8_cache.py, PERF.md "int8 KV cache") measured XLA dequant
    # at 6.19 ms/step vs 11.09 for the kernel — XLA fuses the dequant fine
    # and the kernel's strided head-slab DMA costs 1.8x.
    cache_kernel: bool = False

    @nn.compact
    def __call__(self, x, mask, positions,
                 cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 cache_length: Optional[jnp.ndarray] = None,
                 valid: Optional[jnp.ndarray] = None):
        """x: (B, L, D); mask: (B, 1, L, S) additive-ready bool (True=attend);
        positions: (B, L). With a cache, keys/values cover S = max_len slots
        and new entries are written at [cache_length, cache_length+L)."""
        cfg = self.cfg
        b, l, _ = x.shape
        dense = _dense_factory(self.weight_bits, self.dtype,
                               self.param_dtype, self.quant_group)
        q = dense(cfg.num_heads * cfg.head_dim, "q_proj")(x)
        k = dense(cfg.num_kv_heads * cfg.head_dim, "k_proj")(x)
        v = dense(cfg.num_kv_heads * cfg.head_dim, "v_proj")(x)
        q = q.reshape(b, l, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, l, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, l, cfg.num_kv_heads, cfg.head_dim)

        cos, sin = rope_tables(positions, cfg.head_dim, cfg.rope_theta)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        new_cache_kv = None
        if cache_kv is not None:
            ck, cv, cks, cvs = cache_kv
            quant_cache = ck.dtype == jnp.int8
            if quant_cache:
                # int8 cache: symmetric per-token-per-head scales written
                # beside the data. Decode reads are what the cache costs
                # (B·S·layers·2·kv·dh bytes/token) — int8 halves them;
                # the dequant multiply fuses into the attention dots.
                ksc = jnp.maximum(jnp.max(jnp.abs(k), -1), 1e-8) / 127.0
                vsc = jnp.maximum(jnp.max(jnp.abs(v), -1), 1e-8) / 127.0
                kw = jnp.clip(jnp.round(k / ksc[..., None]),
                              -127, 127).astype(jnp.int8)
                vw = jnp.clip(jnp.round(v / vsc[..., None]),
                              -127, 127).astype(jnp.int8)
            else:
                kw, vw = k.astype(ck.dtype), v.astype(cv.dtype)
            start = cache_length
            if getattr(start, "ndim", 0) == 1:
                # per-row write columns (serving/continuous batching: each
                # slot appends at its own offset). Clamped scatter — rows
                # past the end (retired slots) write harmlessly into the
                # last column, which their cache_valid never marks.
                s_max = ck.shape[1] - l
                rows = jnp.arange(b)[:, None]
                cols = jnp.minimum(start, s_max)[:, None] + jnp.arange(l)
                ck = ck.at[rows, cols].set(kw)
                cv = cv.at[rows, cols].set(vw)
                if quant_cache:
                    cks = cks.at[rows, cols].set(ksc)
                    cvs = cvs.at[rows, cols].set(vsc)
            else:
                ck = jax.lax.dynamic_update_slice(ck, kw, (0, start, 0, 0))
                cv = jax.lax.dynamic_update_slice(cv, vw, (0, start, 0, 0))
                if quant_cache:
                    cks = jax.lax.dynamic_update_slice(
                        cks, ksc, (0, start, 0))
                    cvs = jax.lax.dynamic_update_slice(
                        cvs, vsc, (0, start, 0))
            from setok_tpu.kernels.cache_attention import fits_vmem
            # int8-cache decode default: dequantize with XLA and take the
            # standard attention path — the on-chip A/B measured this at
            # 6.19 ms/step vs 11.09 for the in-kernel-dequant Pallas path
            # (PERF.md "int8 KV cache"); XLA fuses `cache * scale` into the
            # dots without materializing a bf16 copy. The kernel stays
            # available behind `cache_kernel=True` for study.
            use_cache_kernel = (
                self.cache_kernel and quant_cache and l == 1
                and fits_vmem(ck.shape[1], cfg.head_dim, cfg.num_kv_heads,
                              interpret=jax.devices()[0].platform != "tpu"))
            if quant_cache and not use_cache_kernel:
                k = ck.astype(self.dtype) * cks[..., None].astype(self.dtype)
                v = cv.astype(self.dtype) * cvs[..., None].astype(self.dtype)
            elif not quant_cache:
                k, v = ck.astype(self.dtype), cv.astype(self.dtype)
            new_cache_kv = (ck, cv, cks, cvs)

        groups = cfg.num_heads // cfg.num_kv_heads
        if cache_kv is not None and use_cache_kernel:
            from setok_tpu.kernels.cache_attention import (
                int8_cache_decode_attention)
            interpret = jax.devices()[0].platform != "tpu"
            out = int8_cache_decode_attention(
                q[:, 0], ck, cks, cv, cvs, mask[:, 0, 0],
                1.0 / float(np.sqrt(cfg.head_dim)), interpret)[:, None]
            out = out.astype(self.dtype)
            out = out.reshape(b, l, cfg.num_heads * cfg.head_dim)
            out = dense(cfg.hidden_size, "o_proj")(out)
            return out, new_cache_kv
        if groups > 1:
            k = jnp.repeat(k, groups, axis=2)
            v = jnp.repeat(v, groups, axis=2)

        if self.ring_mesh is not None and cache_kv is None:
            from functools import partial as _partial
            from jax.sharding import PartitionSpec as P
            from setok_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS
            from setok_tpu.parallel.ring_attention import ring_attention
            if valid is None:
                valid = jnp.ones((b, l), bool)
            dspec = DATA_AXIS if b % self.ring_mesh.shape[DATA_AXIS] == 0 \
                else None
            qkv_spec = P(dspec, None, SEQ_AXIS, None)
            row_spec = P(dspec, SEQ_AXIS)
            scale = 1.0 / float(np.sqrt(cfg.head_dim))

            def _ring(qh, kh, vh, pos, val):
                return ring_attention(qh, kh, vh, SEQ_AXIS, causal=True,
                                      sm_scale=scale, positions=pos,
                                      valid=val)

            out = jax.shard_map(
                _ring, mesh=self.ring_mesh,
                in_specs=(qkv_spec, qkv_spec, qkv_spec, row_spec, row_spec),
                out_specs=qkv_spec,
                check_vma=False,
            )(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
              jnp.swapaxes(v, 1, 2), positions, valid)
            out = jnp.swapaxes(out, 1, 2).astype(self.dtype)
        elif self.use_flash and cache_kv is None:
            from setok_tpu.kernels.flash_attention import flash_attention
            interpret = jax.devices()[0].platform != "tpu"
            out = flash_attention(
                jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                jnp.swapaxes(v, 1, 2), mask[:, 0],
                1.0 / float(np.sqrt(cfg.head_dim)), 128, interpret)
            out = jnp.swapaxes(out, 1, 2).astype(self.dtype)
        else:
            attn = jnp.einsum("blhd,bshd->bhls", q, k) / jnp.sqrt(
                cfg.head_dim)
            attn = jnp.where(mask, attn.astype(jnp.float32), NEG_INF)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhls,bshd->blhd", attn, v)
        out = out.reshape(b, l, cfg.num_heads * cfg.head_dim)
        out = dense(cfg.hidden_size, "o_proj")(out)
        return out, new_cache_kv


class LlamaMLP(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    weight_bits: int = 16
    quant_group: int = 0

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dense = _dense_factory(self.weight_bits, self.dtype,
                               self.param_dtype, self.quant_group)
        gate = nn.silu(dense(cfg.intermediate_size, "gate_proj")(x))
        up = dense(cfg.intermediate_size, "up_proj")(x)
        return dense(cfg.hidden_size, "down_proj")(gate * up)


class LlamaBlock(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    weight_bits: int = 16
    quant_group: int = 0
    ring_mesh: Any = None
    cache_kernel: bool = False

    @nn.compact
    def __call__(self, x, mask, positions, cache_kv=None, cache_length=None,
                 valid=None):
        cfg = self.cfg
        h = RMSNorm(cfg.rms_norm_eps, self.dtype, self.param_dtype,
                    name="input_norm")(x)
        h, new_cache = LlamaAttention(cfg, self.dtype, self.param_dtype,
                                      use_flash=self.use_flash,
                                      weight_bits=self.weight_bits,
                                      quant_group=self.quant_group,
                                      ring_mesh=self.ring_mesh,
                                      cache_kernel=self.cache_kernel,
                                      name="attn")(h, mask, positions,
                                                   cache_kv, cache_length,
                                                   valid)
        x = x + h
        h = RMSNorm(cfg.rms_norm_eps, self.dtype, self.param_dtype,
                    name="post_attn_norm")(x)
        x = x + LlamaMLP(cfg, self.dtype, self.param_dtype,
                         weight_bits=self.weight_bits,
                         quant_group=self.quant_group, name="mlp")(h)
        return x, new_cache


def make_attention_mask(valid: jnp.ndarray, positions: jnp.ndarray,
                        cache_valid: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
    """(B, 1, L, S) boolean mask: causal in *position* order + validity.

    `valid`: (B, L) — query/key validity of the current chunk.
    `cache_valid`: (B, S_prefix) validity of cached positions; when given,
    keys = [cache (S slots); none] layout is handled by the caller passing
    the full-width validity instead.
    """
    q_pos = positions[:, :, None]
    if cache_valid is not None:
        k_valid = cache_valid
        s = k_valid.shape[1]
        k_pos = jnp.where(cache_valid,
                          jnp.cumsum(cache_valid.astype(jnp.int32),
                                     axis=1) - 1, s + 1)
        causal = q_pos >= k_pos[:, None, :]
        m = causal & valid[:, :, None] & k_valid[:, None, :]
    else:
        k_pos = positions[:, None, :]
        causal = q_pos >= k_pos
        m = causal & valid[:, :, None] & valid[:, None, :]
    return m[:, None, :, :]


class LlamaModel(nn.Module):
    """Embedding-in → hidden-out trunk (no LM head)."""

    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_flash: bool = False
    weight_bits: int = 16
    quant_group: int = 0
    ring_mesh: Any = None
    cache_kernel: bool = False

    @nn.compact
    def __call__(self, inputs_embeds: jnp.ndarray, mask: jnp.ndarray,
                 positions: jnp.ndarray,
                 cache: Optional[KVCache] = None,
                 valid: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, Optional[KVCache]]:
        cfg = self.cfg
        x = inputs_embeds.astype(self.dtype)
        block_cls = LlamaBlock
        if self.remat and cache is None:
            block_cls = nn.remat(LlamaBlock, static_argnums=())
        new_k, new_v, new_ks, new_vs = [], [], [], []
        for i in range(cfg.num_layers):
            cache_kv = None
            if cache is not None:
                cache_kv = (cache.k[i], cache.v[i],
                            None if cache.k_scale is None
                            else cache.k_scale[i],
                            None if cache.v_scale is None
                            else cache.v_scale[i])
            cache_len = cache.length if cache is not None else None
            x, updated = block_cls(cfg, self.dtype, self.param_dtype,
                                   self.use_flash, self.weight_bits,
                                   self.quant_group, self.ring_mesh,
                                   self.cache_kernel,
                                   name=f"layer_{i}")(x, mask, positions,
                                                      cache_kv, cache_len,
                                                      valid)
            if updated is not None:
                new_k.append(updated[0])
                new_v.append(updated[1])
                new_ks.append(updated[2])
                new_vs.append(updated[3])
        x = RMSNorm(cfg.rms_norm_eps, self.dtype, self.param_dtype,
                    name="final_norm")(x)
        new_cache = None
        if cache is not None:
            quant = new_ks and new_ks[0] is not None
            new_cache = KVCache(k=jnp.stack(new_k), v=jnp.stack(new_v),
                                length=cache.length
                                + jnp.asarray(inputs_embeds.shape[1],
                                              jnp.int32),
                                k_scale=(jnp.stack(new_ks) if quant
                                         else None),
                                v_scale=(jnp.stack(new_vs) if quant
                                         else None))
        return x, new_cache


class LlamaForCausalLM(nn.Module):
    """Trunk + tied-or-separate LM head + token embedding table."""

    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_flash: bool = False
    weight_bits: int = 16
    quant_group: int = 0
    ring_mesh: Any = None
    cache_kernel: bool = False

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype)
        self.model = LlamaModel(cfg, self.dtype, self.param_dtype,
                                remat=self.remat, use_flash=self.use_flash,
                                weight_bits=self.weight_bits,
                                quant_group=self.quant_group,
                                ring_mesh=self.ring_mesh,
                                cache_kernel=self.cache_kernel)
        if not cfg.tie_embeddings:
            self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False,
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype)

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        # clamp both ends: negative multimodal sentinels (replaced later by
        # spliced features) and any out-of-vocab id (jnp.take would fill NaN)
        return self.embed_tokens(jnp.clip(input_ids, 0,
                                          self.cfg.vocab_size - 1))

    def logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.tie_embeddings:
            return self.embed_tokens.attend(hidden)
        return self.lm_head(hidden)

    def __call__(self, input_ids: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None,
                 cache: Optional[KVCache] = None):
        if valid is None:
            valid = jnp.ones(input_ids.shape, bool)
        positions = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
        x = self.embed(input_ids)
        if self.ring_mesh is not None and cache is None:
            # ring attention never materializes the (L, L) mask
            hidden, new_cache = self.model(x, None, positions, cache,
                                           valid=valid)
        else:
            mask = make_attention_mask(valid, positions)
            hidden, new_cache = self.model(x, mask, positions, cache)
        return self.logits(hidden), hidden, new_cache


_TRUNK_LINEARS = ("q_proj", "k_proj", "v_proj", "o_proj",
                  "gate_proj", "up_proj", "down_proj")


def valid_quant_group(cfg, group_size: int) -> int:
    """`group_size` if every trunk-linear input dim supports it (both the
    full K and the K/2 nibble plane must divide), else 0 (per-channel).
    Tiny test configs (hidden 64) always fall back."""
    if group_size <= 0:
        return 0
    for k in (cfg.hidden_size, cfg.intermediate_size,
              cfg.num_heads * cfg.head_dim):
        if k % (2 * group_size) != 0:
            return 0
    return group_size


def quantize_trunk_weights(params, bits: int = 8,
                           group_size: int = 0,
                           clip_search: int = 0,
                           row_weights=None):
    """Float LlamaForCausalLM params → the weight_bits={8,4} layout.

    Each trunk linear's {'kernel': (in, out) float} becomes, at bits=8,
    {'q': int8, 's': (1, out) f32} (per-output-channel symmetric — the
    layout `ops/blocks.QuantDense` declares) or, at bits=4, {'p': int8
    (in//2, out) packed nibbles, 's': (1, out) f32} (ops/blocks.
    Quant4Dense). Embeddings, norms, and lm_head stay float. Works on
    the LlamaForCausalLM subtree or any tree containing it.
    Parity: the reference's `load_8bit`/`load_4bit` (builder.py:32-41,
    bnb Int8Params/NF4) — recast as an offline tree transform."""
    from setok_tpu.kernels.quant_matmul import (quantize_weight,
                                                quantize_weight_int4)

    from collections.abc import Mapping
    assert bits in (8, 4), bits

    def convert(kernel, path):
        if bits == 8:
            qw = quantize_weight(kernel)
            return {"q": qw.values, "s": qw.scales}
        rw = None
        if row_weights:
            from setok_tpu.serve.calibrate import lookup_row_weight
            rw = lookup_row_weight(row_weights, path)
        qw = quantize_weight_int4(kernel,
                                  group_size=group_size or None,
                                  clip_search=clip_search,
                                  row_weight=rw)
        return {"p": qw.packed, "s": qw.scales}

    def walk(node, path=()):
        if not isinstance(node, Mapping):
            return node
        out = {}
        for k, v in node.items():
            if (k in _TRUNK_LINEARS and isinstance(v, dict)
                    and "kernel" in v and getattr(v["kernel"], "ndim", 0) == 2):
                out[k] = convert(v["kernel"], path + (k,))
            else:
                out[k] = walk(v, path + (k,))
        return out

    return walk(jax.tree_util.tree_map(lambda x: x, params))
