"""Continuous-batching serving engine over the static KV cache.

The reference has no serving layer of its own — its `load_pretrained_model`
(/root/reference/src/model/builder.py:26-145) feeds single requests through
the HF `generate` loop, one batch at a time (the `src/utils.py` moderation/
controller constants are dead LLaVA-serving leftovers, SURVEY.md §2.7).
This module is the beyond-parity production-serving story (ROADMAP item 10),
designed TPU-first:

  * one decode graph, compiled once, over a fixed `max_batch` slot array —
    shapes never change, so XLA never recompiles;
  * each slot owns rows of the (layers, B, S, kv_heads, head_dim) KV cache
    and its own write offset — `KVCache.length` is a (B,) vector here, and
    the attention kernel scatters each row at its own column
    (models/llama.py per-row cache write);
  * continuous batching: between decode steps, finished slots retire and
    queued requests are admitted by splicing a freshly prefilled (B=1) row
    into the batch cache (`dynamic_update_slice` at the slot index — the
    slot id is a traced scalar, so admission is also a single compiled fn);
  * prompts pad to a fixed `prompt_len`, so prefill compiles once too;
  * prefix caching: `register_prefix` precomputes the KV slab of a shared
    system prompt once; matching admissions splice it and chunk-prefill
    only their suffix (see `max_prefixes` / `register_prefix`).

Per-token host round trips are inherent to interactive serving (the sampled
token must reach the user); the engine amortizes the hosted-TPU dispatch
latency across every active slot, which is exactly the continuous-batching
win. `decode_block > 1` amortizes it further in the *time* dimension: K
decode steps run on-device as one `lax.scan` per host dispatch, with EOS /
cache-overflow deactivation folded into the scan so finished slots stop
advancing mid-block. Token streams at temperature 0 are identical to
decode_block=1 (budget/keyword stops are still enforced per token on the
host, which simply discards the tail of the block); only admission cadence
coarsens to one scheduling pass per K tokens.

Text-only and multimodal (image-input) requests share the batch: image
features occupy pre-reserved `IMAGE_TOKEN_INDEX` slots in the prompt, like
training (models/setokim.py::prepare_multimodal). Generated-image spans are
rendered at retirement through `models/generate.generate_image`.
"""

from __future__ import annotations

import dataclasses
import queue
import time
from collections import OrderedDict
from concurrent.futures import Future, ThreadPoolExecutor
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from setok_tpu.models.llama import KVCache
from setok_tpu.models.generate import (find_image_spans, generate_image,
                                       _top_p_filter)
from setok_tpu.models.setokim import Setokim

try:                                   # sharding types (multi-chip serving)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
except Exception:                      # pragma: no cover
    Mesh = None


@dataclasses.dataclass
class Request:
    """One generation request. `tokens`/`images_out` fill as it runs."""

    prompt_ids: np.ndarray                 # (L,) int — collator layout
    image: Optional[np.ndarray] = None     # (H, W, 3) float or None
    max_new_tokens: int = 64
    # optional KeywordsStoppingCriteria (data/mm_tokens.py): checked after
    # every decoded token, so keyword stops free the slot immediately
    # (true per-step stopping — the loop here is host-driven, unlike the
    # compiled scan in models/generate.py)
    stopping: Optional[Any] = None
    # streaming: called as on_token(request, token_id) after every decoded
    # token (including the first, at admission). Runs on the engine's
    # scheduling thread — keep it cheap; exceptions propagate to step().
    on_token: Optional[Any] = None
    # per-request sampling overrides (engine must be constructed with
    # per_request_sampling=True); None = the engine-wide default
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    presence_penalty: Optional[float] = None
    frequency_penalty: Optional[float] = None
    # results
    tokens: List[int] = dataclasses.field(default_factory=list)
    images_out: List[np.ndarray] = dataclasses.field(default_factory=list)
    done: bool = False
    cancelled: bool = False
    # timing (monotonic seconds; None until reached): submit → first
    # token (TTFT) → done. Filled by the engine; read via ServeEngine.stats
    t_submit: Optional[float] = None
    t_first: Optional[float] = None
    t_done: Optional[float] = None
    # internal
    _hiddens: List[np.ndarray] = dataclasses.field(default_factory=list)

    @property
    def ttft(self) -> Optional[float]:
        """Submit → first-token latency (s), or None if no token yet."""
        if self.t_submit is None or self.t_first is None:
            return None
        return self.t_first - self.t_submit

    @property
    def latency(self) -> Optional[float]:
        """Submit → done wall time (s), or None while running."""
        if self.t_submit is None or self.t_done is None:
            return None
        return self.t_done - self.t_submit

    def cancel(self) -> None:
        """Stop this request at the engine's next scheduling pass.

        Queued requests retire without tokens; an in-flight request keeps
        the tokens already emitted. The slot frees for the next admission.
        """
        self.cancelled = True


@dataclasses.dataclass(eq=False)
class ServeEngine:
    model: Setokim
    params: Any
    max_batch: int = 4
    prompt_len: int = 64
    max_len: int = 256                     # KV-cache width per slot
    eos_id: int = 2
    pad_id: int = 0
    temperature: float = 0.0               # 0 = greedy
    # nucleus sampling: restrict sampling (temperature>0) to the smallest
    # token set of cumulative probability >= top_p — same filter as the
    # offline path (models/generate._top_p_filter). 1.0 = off. Applies to
    # every decode flavor incl. speculative verification (drafts outside
    # the nucleus get p=0 and are always rejected, so emitted tokens
    # follow exactly the filtered distribution).
    top_p: float = 1.0
    # repetition control (OpenAI semantics): logits[t] -= presence·1[n_t>0]
    # + frequency·n_t, with n_t the count of token t in that slot's prompt
    # + generated text so far. Applies at any temperature (greedy included).
    # Exclusive with spec_len (verification would need within-chunk count
    # updates). 0.0 = off (the penalty math compiles away).
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    # per-request sampling: compile the decode graphs over traced (B,)
    # temperature/top_p/penalty vectors instead of baked-in scalars, so
    # each submit() may override any of them (vLLM-style). Off by default:
    # the static graphs skip the nucleus sort entirely at temperature 0.
    # Exclusive with spec_len (mixed greedy/sampled rows cannot share one
    # rejection-sampling chunk).
    per_request_sampling: bool = False
    im_start_id: Optional[int] = None      # render generated image spans
    im_end_id: Optional[int] = None
    num_iter: int = 16                     # MaskGIT iterations per image
    cfg_scale: float = 1.0
    # decode steps per host dispatch (lax.scan on-device). >1 amortizes the
    # per-call dispatch latency (~90 ms on a tunneled chip) over K tokens.
    decode_block: int = 1
    # speculative decoding: draft spec_len tokens per slot by prompt
    # lookup (serve/speculative.py) and verify them in ONE chunked
    # forward (models/setokim.py::verify_step) — each accepted draft saves a
    # full weight-streaming decode step. At temperature>0 drafts are
    # rejection-sampled (speculative_sample) so emitted tokens follow the
    # exact ancestral sampling distribution. Greedy verification is exact:
    # every emitted token is the argmax of a real model forward over its
    # own prefix. The stream can still differ from spec_len=0 at fp
    # near-ties (the (B, 1+D) verify forward tiles differently than the
    # (B, 1) decode forward, and reassociation flips argmax when the
    # top-2 logit gap is ~1e-3 — same caveat as the batched-admission
    # tests note for cross-shape parity), and slots retire spec_len
    # tokens earlier at the cache-capacity edge.
    spec_len: int = 0
    spec_ngram: int = 3
    # chunked text-only prefill: admit prompts in fixed C-token chunks
    # through models/setokim.py::prefill_text_chunk instead of one
    # prompt_len-wide graph. Bounds prefill peak memory to O(C·S), admits
    # prompts up to the cache width (not the prompt_len bucket), and
    # compiles ONE chunk graph per admit size instead of one per prompt
    # width. 0 = off (single-shot prefill). Image admits always take the
    # single-shot path (the vision splice needs the full sequence).
    prefill_chunk: int = 0
    # prefix caching (requires prefill_chunk > 0): `register_prefix(ids)`
    # precomputes the KV slab for a shared prompt prefix (e.g. the system
    # prompt) ONCE; admissions whose prompt starts with a registered
    # prefix broadcast that slab into their rows and chunk-prefill only
    # the suffix — prefill device time scales with the suffix, not the
    # prompt. Left-aligned layout makes the reuse exact: when the prefix
    # length is a multiple of prefill_chunk the resulting cache is
    # byte-identical to prefilling the whole prompt. LRU-capped.
    max_prefixes: int = 8
    # bf16 cache halves decode-attention HBM traffic — the decode step is
    # bandwidth-bound on cache reads (B*S*layers*2*kv*dh bytes/token), so
    # cache width, not kernel fusion, sets its speed
    cache_dtype: Any = jnp.bfloat16
    # multi-chip serving: a (data, model) mesh TP-shards the trunk
    # (Megatron col/row split, parallel/sharding.llama_tp_spec) and shards
    # the KV cache over the model axis on kv-heads; GSPMD inserts the one
    # all-reduce per block. None = single-chip.
    mesh: Any = None

    def __post_init__(self):
        if self.prompt_len >= self.max_len:
            raise ValueError("prompt_len must leave decode room in max_len")
        self._queue: "queue.Queue[Request]" = queue.Queue()
        self._slots: List[Optional[Request]] = [None] * self.max_batch
        b, s = self.max_batch, self.max_len
        cfg = self.model.cfg.llama
        kv_shape = (cfg.num_layers, b, s, cfg.num_kv_heads, cfg.head_dim)
        # distinct buffers — a donated cache may not alias k_scale/v_scale
        sc = ((lambda: jnp.zeros(kv_shape[:-1], jnp.float32))
              if self.cache_dtype == jnp.int8 else (lambda: None))
        self._cache = KVCache(k=jnp.zeros(kv_shape, self.cache_dtype),
                              v=jnp.zeros(kv_shape, self.cache_dtype),
                              length=jnp.zeros((b,), jnp.int32),
                              k_scale=sc(), v_scale=sc())
        self._cache_valid = jnp.zeros((b, s), bool)
        if self.mesh is not None:
            from setok_tpu.parallel.mesh import MODEL_AXIS
            from setok_tpu.parallel.sharding import setokim_shardings
            self.params = jax.device_put(
                self.params, setokim_shardings(self.params, self.mesh))
            model_size = self.mesh.shape.get(MODEL_AXIS, 1)
            kv_axis = (MODEL_AXIS
                       if cfg.num_kv_heads % max(model_size, 1) == 0
                       and model_size > 1 else None)
            kv_sh = NamedSharding(self.mesh,
                                  P(None, None, None, kv_axis, None))
            rep = NamedSharding(self.mesh, P())
            sc_sh = NamedSharding(self.mesh, P(None, None, None, kv_axis))
            put_sc = (lambda s: None if s is None
                      else jax.device_put(s, sc_sh))
            self._cache = KVCache(k=jax.device_put(self._cache.k, kv_sh),
                                  v=jax.device_put(self._cache.v, kv_sh),
                                  length=jax.device_put(self._cache.length,
                                                        rep),
                                  k_scale=put_sc(self._cache.k_scale),
                                  v_scale=put_sc(self._cache.v_scale))
            self._cache_valid = jax.device_put(self._cache_valid, rep)
        self._pos = jnp.zeros((b,), jnp.int32)
        self._cur_tok = jnp.full((b,), self.pad_id, jnp.int32)
        # per-slot token counts over the vocab (repetition penalties);
        # overwritten at admission, threaded through every decode graph
        self._counts = jnp.zeros((b, cfg.vocab_size), jnp.int32)
        # per-slot sampling params (per_request_sampling mode): host
        # mirrors, set at admission, shipped as (B,) args per dispatch
        self._t_np = np.full((b,), self.temperature, np.float32)
        self._tp_np = np.full((b,), self.top_p, np.float32)
        self._pp_np = np.full((b,), self.presence_penalty, np.float32)
        self._fp_np = np.full((b,), self.frequency_penalty, np.float32)
        self._active = np.zeros((b,), bool)    # host-side scheduler state
        # host mirror of each row's physical write offset (cache.length).
        # pos (semantic position) undercounts it for padded prompts, so
        # capacity stops must use this, not pos: a write past max_len
        # clamps backward over valid entries (llama.py per-row scatter).
        self._len_host = np.zeros((b,), np.int64)
        self._rng = jax.random.PRNGKey(0)

        # per_request_sampling binds temperature=None into the graphs —
        # the impls then read the traced (B,) `samp` vectors instead
        t_static = None if self.per_request_sampling else self.temperature
        pens = (self.presence_penalty, self.frequency_penalty)
        self._prefill = jax.jit(partial(self._prefill_impl, self.model,
                                        self.max_len, self.cache_dtype,
                                        t_static, self.top_p,
                                        *pens, self.pad_id))
        self._prefill_text = jax.jit(partial(
            self._prefill_text_impl, self.model, self.max_len,
            self.cache_dtype, t_static, self.top_p, *pens,
            self.pad_id))
        self._insert = jax.jit(self._insert_impl,
                               donate_argnums=(0, 1, 2, 3, 4))
        self._step = jax.jit(partial(self._step_impl, self.model,
                                     t_static, self.top_p, *pens,
                                     self.pad_id),
                             donate_argnums=(1, 2, 3, 5))
        if self.decode_block < 1:
            raise ValueError("decode_block must be >= 1")
        if self.decode_block > 1:
            self._step_multi = jax.jit(
                partial(self._step_multi_impl, self.model, t_static,
                        self.top_p, *pens, self.pad_id, self.eos_id,
                        self.decode_block, self.max_len),
                donate_argnums=(1, 2, 3, 5))
        if self.prefill_chunk < 0:
            raise ValueError("prefill_chunk must be >= 0")
        if self.prefill_chunk > 0:
            self._chunk = jax.jit(
                partial(self._chunk_impl, self.model),
                donate_argnums=(2, 3))
        if self.spec_len < 0:
            raise ValueError("spec_len must be >= 0")
        if self.spec_len > 0:
            if self.decode_block > 1:
                raise ValueError("spec_len and decode_block>1 are exclusive "
                                 "amortizations — pick one")
            if self.presence_penalty or self.frequency_penalty:
                raise ValueError("presence/frequency penalties are not "
                                 "supported with speculative decoding "
                                 "(verification would need within-chunk "
                                 "count updates)")
            if self.per_request_sampling:
                raise ValueError("per_request_sampling is not supported "
                                 "with speculative decoding (mixed rows "
                                 "cannot share one rejection chunk)")
            self._spec = jax.jit(
                partial(self._spec_step_impl, self.model, self.pad_id,
                        self.temperature, self.top_p),
                donate_argnums=(1, 2, 3))
        # admission prefills dispatch on a worker thread so the decode loop
        # never blocks on a prefill: the jitted call is pure (no engine
        # state), results splice in at harvest time. One worker keeps TPU
        # submission order deterministic.
        self._prefill_pool = ThreadPoolExecutor(max_workers=1)
        self._pending: List[Tuple[List[Request], List[int], Future]] = []
        # retirement image renders in flight (same worker as prefills, so
        # decode never stalls on a MaskGIT loop; req.done flips at harvest)
        self._renders: List[Tuple[Request, Future]] = []
        # registered shared prefixes: tuple(ids) → (cache(L,1,S), valid
        # (1,S), plen, padded width). Insertion order doubles as LRU.
        self._prefixes: "OrderedDict[Tuple[int, ...], Tuple]" = OrderedDict()
        # cumulative counters (read via stats())
        self._n_done = 0
        self._n_tokens = 0

    # ------------------------------------------------------------------
    # jitted pieces (static through partial; compiled once per engine)
    @staticmethod
    def _sample(logits, temperature, top_p, rng):
        # one sampling policy for every decode flavor: greedy at t=0,
        # temperature/nucleus categorical otherwise
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logits = logits / temperature
        if top_p < 1.0:
            logits = _top_p_filter(logits, top_p)
        return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)

    @staticmethod
    def _penalize(logits, counts, presence, frequency):
        # OpenAI-style repetition control; compiles away when both are 0
        if presence == 0.0 and frequency == 0.0:
            return logits
        c = counts.astype(logits.dtype)
        return (logits - presence * (c > 0).astype(logits.dtype)
                - frequency * c)

    @staticmethod
    def _prompt_counts(ids, vocab, pad_id):
        # per-row vocab counts of the real prompt tokens (pads and negative
        # image/target sentinels excluded)
        valid = (ids >= 0) & (ids != pad_id)
        rows = jnp.broadcast_to(jnp.arange(ids.shape[0])[:, None], ids.shape)
        return jnp.zeros((ids.shape[0], vocab), jnp.int32).at[
            rows, jnp.clip(ids, 0)].add(valid.astype(jnp.int32))

    @staticmethod
    def _sample_rows(logits, counts, samp, rng):
        # per-request sampling path: samp = ((B,) temperature, top_p,
        # presence, frequency) traced vectors; greedy rows take the argmax
        # of the penalized logits, sampled rows the filtered categorical
        t, tp, pres, freq = samp
        c = counts.astype(logits.dtype)
        logits = (logits - pres[:, None] * (c > 0).astype(logits.dtype)
                  - freq[:, None] * c)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        scaled = logits / jnp.maximum(t, 1e-6)[:, None]
        filtered = _top_p_filter(scaled, tp[:, None])
        sampled = jax.random.categorical(rng, filtered,
                                         axis=-1).astype(jnp.int32)
        return jnp.where(t > 0.0, sampled, greedy)

    @staticmethod
    def _prefill_impl(model, max_len, cache_dtype, temperature, top_p,
                      presence, frequency, pad_id, params, ids, images, rng,
                      samp=None):
        logits, _, cache, cache_valid, _ = model.apply(
            params, ids, images, max_len, cache_dtype=cache_dtype,
            method=model.prefill)
        next_pos = jnp.sum(cache_valid.astype(jnp.int32), axis=1)
        counts = ServeEngine._prompt_counts(ids, logits.shape[-1], pad_id)
        if temperature is None:
            first = ServeEngine._sample_rows(logits, counts, samp, rng)
        else:
            first = ServeEngine._sample(
                ServeEngine._penalize(logits, counts, presence, frequency),
                temperature, top_p, rng)
        counts = counts.at[jnp.arange(ids.shape[0]), first].add(1)
        return cache, cache_valid, next_pos, first, counts

    @staticmethod
    def _prefill_text_impl(model, max_len, cache_dtype, temperature, top_p,
                           presence, frequency, pad_id, params, ids, rng,
                           samp=None):
        # text-only fast path: never touches the vision tower
        logits, _, cache, cache_valid, _ = model.apply(
            params, ids, max_len, cache_dtype=cache_dtype,
            method=model.prefill_text)
        next_pos = jnp.sum(cache_valid.astype(jnp.int32), axis=1)
        counts = ServeEngine._prompt_counts(ids, logits.shape[-1], pad_id)
        if temperature is None:
            first = ServeEngine._sample_rows(logits, counts, samp, rng)
        else:
            first = ServeEngine._sample(
                ServeEngine._penalize(logits, counts, presence, frequency),
                temperature, top_p, rng)
        counts = counts.at[jnp.arange(ids.shape[0]), first].add(1)
        return cache, cache_valid, next_pos, first, counts

    @staticmethod
    def _chunk_impl(model, params, ids_chunk, cache, cache_valid, pos_off):
        return model.apply(params, ids_chunk, cache, cache_valid, pos_off,
                           method=model.prefill_text_chunk)

    def _prefill_text_chunked(self, params, ids, lens, rng, samp=None):
        """Chunked text-only prefill (worker thread): same return contract
        as `_prefill_text_impl` — (row_cache, row_valid, next_pos, first).

        ids: (n, P) with P a multiple of prefill_chunk, prompts
        left-aligned; lens: host list of true prompt lengths. Drives the
        one compiled chunk graph P/C times over a fresh full-width row
        cache; the per-row first-token logits are gathered from whichever
        chunk holds that row's last valid token."""
        from setok_tpu.models.llama import init_cache
        n, p = ids.shape
        c = self.prefill_chunk
        lens = np.asarray(lens)
        cache = init_cache(self.model.cfg.llama, n, self.max_len,
                           dtype=self.cache_dtype)
        cache_valid = jnp.zeros((n, self.max_len), bool)
        first_logits = None
        for ci in range(p // c):
            chunk = ids[:, ci * c:(ci + 1) * c]
            # valid tokens are contiguous from 0, so the count of valid
            # tokens before this chunk is min(len, ci*C) — host math
            pos_off = jnp.asarray(np.minimum(lens, ci * c), jnp.int32)
            logits, _, cache, cache_valid = self._chunk(
                params, chunk, cache, cache_valid, pos_off)
            last_in_chunk = (lens - 1) // c == ci
            sel = jnp.take_along_axis(
                logits, jnp.asarray((lens - 1) % c)[:, None, None],
                axis=1)[:, 0]
            first_logits = sel if first_logits is None else jnp.where(
                jnp.asarray(last_in_chunk)[:, None], sel, first_logits)
        next_pos = jnp.asarray(lens, jnp.int32)
        vocab = first_logits.shape[-1]
        counts = self._prompt_counts(jnp.asarray(ids), vocab, self.pad_id)
        if samp is not None:
            first = self._sample_rows(first_logits, counts, samp, rng)
        else:
            first = self._sample(
                self._penalize(first_logits, counts, self.presence_penalty,
                               self.frequency_penalty),
                self.temperature, self.top_p, rng)
        counts = counts.at[jnp.arange(n), first].add(1)
        return cache, cache_valid, next_pos, first, counts

    # ------------------------------------------------------------------
    # prefix caching (shared system-prompt KV reuse)
    def _chunk_cap(self) -> int:
        """Whole-chunk prompt capacity of a chunked admission: the cache
        width minus one decode slot, rounded down to whole chunks."""
        c = self.prefill_chunk
        return ((self.max_len - 2) // c) * c

    def register_prefix(self, prefix_ids) -> None:
        """Precompute and cache the KV slab for a shared prompt prefix.

        Later text-only admissions whose prompt begins with `prefix_ids`
        (and whose suffix fits the remaining chunk capacity) reuse this
        slab instead of re-running the trunk over the prefix: admission
        device time becomes O(suffix), the production prompt-caching win
        for long system prompts. Requires `prefill_chunk > 0` (the suffix
        rides the same compiled chunk graph). Oldest registration evicts
        past `max_prefixes` (LRU — a dispatch hit refreshes recency).

        Beyond parity: the reference re-prefills the full prompt through
        HF generate on every request (setokim_llama.py:285-300)."""
        if self.prefill_chunk <= 0:
            raise ValueError("register_prefix requires prefill_chunk > 0")
        ids = np.asarray(prefix_ids, np.int32)
        c = self.prefill_chunk
        pw = max(c, ((len(ids) + c - 1) // c) * c)
        if pw > self._chunk_cap() - c:
            raise ValueError("prefix leaves no room for a suffix chunk "
                             f"({pw} padded vs cap {self._chunk_cap()})")
        from setok_tpu.models.llama import init_cache
        padded = np.full((1, pw), self.pad_id, np.int32)
        padded[0, :len(ids)] = ids
        cache = init_cache(self.model.cfg.llama, 1, self.max_len,
                           dtype=self.cache_dtype)
        cache_valid = jnp.zeros((1, self.max_len), bool)
        for ci in range(pw // c):
            pos_off = jnp.asarray([min(len(ids), ci * c)], jnp.int32)
            _, _, cache, cache_valid = self._chunk(
                self.params, jnp.asarray(padded[:, ci * c:(ci + 1) * c]),
                cache, cache_valid, pos_off)
        key = tuple(int(x) for x in ids)
        self._prefixes[key] = (cache, cache_valid, len(ids), pw)
        self._prefixes.move_to_end(key)
        while len(self._prefixes) > self.max_prefixes:
            self._prefixes.popitem(last=False)

    def _match_prefix(self, prompt_ids) -> Optional[Tuple[int, ...]]:
        """Longest registered prefix usable for this prompt, or None.

        Usable = the prompt strictly extends the prefix (≥1 suffix token
        supplies the first-token logits) and the suffix fits the capacity
        left after the prefix slab — otherwise the plain chunked path
        (which trims to the LAST cap tokens, destroying the prefix)
        handles it."""
        if self.prefill_chunk <= 0 or not self._prefixes:
            return None
        prompt = tuple(int(x) for x in prompt_ids)
        best = None
        for key, (_, _, _, pw) in self._prefixes.items():
            if (len(key) < len(prompt) and prompt[:len(key)] == key
                    and len(prompt) - len(key) <= self._chunk_cap() - pw
                    and (best is None or len(key) > len(best))):
                best = key
        return best

    def _prefill_text_prefixed(self, params, suffix_ids, suffix_lens,
                               pkey, rng, samp=None):
        """Prefix-cached admission (worker thread): broadcast the
        registered prefix slab to n rows, then drive the chunk graph over
        suffix chunks only. Same return contract as `_prefill_text_impl`.

        The suffix appends at the slab's padded width `pw`; RoPE
        positions continue from the true prefix length `plen`, so when
        `plen == pw` (prefix a multiple of prefill_chunk) the cache is
        byte-identical to chunk-prefilling the whole prompt; otherwise
        the pw−plen pad holes are masked invalid, exactly the holes a
        padded single-shot prefill leaves."""
        pcache, pvalid, plen, pw = self._prefixes[pkey]
        n, w = suffix_ids.shape
        c = self.prefill_chunk

        def rep(a, axis=1):
            # ALWAYS a fresh buffer: the chunk graph donates its cache
            # args, and the registered slab must survive this admission
            # (jnp.repeat may alias its input at n == 1)
            if a is None:
                return None
            out = jnp.repeat(a, n, axis=axis) if n > 1 else jnp.copy(a)
            return out

        cache = KVCache(k=rep(pcache.k), v=rep(pcache.v),
                        length=jnp.copy(pcache.length),
                        k_scale=rep(pcache.k_scale),
                        v_scale=rep(pcache.v_scale))
        cache_valid = rep(pvalid, axis=0)
        lens = np.asarray(suffix_lens)
        first_logits = None
        for ci in range(w // c):
            chunk = suffix_ids[:, ci * c:(ci + 1) * c]
            pos_off = jnp.asarray(plen + np.minimum(lens, ci * c), jnp.int32)
            logits, _, cache, cache_valid = self._chunk(
                params, chunk, cache, cache_valid, pos_off)
            last_in_chunk = (lens - 1) // c == ci
            sel = jnp.take_along_axis(
                logits, jnp.asarray((lens - 1) % c)[:, None, None],
                axis=1)[:, 0]
            first_logits = sel if first_logits is None else jnp.where(
                jnp.asarray(last_in_chunk)[:, None], sel, first_logits)
        next_pos = jnp.asarray(plen + lens, jnp.int32)
        vocab = first_logits.shape[-1]
        pref = np.bincount([t for t in pkey if t >= 0 and t != self.pad_id],
                           minlength=vocab).astype(np.int32)
        counts = (jnp.asarray(pref)[None]
                  + self._prompt_counts(jnp.asarray(suffix_ids), vocab,
                                        self.pad_id))
        if samp is not None:
            first = self._sample_rows(first_logits, counts, samp, rng)
        else:
            first = self._sample(
                self._penalize(first_logits, counts, self.presence_penalty,
                               self.frequency_penalty),
                self.temperature, self.top_p, rng)
        counts = counts.at[jnp.arange(n), first].add(1)
        return cache, cache_valid, next_pos, first, counts

    @staticmethod
    def _insert_impl(cache, cache_valid, pos, cur_tok, counts, slot,
                     row_cache, row_valid, row_pos, row_tok, row_counts):
        k = jax.lax.dynamic_update_slice(cache.k, row_cache.k,
                                         (0, slot, 0, 0, 0))
        v = jax.lax.dynamic_update_slice(cache.v, row_cache.v,
                                         (0, slot, 0, 0, 0))
        ks = vs = None
        if cache.k_scale is not None:
            ks = jax.lax.dynamic_update_slice(
                cache.k_scale, row_cache.k_scale, (0, slot, 0, 0))
            vs = jax.lax.dynamic_update_slice(
                cache.v_scale, row_cache.v_scale, (0, slot, 0, 0))
        length = jax.lax.dynamic_update_slice(
            cache.length, row_cache.length[None].astype(jnp.int32), (slot,))
        cache_valid = jax.lax.dynamic_update_slice(cache_valid, row_valid,
                                                   (slot, 0))
        pos = jax.lax.dynamic_update_slice(pos, row_pos.astype(jnp.int32),
                                           (slot,))
        cur_tok = jax.lax.dynamic_update_slice(cur_tok, row_tok, (slot,))
        counts = jax.lax.dynamic_update_slice(counts, row_counts, (slot, 0))
        return (KVCache(k, v, length, k_scale=ks, v_scale=vs),
                cache_valid, pos, cur_tok, counts)

    @staticmethod
    def _step_impl(model, temperature, top_p, presence, frequency, pad_id,
                   params, cache, cache_valid, pos, cur_tok, counts, active,
                   rng, samp=None):
        logits, hidden, cache, cache_valid = model.apply(
            params, cur_tok[:, None], cache, cache_valid, pos,
            method=model.decode_step)
        if temperature is None:
            nxt = ServeEngine._sample_rows(logits, counts, samp, rng)
        else:
            nxt = ServeEngine._sample(
                ServeEngine._penalize(logits, counts, presence, frequency),
                temperature, top_p, rng)
        nxt = jnp.where(active, nxt, pad_id)
        counts = counts.at[jnp.arange(counts.shape[0]), nxt].add(
            active.astype(jnp.int32))
        # decode_step already advanced every row's length by 1 (LlamaModel);
        # retired rows must not advance — undo theirs so their clamped
        # cache writes stay pinned and droppable
        pos = jnp.where(active, pos + 1, pos)
        length = jnp.where(active, cache.length, cache.length - 1)
        return (cache._replace(length=length), cache_valid, pos,
                nxt, counts, hidden)

    @staticmethod
    def _step_multi_impl(model, temperature, top_p, presence, frequency,
                         pad_id, eos_id, steps, max_len, params, cache,
                         cache_valid, pos, cur_tok, counts, active, rng,
                         samp=None):
        """`steps` decode steps as one on-device scan (one host dispatch).

        Per-step semantics match `_step_impl`; additionally a slot's active
        flag flips off inside the scan when it emits EOS or its cache row
        fills, so finished slots stop advancing mid-block (their later
        tokens pad, their cache writes stay clamped). Returns the stacked
        (steps, B) tokens / (steps, B, H) hiddens plus the (steps, B)
        active-at-entry trace the host uses to attribute tokens to slots.
        """
        def body(carry, rk):
            cache, cache_valid, pos, cur_tok, counts, active = carry
            logits, hidden, cache, cache_valid = model.apply(
                params, cur_tok[:, None], cache, cache_valid, pos,
                method=model.decode_step)
            if temperature is None:
                nxt = ServeEngine._sample_rows(logits, counts, samp, rk)
            else:
                nxt = ServeEngine._sample(
                    ServeEngine._penalize(logits, counts, presence,
                                          frequency),
                    temperature, top_p, rk)
            nxt = jnp.where(active, nxt, pad_id)
            counts = counts.at[jnp.arange(counts.shape[0]), nxt].add(
                active.astype(jnp.int32))
            new_pos = jnp.where(active, pos + 1, pos)
            length = jnp.where(active, cache.length, cache.length - 1)
            new_active = active & (nxt != eos_id) & (new_pos < max_len - 1)
            carry = (cache._replace(length=length), cache_valid,
                     new_pos, nxt, counts, new_active)
            return carry, (nxt, hidden, active)

        carry = (cache, cache_valid, pos, cur_tok, counts, active)
        carry, (toks, hiddens, act_in) = jax.lax.scan(
            body, carry, jax.random.split(rng, steps))
        cache, cache_valid, pos, cur_tok, counts, _ = carry
        return (cache, cache_valid, pos, cur_tok, counts, toks, hiddens,
                act_in)

    @staticmethod
    def _spec_step_impl(model, pad_id, temperature, top_p, params, cache,
                        cache_valid, pos, cur_tok, drafts, active, rng):
        """One speculative dispatch: verify (B, 1+D) chunks, accept the
        longest valid draft prefix, rewind the rest.

        Greedy (temperature=0): accept drafts matching the argmax chain.
        Sampling (temperature>0): rejection-sample against the verify
        distributions (serve/speculative.speculative_sample) — emitted
        tokens follow EXACTLY the ancestral sampling distribution.

        The trunk writes K/V for all 1+D inputs at each row's offset;
        afterwards `cache_valid` bits past the accepted prefix are cleared
        and `length`/`pos` advance by only the accepted count, so rejected
        entries are invalid and get overwritten by later appends. Returns
        per-row emitted counts plus the (B, 1+D) out-token/hidden arrays
        the host attributes to slots (first `emit[b]` of each row).
        """
        from setok_tpu.serve.speculative import speculative_sample
        b, d = drafts.shape
        tokens = jnp.concatenate([cur_tok[:, None], drafts], axis=1)
        old_len = cache.length
        logits, hidden, cache, cache_valid = model.apply(
            params, tokens, cache, cache_valid, pos,
            method=model.verify_step)
        if temperature == 0.0:
            out_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            match = drafts == out_tok[:, :-1]
            acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                          axis=1)
        else:
            scaled = logits.astype(jnp.float32) / temperature
            if top_p < 1.0:
                scaled = _top_p_filter(scaled, top_p)
            probs = jax.nn.softmax(scaled, axis=-1)
            out_tok, acc = speculative_sample(probs, drafts, rng)
        emit = jnp.where(active, acc + 1, 0)
        t = d + 1
        rows = jnp.arange(b)[:, None]
        cols = old_len[:, None] + jnp.arange(t)[None, :]
        keep = jnp.arange(t)[None, :] < emit[:, None]
        cache_valid = cache_valid.at[rows, cols].set(keep, mode="drop")
        nxt = jnp.take_along_axis(out_tok, acc[:, None], axis=1)[:, 0]
        nxt = jnp.where(active, nxt, pad_id)
        return (cache._replace(length=old_len + emit), cache_valid,
                pos + emit, nxt, out_tok, hidden, emit)

    # ------------------------------------------------------------------
    def submit(self, prompt_ids, image=None, max_new_tokens: int = 64,
               stopping=None, on_token=None, temperature=None, top_p=None,
               presence_penalty=None, frequency_penalty=None) -> Request:
        overrides = (temperature, top_p, presence_penalty, frequency_penalty)
        if any(o is not None for o in overrides) \
                and not self.per_request_sampling:
            raise ValueError("per-request sampling overrides require "
                             "ServeEngine(per_request_sampling=True)")
        req = Request(prompt_ids=np.asarray(prompt_ids, np.int32),
                      image=image, max_new_tokens=max_new_tokens,
                      stopping=stopping, on_token=on_token,
                      temperature=temperature, top_p=top_p,
                      presence_penalty=presence_penalty,
                      frequency_penalty=frequency_penalty,
                      t_submit=time.monotonic())
        self._queue.put(req)
        return req

    def _samp_of(self, reqs) -> Tuple:
        """(n,) sampling vectors for a batch of admitted requests."""
        pick = lambda v, d: np.asarray(
            [d if getattr(r, v) is None else getattr(r, v) for r in reqs],
            np.float32)
        return (jnp.asarray(pick("temperature", self.temperature)),
                jnp.asarray(pick("top_p", self.top_p)),
                jnp.asarray(pick("presence_penalty", self.presence_penalty)),
                jnp.asarray(pick("frequency_penalty",
                                 self.frequency_penalty)))

    def _emit(self, req: Request, tok: int) -> None:
        req.tokens.append(tok)
        self._n_tokens += 1
        if req.t_first is None:
            req.t_first = time.monotonic()
        if req.on_token is not None:
            req.on_token(req, tok)

    def _finish(self, req: Request) -> None:
        req.done = True
        req.t_done = time.monotonic()
        self._n_done += 1

    def _dispatch_prefills(self) -> None:
        """Move queued requests into in-flight prefills (worker thread).

        Slots are reserved at dispatch; multiple requests of the same kind
        (image / text-only) queued together prefill as ONE batched call —
        one graph per admit size, cached by jit, at most max_batch sizes.
        """
        free = [s for s in range(self.max_batch)
                if not self._active[s] and self._slots[s] is None]
        while free and not self._queue.empty():
            batch_reqs: List[Request] = []
            try:
                batch_reqs.append(self._queue.get_nowait())
            except queue.Empty:            # racing submitter threads
                break
            if batch_reqs[0].cancelled:    # cancelled while queued: no
                self._finish(batch_reqs[0])  # tokens, no slot
                continue
            has_image = batch_reqs[0].image is not None
            pkey = (None if has_image
                    else self._match_prefix(batch_reqs[0].prompt_ids))
            while (len(batch_reqs) < len(free)
                   and not self._queue.empty()):
                nxt = self._queue.queue[0]   # peek: same kind/prefix only
                if nxt.cancelled:
                    try:
                        self._finish(self._queue.get_nowait())
                    except queue.Empty:
                        break
                    continue
                if (nxt.image is not None) != has_image:
                    break
                if (not has_image
                        and self._match_prefix(nxt.prompt_ids) != pkey):
                    break
                try:
                    batch_reqs.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            slots = [free.pop(0) for _ in batch_reqs]
            for s, r in zip(slots, batch_reqs):
                self._slots[s] = r           # reserved (not active yet)
            n = len(batch_reqs)
            self._rng, rk = jax.random.split(self._rng)
            samp = (self._samp_of(batch_reqs)
                    if self.per_request_sampling else None)
            if pkey is not None:
                # prefix-cached admit: only the suffix runs the trunk
                self._prefixes.move_to_end(pkey)   # LRU refresh
                c = self.prefill_chunk
                plen = len(pkey)
                sufs = [r.prompt_ids[plen:] for r in batch_reqs]
                lens = [len(s) for s in sufs]
                width = max(c, ((max(lens) + c - 1) // c) * c)
                ids = np.full((n, width), self.pad_id, np.int32)
                for i, p in enumerate(sufs):
                    ids[i, :len(p)] = p
                fut = self._prefill_pool.submit(
                    self._prefill_text_prefixed, self.params,
                    jnp.asarray(ids), lens, pkey, rk, samp)
                self._pending.append((batch_reqs, slots, fut))
                continue
            if self.prefill_chunk > 0 and not has_image:
                # chunked admit: prompt capacity = cache width minus one
                # decode slot, rounded down to whole chunks
                c = self.prefill_chunk
                cap = ((self.max_len - 2) // c) * c
                prompts = [r.prompt_ids[-cap:] for r in batch_reqs]
                lens = [len(p) for p in prompts]
                width = max(c, ((max(lens) + c - 1) // c) * c)
                ids = np.full((n, width), self.pad_id, np.int32)
                for i, p in enumerate(prompts):
                    ids[i, :len(p)] = p
                fut = self._prefill_pool.submit(
                    self._prefill_text_chunked, self.params,
                    jnp.asarray(ids), lens, rk, samp)
                self._pending.append((batch_reqs, slots, fut))
                continue
            ids = np.full((n, self.prompt_len), self.pad_id, np.int32)
            for i, r in enumerate(batch_reqs):
                p = r.prompt_ids[-self.prompt_len:]
                ids[i, :len(p)] = p
            if has_image:
                images = jnp.asarray(
                    np.stack([r.image for r in batch_reqs]), jnp.float32)
                fut = self._prefill_pool.submit(
                    self._prefill, self.params, jnp.asarray(ids), images,
                    rk, samp)
            else:
                fut = self._prefill_pool.submit(
                    self._prefill_text, self.params, jnp.asarray(ids), rk,
                    samp)
            self._pending.append((batch_reqs, slots, fut))

    def _harvest_prefills(self, block: bool = False) -> None:
        """Splice completed prefills into the batch cache."""
        still = []
        for batch_reqs, slots, fut in self._pending:
            if not (block or fut.done()):
                still.append((batch_reqs, slots, fut))
                continue
            row_cache, row_valid, row_pos, first, row_counts = fut.result()
            firsts = np.asarray(first)
            for i, (req, slot) in enumerate(zip(batch_reqs, slots)):
                # length is the scalar write offset (= prompt_len), shared
                # by every prefilled row
                rc = KVCache(k=row_cache.k[:, i:i + 1],
                             v=row_cache.v[:, i:i + 1],
                             length=row_cache.length,
                             k_scale=(None if row_cache.k_scale is None
                                      else row_cache.k_scale[:, i:i + 1]),
                             v_scale=(None if row_cache.v_scale is None
                                      else row_cache.v_scale[:, i:i + 1]))
                (self._cache, self._cache_valid, self._pos,
                 self._cur_tok, self._counts) = self._insert(
                    self._cache, self._cache_valid, self._pos,
                    self._cur_tok, self._counts,
                    jnp.asarray(slot, jnp.int32), rc,
                    row_valid[i:i + 1], row_pos[i:i + 1], first[i:i + 1],
                    row_counts[i:i + 1])
                self._active[slot] = True
                self._len_host[slot] = int(row_cache.length)
                if self.per_request_sampling:
                    self._t_np[slot] = (self.temperature
                                        if req.temperature is None
                                        else req.temperature)
                    self._tp_np[slot] = (self.top_p if req.top_p is None
                                         else req.top_p)
                    self._pp_np[slot] = (self.presence_penalty
                                         if req.presence_penalty is None
                                         else req.presence_penalty)
                    self._fp_np[slot] = (self.frequency_penalty
                                         if req.frequency_penalty is None
                                         else req.frequency_penalty)
                self._emit(req, int(firsts[i]))
                # the admission token counts against the same stops as
                # decode tokens — a max_new_tokens=1 request retires HERE
                budget_done = len(req.tokens) >= req.max_new_tokens
                kw_done = (req.stopping is not None
                           and req.stopping.should_stop(req.tokens))
                if (int(firsts[i]) == self.eos_id or req.cancelled
                        or budget_done or kw_done):
                    self._retire(slot)
            block = False                  # one blocking harvest is enough
        self._pending = still

    def _retire(self, slot: int) -> None:
        req = self._slots[slot]
        self._slots[slot] = None
        self._active[slot] = False
        if req is None:
            return
        # strip pads after EOS; keep EOS itself out of the text
        if self.eos_id in req.tokens:
            req.tokens = req.tokens[:req.tokens.index(self.eos_id)]
        if (self.im_start_id is not None and self.im_end_id is not None
                and req._hiddens and not req.cancelled):
            hid = np.stack(req._hiddens, axis=0)       # (T-1, H)
            if len(req._hiddens) < len(req.tokens) + 1:
                hid = np.concatenate([hid, hid[-1:]], axis=0)
            ids = np.asarray(req.tokens)
            spans = [(s, e)
                     for s, e in find_image_spans(ids, self.im_start_id,
                                                  self.im_end_id)
                     if e > s and e <= hid.shape[0]]
            if spans:
                # render on the worker thread — a MaskGIT loop must not
                # stall the decode batch. One rng per span, split here so
                # the stream stays deterministic; done flips at harvest.
                keys = []
                for _ in spans:
                    self._rng, k = jax.random.split(self._rng)
                    keys.append(k)

                def render(hid=hid, spans=spans, keys=keys):
                    return [np.asarray(generate_image(
                        self.model, self.params, jnp.asarray(hid[None, s:e]),
                        k, self.num_iter, self.cfg_scale)[0])
                        for (s, e), k in zip(spans, keys)]

                req._hiddens = []
                self._renders.append((req,
                                      self._prefill_pool.submit(render)))
                return
        req._hiddens = []
        self._finish(req)

    def _harvest_renders(self, block: bool = False) -> None:
        still = []
        for req, fut in self._renders:
            if block or fut.done():
                req.images_out.extend(fut.result())
                self._finish(req)
            else:
                still.append((req, fut))
        self._renders = still

    def stats(self) -> Dict[str, Any]:
        """Scheduler snapshot + cumulative counters, for monitoring:
        slot occupancy, queue/backlog depths, totals. Per-request latency
        lives on the Request itself (`ttft`, `latency`)."""
        return {"active_slots": int(self._active.sum()),
                "max_batch": self.max_batch,
                "queued": self._queue.qsize(),
                "prefills_in_flight": len(self._pending),
                "renders_in_flight": len(self._renders),
                "requests_done": self._n_done,
                "tokens_emitted": self._n_tokens}

    def step(self) -> int:
        """Dispatch/harvest admissions, run one decode step; returns the
        active count. Prefills run on the worker thread — decode only ever
        waits for one when it has nothing else to do."""
        self._dispatch_prefills()
        self._harvest_prefills()
        self._harvest_renders()
        # cancelled in-flight requests retire before the dispatch (their
        # tokens so far are kept; the slot frees this pass)
        for slot in range(self.max_batch):
            req = self._slots[slot]
            if self._active[slot] and req is not None and req.cancelled:
                self._retire(slot)
        # capacity guard: a dispatch writes `need` cache entries per row at
        # its length offset; rows without room must retire BEFORE the
        # dispatch (a clamped write would slide backward over valid
        # entries). Conservative for decode_block (a mid-block EOS uses
        # fewer), exact for single-step and speculative chunks.
        need = 1 + self.spec_len if self.spec_len else self.decode_block
        for slot in range(self.max_batch):
            if self._active[slot] and \
                    self._len_host[slot] + need > self.max_len:
                self._retire(slot)
        if not self._active.any():
            if self._pending:
                self._harvest_prefills(block=True)
            if not self._active.any():
                return 0
        self._rng, k = jax.random.split(self._rng)
        if self.spec_len > 0:
            return self._step_spec(k)
        if self.decode_block > 1:
            return self._step_block(k)
        samp = (tuple(jnp.asarray(a) for a in
                      (self._t_np, self._tp_np, self._pp_np, self._fp_np))
                if self.per_request_sampling else None)
        (self._cache, self._cache_valid, self._pos, self._cur_tok,
         self._counts, hidden) = self._step(
            self.params, self._cache, self._cache_valid, self._pos,
            self._cur_tok, self._counts, jnp.asarray(self._active), k,
            samp)
        toks = np.asarray(self._cur_tok)
        hid = np.asarray(hidden)
        for slot in range(self.max_batch):
            req = self._slots[slot]
            if req is None or not self._active[slot]:
                continue
            req._hiddens.append(hid[slot])   # hidden of the fed token
            tok = int(toks[slot])
            self._emit(req, tok)
            self._len_host[slot] += 1
            budget_done = (len(req.tokens) >= req.max_new_tokens
                           or int(self._pos[slot]) >= self.max_len - 1)
            kw_done = (req.stopping is not None
                       and req.stopping.should_stop(req.tokens))
            if tok == self.eos_id or budget_done or kw_done:
                self._retire(slot)
        return int(self._active.sum())

    def _step_block(self, rng) -> int:
        """decode_block decode steps in one dispatch; per-token host checks.

        A slot the host retires mid-block (budget / keyword) may have kept
        decoding on-device for the rest of the block — those tokens are
        discarded here and the slot's device state is fully overwritten at
        its next admission splice, so the overshoot costs only device time.
        """
        pos_before = np.asarray(self._pos)
        samp = (tuple(jnp.asarray(a) for a in
                      (self._t_np, self._tp_np, self._pp_np, self._fp_np))
                if self.per_request_sampling else None)
        (self._cache, self._cache_valid, self._pos, self._cur_tok,
         self._counts, toks, hiddens, act_in) = self._step_multi(
            self.params, self._cache, self._cache_valid, self._pos,
            self._cur_tok, self._counts, jnp.asarray(self._active), rng,
            samp)
        toks = np.asarray(toks)
        hid = np.asarray(hiddens)
        act = np.asarray(act_in)
        for slot in range(self.max_batch):
            req = self._slots[slot]
            if req is None or not self._active[slot]:
                continue
            for t in range(self.decode_block):
                if not act[t, slot]:
                    break
                req._hiddens.append(hid[t, slot])
                tok = int(toks[t, slot])
                self._emit(req, tok)
                self._len_host[slot] += 1
                budget_done = (len(req.tokens) >= req.max_new_tokens
                               or pos_before[slot] + t + 1
                               >= self.max_len - 1)
                kw_done = (req.stopping is not None
                           and req.stopping.should_stop(req.tokens))
                if tok == self.eos_id or budget_done or kw_done:
                    self._retire(slot)
                    break
        return int(self._active.sum())

    def _step_spec(self, rng) -> int:
        """Speculative step: draft by prompt lookup, verify in one forward.

        Accepted tokens emit exactly as spec_len=0 greedy decoding would
        (verification is exact); the host applies the same per-token
        budget / keyword / EOS checks over each row's accepted prefix.
        Slots retire `spec_len` tokens before the cache edge so a full
        chunk always has write room (verify_step appends 1+D entries).
        """
        from setok_tpu.serve.speculative import draft_prompt_lookup
        d = self.spec_len
        drafts = np.full((self.max_batch, d), self.pad_id, np.int32)
        for slot in range(self.max_batch):
            req = self._slots[slot]
            if req is None or not self._active[slot]:
                continue
            ctx = ([int(x) for x in req.prompt_ids[-self.prompt_len:]]
                   + req.tokens)
            drafts[slot] = draft_prompt_lookup(ctx, d, self.spec_ngram,
                                               self.pad_id)
        (self._cache, self._cache_valid, self._pos, self._cur_tok,
         true_tok, hiddens, emit) = self._spec(
            self.params, self._cache, self._cache_valid, self._pos,
            self._cur_tok, jnp.asarray(drafts), jnp.asarray(self._active),
            rng)
        toks = np.asarray(true_tok)
        hid = np.asarray(hiddens)
        emit = np.asarray(emit)
        for slot in range(self.max_batch):
            req = self._slots[slot]
            if req is None or not self._active[slot]:
                continue
            for i in range(int(emit[slot])):
                req._hiddens.append(hid[slot, i])
                tok = int(toks[slot, i])
                self._emit(req, tok)
                self._len_host[slot] += 1
                # cache capacity is enforced by step()'s pre-dispatch guard
                budget_done = len(req.tokens) >= req.max_new_tokens
                kw_done = (req.stopping is not None
                           and req.stopping.should_stop(req.tokens))
                if tok == self.eos_id or budget_done or kw_done:
                    self._retire(slot)
                    break
        return int(self._active.sum())

    def run(self, max_steps: int = 100000) -> None:
        """Drain the queue: decode until every submitted request is done."""
        for _ in range(max_steps):
            if (self.step() == 0 and self._queue.empty()
                    and not self._pending):
                self._harvest_renders(block=True)
                return
