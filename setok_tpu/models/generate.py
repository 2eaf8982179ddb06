"""High-level generation: autoregressive text decode + image synthesis.

Parity: /root/reference/src/model/language_model/setokim_llama.py:266-382 —
`generate()` splices multimodal inputs, runs the HF sampling loop collecting
per-step last-layer hidden states (363-366), then scans the generated ids
for `<im_start>..<im_end>` spans and renders each span's hidden states into
an image via `sample_tokens` + the detokenizer (371-382).

TPU recast: the decode loop is one `jax.lax.scan` over a static budget with
a static-shape KV cache (no HF loop, no per-step host sync); EOS handling
freezes finished rows in-graph. Span detection stays on host (it's O(tokens)
numpy on ids already fetched for the user).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from setok_tpu.models.setokim import Setokim


class GenerateOutput(NamedTuple):
    tokens: jnp.ndarray     # (B, max_new_tokens) generated ids (pad after EOS)
    hidden: jnp.ndarray     # (B, max_new_tokens, H) last-layer hidden states
    done: jnp.ndarray       # (B,) finished flags


def _top_p_filter(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filtering: mask tokens outside the smallest set with
    cumulative probability ≥ top_p."""
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while the cumulative mass *before* them is < top_p
    keep_sorted = (cum - probs) < top_p
    # threshold = smallest kept logit
    thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf),
                     axis=-1, keepdims=True)
    return jnp.where(logits >= thresh, logits, -jnp.inf)


@functools.lru_cache(maxsize=64)
def _text_generation_fn(model: Setokim, max_new_tokens: int,
                        temperature: float, top_p: float, eos_id: int,
                        pad_id: int):
    """One jitted graph for the whole prefill+decode loop (the hosted-TPU
    tunnel has ~30 ms per-dispatch latency; eager generation is unusable).
    Cached per (model, decode config)."""
    return jax.jit(functools.partial(
        _generate_text_impl, model, max_new_tokens=max_new_tokens,
        temperature=temperature, top_p=top_p, eos_id=eos_id, pad_id=pad_id))


def generate_text(model: Setokim, params, input_ids, images,
                  max_new_tokens: int, rng: Optional[jax.Array] = None,
                  temperature: float = 0.0, top_p: float = 1.0,
                  eos_id: int = 2, pad_id: int = 0) -> GenerateOutput:
    """Greedy (temperature=0) or temperature/top-p sampled decode with a
    KV cache. input_ids: (B, L) collator layout (image slots pre-expanded).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    fn = _text_generation_fn(model, max_new_tokens, temperature, top_p,
                             eos_id, pad_id)
    return fn(params, input_ids, images, rng)


def _generate_text_impl(model, params, input_ids, images, rng, *,
                        max_new_tokens, temperature, top_p, eos_id,
                        pad_id) -> GenerateOutput:
    b, l = input_ids.shape
    max_len = l + max_new_tokens

    logits0, _, cache, cache_valid, _ = model.apply(
        params, input_ids, images, max_len, method=model.prefill)
    next_pos0 = jnp.sum(cache_valid.astype(jnp.int32), axis=1)

    def sample(logits, key):
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1)
        logits = logits / temperature
        if top_p < 1.0:
            logits = _top_p_filter(logits, top_p)
        return jax.random.categorical(key, logits, axis=-1)

    def step(carry, key):
        tok, cache, cache_valid, next_pos, done = carry
        logits, hidden, cache, cache_valid = model.apply(
            params, tok[:, None], cache, cache_valid, next_pos,
            method=model.decode_step)
        nxt = sample(logits, key)
        nxt = jnp.where(done, pad_id, nxt)
        done = done | (nxt == eos_id)
        return (nxt, cache, cache_valid, next_pos + 1, done), (nxt, hidden)

    first = sample(logits0, rng)
    done0 = first == eos_id
    keys = jax.random.split(rng, max_new_tokens)
    carry = (first, cache, cache_valid, next_pos0,
             jnp.zeros((b,), bool))
    if max_new_tokens > 1:
        (_, _, _, _, done), (toks, hiddens) = jax.lax.scan(
            step, carry, keys[:max_new_tokens - 1])
        # scan iteration j feeds toks[j] and emits (toks[j+1],
        # hidden(toks[j])) — so hiddens aligns with toks[0..T-2]; the last
        # generated token is never fed back, duplicate its predecessor.
        toks = jnp.concatenate([first[None], toks], axis=0)
        hiddens = jnp.concatenate([hiddens, hiddens[-1:]], axis=0)
        done = done | done0
    else:
        toks = first[None]
        hiddens = jnp.zeros((1, b, model.cfg.llama.hidden_size))
        done = done0
    return GenerateOutput(tokens=jnp.swapaxes(toks, 0, 1),
                          hidden=jnp.swapaxes(hiddens, 0, 1), done=done)


def find_image_spans(ids: np.ndarray, im_start_id: int, im_end_id: int
                     ) -> List[Tuple[int, int]]:
    """[(start, end)) index pairs strictly between the markers.
    Parity: setokim_llama.py:371-376."""
    spans = []
    starts = np.nonzero(ids == im_start_id)[0]
    ends = np.nonzero(ids == im_end_id)[0]
    for s in starts:
        after = ends[ends > s]
        if after.size:
            spans.append((int(s) + 1, int(after[0])))
    return spans


@functools.lru_cache(maxsize=64)
def _image_generation_fn(model: Setokim, num_iter: int, cfg_scale: float,
                         temperature: float):
    def fn(params, hidden_span, rng):
        k1, _ = jax.random.split(rng)
        tokens = model.apply(params, hidden_span, k1, num_iter, cfg_scale,
                             temperature, method=model.sample_image_tokens)
        det = model.apply(params, tokens, method=model.render_image)
        return det.image
    return jax.jit(fn)


def generate_image(model: Setokim, params, hidden_span: jnp.ndarray,
                   rng: jax.Array, num_iter: int = 16,
                   cfg_scale: float = 1.0, temperature: float = 1.0):
    """Hidden states of a generation span → rendered image (B, H, W, 3).

    Parity: setokim_llama.py:206-264 + the detokenizer render the reference
    leaves implicit (its unpatchify treats LLM hidden as pixels —
    incoherent; SURVEY.md §7 decision 5). Fully jitted (cached per config)."""
    return _image_generation_fn(model, num_iter, cfg_scale, temperature)(
        params, hidden_span, rng)


def pad_to(ids: np.ndarray, width: int, pad_id: int = 0) -> np.ndarray:
    out = np.full((width,), pad_id, dtype=ids.dtype)
    out[:len(ids)] = ids
    return out


def truncate_at_stop(ids: np.ndarray, stopping) -> np.ndarray:
    """Cut a 1-D id sequence at the earliest keyword stop (keyword kept,
    like the reference's StoppingCriteria semantics — generation halts
    *after* the keyword is emitted, mm_utils.py:247-264)."""
    for t in range(1, len(ids) + 1):
        if stopping.should_stop(ids[:t].tolist()):
            return ids[:t]
    return ids


def generate(model: Setokim, params, input_ids, images,
             max_new_tokens: int = 64, rng: Optional[jax.Array] = None,
             temperature: float = 0.0, eos_id: int = 2,
             im_start_id: Optional[int] = None,
             im_end_id: Optional[int] = None, num_iter: int = 16,
             cfg_scale: float = 1.0, stopping=None):
    """Full multimodal generate: text + any images the model decided to emit.

    Returns (tokens (B, T) numpy, list over batch of lists of images).

    stopping: optional KeywordsStoppingCriteria (data/mm_tokens.py). The
    decode loop is one compiled scan, so keyword stopping is applied as a
    host-side truncation of each row afterwards — same returned text as the
    reference's per-step criteria (mm_utils.py:232-264), without breaking
    the single-graph decode. The serving engine (serve/engine.py) stops
    per-step for real, since its loop is host-driven anyway.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    out = generate_text(model, params, input_ids, images, max_new_tokens,
                        rng, temperature=temperature, eos_id=eos_id)
    ids = np.asarray(out.tokens)
    if stopping is not None:
        ids = np.stack([
            pad_to(truncate_at_stop(row, stopping), ids.shape[1])
            for row in ids])
    images_out: List[List[np.ndarray]] = [[] for _ in range(ids.shape[0])]
    if im_start_id is not None and im_end_id is not None:
        for bi in range(ids.shape[0]):
            for s, e in find_image_spans(ids[bi], im_start_id, im_end_id):
                if e <= s:
                    continue
                span = out.hidden[bi:bi + 1, s:e]
                rng, k = jax.random.split(rng)
                img = generate_image(model, params, span, k, num_iter,
                                     cfg_scale)
                images_out[bi].append(np.asarray(img[0]))
    return ids, images_out
