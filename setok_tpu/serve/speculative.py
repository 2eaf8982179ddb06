"""Prompt-lookup drafting for speculative decoding (host side).

Draft tokens come from the request's own context — the longest recent
n-gram that re-occurred earlier continues the way it did last time. No
draft model, no extra weights: LLM text (and especially VQA / editing
transcripts, where the answer echoes the prompt) is locally repetitive,
so a cheap host-side string match predicts the next few tokens often
enough to pay. Each draft that verifies saves one full weight-streaming
decode step on the TPU (models/setokim.py::verify_step scores the whole
chunk in one forward); a miss costs only MXU compute that the
bandwidth-bound decode step had idle anyway.

Beyond parity: the reference serves through HF `generate`, one token per
forward (/root/reference/src/model/language_model/setokim_llama.py:
285-300). The technique is public ("prompt lookup decoding", HF
assisted-generation's ngram candidate generator).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

__all__ = ["draft_prompt_lookup", "speculative_sample"]


def draft_prompt_lookup(context: Sequence[int], num_draft: int,
                        max_ngram: int = 3, pad_id: int = 0) -> np.ndarray:
    """Propose `num_draft` tokens continuing `context`.

    Matches the trailing n-gram (n = max_ngram down to 1) against every
    earlier position, most recent occurrence first, and returns the
    tokens that followed it. Unfilled positions pad with `pad_id` —
    verification simply rejects them, so a bad draft costs nothing but
    device compute that was idle anyway.
    """
    out = np.full((num_draft,), pad_id, np.int64)
    ctx = np.asarray(context, np.int64)
    n_ctx = ctx.shape[0]
    if n_ctx < 2:
        return out
    for n in range(min(max_ngram, n_ctx - 1), 0, -1):
        tail = ctx[n_ctx - n:]
        # windows over ctx[:-1] so a match always has >=1 continuation
        wins = np.lib.stride_tricks.sliding_window_view(ctx[:-1], n)
        hits = np.flatnonzero((wins == tail).all(axis=1))
        if hits.size == 0:
            continue
        start = int(hits[-1])                  # prefer recency
        cont = ctx[start + n: start + n + num_draft]
        out[: cont.shape[0]] = cont
        return out
    return out


def speculative_sample(probs, drafts, rng):
    """Rejection-sample a drafted chunk so emitted tokens follow EXACTLY
    the ancestral sampling distribution (device-side, jit-safe).

    probs: (B, T, V) — softmax(logits/temperature) of the verify forward;
    position i is the model's next-token distribution after chunk input i.
    drafts: (B, T-1) proposed tokens. With a deterministic drafter
    (prompt lookup → q = point mass), the standard speculative-sampling
    rule reduces to: accept draft d_i with probability p_i(d_i); at the
    first rejection sample from the residual p_i with d_i excluded
    (renormalized); if every draft is accepted sample the bonus token
    from p_T. Marginals match ancestral sampling exactly (Leviathan et
    al. / Chen et al. speculative sampling, public technique).

    Returns (out_tok (B, T) int32, acc (B,) int32): out_tok[b, :acc[b]]
    are accepted drafts, out_tok[b, acc[b]] is the rejection/bonus
    sample; entries past acc[b] are garbage the caller must mask.
    """
    import jax
    import jax.numpy as jnp

    b, t, v = probs.shape
    d = t - 1
    u_key, s_key = jax.random.split(rng)
    p_draft = jnp.take_along_axis(probs[:, :d], drafts[..., None],
                                  axis=-1)[..., 0]                # (B, D)
    u = jax.random.uniform(u_key, (b, d))
    accept = u < p_draft
    acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)
    # distribution at the first-rejected (or bonus) position
    p_sel = jnp.take_along_axis(probs, acc[:, None, None],
                                axis=1)[:, 0]                      # (B, V)
    draft_at = jnp.take_along_axis(drafts, jnp.minimum(acc, d - 1)[:, None],
                                   axis=1)[:, 0]                   # (B,)
    # residual = (p - q)+ with q a point mass at the rejected draft: p with
    # that token zeroed, renormalized. A rejection implies p(draft) < 1, so
    # the residual mass 1 - p(draft) is strictly positive.
    exclude = jax.nn.one_hot(draft_at, v, dtype=probs.dtype)
    resid = jnp.where((acc < d)[:, None], p_sel * (1.0 - exclude), p_sel)
    resid = resid / jnp.maximum(jnp.sum(resid, -1, keepdims=True), 1e-30)
    sampled = jax.random.categorical(s_key, jnp.log(resid + 1e-30), axis=-1)
    out = jnp.concatenate([drafts, jnp.zeros((b, 1), drafts.dtype)], axis=1)
    out = out.at[jnp.arange(b), acc].set(sampled.astype(drafts.dtype))
    return out.astype(jnp.int32), acc
