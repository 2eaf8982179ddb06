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

__all__ = ["draft_prompt_lookup"]


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
