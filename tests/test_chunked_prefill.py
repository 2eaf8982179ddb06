"""Chunked text-only prefill (serve/engine.py prefill_chunk).

Prompts are left-aligned, so C-token chunked admission writes the exact
same cache layout (content, pad holes, write offset) as a single-shot
prefill of the same padded width — decode streams must then match
token-for-token. Also covers the capacity win: prompts longer than the
prompt_len bucket admit fully when chunked."""

import numpy as np
import jax.numpy as jnp
import pytest

from setok_tpu import config as cfgs
from setok_tpu.models.setokim import Setokim
from setok_tpu.serve import ServeEngine

pytestmark = pytest.mark.full


def _model_and_params():
    import jax
    cfg = cfgs.tiny_setokim()
    model = Setokim(cfg, target_token_id=3)
    ids0 = np.zeros((2, 12), np.int64)
    ids0[:, :5] = [[1, 17, 23, 99, 5], [1, 7, 3, 11, 2]]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids0),
                        method=lambda m, i: m.llama(i))
    return cfg, model, params


def _prompts():
    r = np.random.RandomState(0)
    return [np.concatenate([[1], r.randint(4, 500, size=10)]),   # len 11
            np.asarray([1, 17, 23, 99, 5])]                      # len 5


def test_chunked_prefill_matches_single_shot():
    """C=8 chunks over a 16-wide batch == one 16-wide prefill: identical
    physical layout, so greedy streams must match exactly."""
    cfg, model, params = _model_and_params()
    outs = []
    for kw in (dict(prompt_len=16),
               dict(prompt_len=16, prefill_chunk=8),
               dict(prompt_len=16, prefill_chunk=16)):
        eng = ServeEngine(model, params, max_batch=2, max_len=40,
                          eos_id=-1, pad_id=0, **kw)
        reqs = [eng.submit(p, max_new_tokens=6) for p in _prompts()]
        eng.run()
        assert all(len(r.tokens) == 6 for r in reqs)
        outs.append([list(r.tokens) for r in reqs])
    assert outs[0] == outs[1] == outs[2], outs


def test_chunked_prefill_admits_past_prompt_len_bucket():
    """A 24-token prompt overflows a 16-bucket engine (which keeps only
    the last 16 tokens) but admits fully with prefill_chunk=8; the stream
    must match a single-shot engine whose bucket holds the whole prompt
    at the same 24-wide layout."""
    cfg, model, params = _model_and_params()
    r = np.random.RandomState(1)
    long_prompt = np.concatenate([[1], r.randint(4, 500, size=23)])  # 24

    ref = ServeEngine(model, params, max_batch=1, prompt_len=24,
                      max_len=48, eos_id=-1, pad_id=0)
    rr = ref.submit(long_prompt, max_new_tokens=6)
    ref.run()

    eng = ServeEngine(model, params, max_batch=1, prompt_len=16,
                      max_len=48, eos_id=-1, pad_id=0, prefill_chunk=8)
    re = eng.submit(long_prompt, max_new_tokens=6)
    eng.run()
    assert list(re.tokens) == list(rr.tokens), (re.tokens, rr.tokens)

    trunc = ServeEngine(model, params, max_batch=1, prompt_len=16,
                        max_len=48, eos_id=-1, pad_id=0)
    rt = trunc.submit(long_prompt, max_new_tokens=6)
    trunc.run()
    # sanity: the unchunked 16-bucket really did see a truncated prompt
    assert list(rt.tokens) != list(rr.tokens)


def test_chunked_prefill_int8_cache():
    """Chunked admission over an int8 cache (per-chunk quantized writes)
    matches the single-shot int8 engine."""
    cfg, model, params = _model_and_params()
    outs = []
    for kw in (dict(), dict(prefill_chunk=8)):
        eng = ServeEngine(model, params, max_batch=2, prompt_len=16,
                          max_len=40, eos_id=-1, pad_id=0,
                          cache_dtype=jnp.int8, **kw)
        reqs = [eng.submit(p, max_new_tokens=6) for p in _prompts()]
        eng.run()
        outs.append([list(r.tokens) for r in reqs])
    assert outs[0] == outs[1], outs
