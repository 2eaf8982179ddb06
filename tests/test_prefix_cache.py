"""Prefix caching (serve/engine.py register_prefix / prefix-matched admits).

A registered prefix's KV slab is computed once; admissions whose prompt
starts with it broadcast the slab and chunk-prefill only the suffix. With
the prefix length a multiple of prefill_chunk the physical cache layout is
byte-identical to chunk-prefilling the whole prompt, so greedy streams
must match token-for-token. Beyond parity: the reference re-prefills the
full prompt through HF generate per request (setokim_llama.py:285-300).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from setok_tpu import config as cfgs
from setok_tpu.models.setokim import Setokim
from setok_tpu.serve import ServeEngine

pytestmark = pytest.mark.full

PREFIX = np.asarray([1, 17, 23, 99, 5, 42, 7, 310], np.int32)   # len 8


def _model_and_params():
    import jax
    cfg = cfgs.tiny_setokim()
    model = Setokim(cfg, target_token_id=3)
    ids0 = np.zeros((2, 12), np.int64)
    ids0[:, :5] = [[1, 17, 23, 99, 5], [1, 7, 3, 11, 2]]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids0),
                        method=lambda m, i: m.llama(i))
    return cfg, model, params


def _prompts(prefix):
    r = np.random.RandomState(0)
    return [np.concatenate([prefix, r.randint(4, 500, size=9)]),
            np.concatenate([prefix, [88, 4, 251]])]


def test_prefix_cached_admit_matches_plain_chunked():
    """Prefix len == chunk size → identical cache layout → identical
    greedy streams, for batched and staggered admission alike."""
    cfg, model, params = _model_and_params()
    prompts = _prompts(PREFIX)

    plain = ServeEngine(model, params, max_batch=2, prompt_len=16,
                        max_len=48, eos_id=-1, pad_id=0, prefill_chunk=8)
    ref = [plain.submit(p, max_new_tokens=6) for p in prompts]
    plain.run()

    eng = ServeEngine(model, params, max_batch=2, prompt_len=16,
                      max_len=48, eos_id=-1, pad_id=0, prefill_chunk=8)
    eng.register_prefix(PREFIX)
    got = [eng.submit(p, max_new_tokens=6) for p in prompts]
    eng.run()
    assert [r.tokens for r in got] == [r.tokens for r in ref]

    # staggered: second request admits mid-decode of the first
    eng2 = ServeEngine(model, params, max_batch=2, prompt_len=16,
                       max_len=48, eos_id=-1, pad_id=0, prefill_chunk=8)
    eng2.register_prefix(PREFIX)
    r0 = eng2.submit(prompts[0], max_new_tokens=6)
    eng2.step(); eng2.step()
    r1 = eng2.submit(prompts[1], max_new_tokens=6)
    eng2.run()
    assert [r0.tokens, r1.tokens] == [r.tokens for r in ref]


def test_prefix_not_multiple_of_chunk():
    """A prefix ending mid-chunk leaves masked pad holes before the
    suffix — semantically identical attention, so streams still match."""
    cfg, model, params = _model_and_params()
    prefix = PREFIX[:5]                                   # len 5, C=8
    prompts = _prompts(prefix)

    plain = ServeEngine(model, params, max_batch=2, prompt_len=16,
                        max_len=48, eos_id=-1, pad_id=0, prefill_chunk=8)
    ref = [plain.submit(p, max_new_tokens=6) for p in prompts]
    plain.run()

    eng = ServeEngine(model, params, max_batch=2, prompt_len=16,
                      max_len=48, eos_id=-1, pad_id=0, prefill_chunk=8)
    eng.register_prefix(prefix)
    got = [eng.submit(p, max_new_tokens=6) for p in prompts]
    eng.run()
    assert [r.tokens for r in got] == [r.tokens for r in ref]


def test_prefix_cache_int8():
    """Prefix slab stored/spliced in the int8 cache format (values +
    per-token scales) matches the plain int8 chunked engine."""
    cfg, model, params = _model_and_params()
    prompts = _prompts(PREFIX)
    outs = []
    for use_prefix in (False, True):
        eng = ServeEngine(model, params, max_batch=2, prompt_len=16,
                          max_len=48, eos_id=-1, pad_id=0, prefill_chunk=8,
                          cache_dtype=jnp.int8)
        if use_prefix:
            eng.register_prefix(PREFIX)
        reqs = [eng.submit(p, max_new_tokens=6) for p in prompts]
        eng.run()
        outs.append([list(r.tokens) for r in reqs])
    assert outs[0] == outs[1], outs


def test_prefix_lru_eviction_and_mismatch_fallback():
    """Non-matching prompts fall back to the plain chunked path; LRU cap
    evicts the oldest registration; mixed matched/unmatched submissions
    admit in separate groups but still produce the plain-path streams."""
    cfg, model, params = _model_and_params()
    other = np.asarray([2, 9, 9, 9, 9, 9, 9, 9], np.int32)
    prompts = [np.concatenate([PREFIX, [88, 4, 251]]),       # matches
               np.concatenate([other, [12, 13]])]            # doesn't

    plain = ServeEngine(model, params, max_batch=2, prompt_len=16,
                        max_len=48, eos_id=-1, pad_id=0, prefill_chunk=8)
    ref = [plain.submit(p, max_new_tokens=5) for p in prompts]
    plain.run()

    eng = ServeEngine(model, params, max_batch=2, prompt_len=16,
                      max_len=48, eos_id=-1, pad_id=0, prefill_chunk=8,
                      max_prefixes=1)
    eng.register_prefix(PREFIX)
    eng.register_prefix(other)          # evicts PREFIX (cap 1)
    assert tuple(int(x) for x in PREFIX) not in eng._prefixes
    assert eng._match_prefix(prompts[0]) is None
    assert eng._match_prefix(prompts[1]) == tuple(int(x) for x in other)
    got = [eng.submit(p, max_new_tokens=5) for p in prompts]
    eng.run()
    assert [r.tokens for r in got] == [r.tokens for r in ref]


def test_prefix_requires_chunked_and_room():
    cfg, model, params = _model_and_params()
    eng = ServeEngine(model, params, max_batch=1, prompt_len=16,
                      max_len=48, eos_id=-1, pad_id=0)
    with pytest.raises(ValueError):
        eng.register_prefix(PREFIX)
    eng = ServeEngine(model, params, max_batch=1, prompt_len=16,
                      max_len=48, eos_id=-1, pad_id=0, prefill_chunk=8)
    with pytest.raises(ValueError):                 # no room for a suffix
        eng.register_prefix(np.arange(1, 41, dtype=np.int32))
    # suffix longer than the remaining capacity → no match (plain path)
    eng.register_prefix(PREFIX)
    long_suffix = np.concatenate([PREFIX, np.full(40, 9, np.int32)])
    assert eng._match_prefix(long_suffix) is None
