"""Streaming callbacks + request cancellation (serve/engine.py).

Beyond parity: the reference's inference path returns only the final HF
`generate` output (setokim_llama.py:328-382) — no per-token streaming, no
cancellation.
"""

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
    return [np.concatenate([[1], r.randint(4, 500, size=10)]),
            np.asarray([1, 17, 23, 99, 5])]


def test_on_token_streams_every_token():
    """The callback sees each token as it lands, in order, including the
    admission-time first token — the stream equals the final tokens."""
    cfg, model, params = _model_and_params()
    eng = ServeEngine(model, params, max_batch=2, prompt_len=16,
                      max_len=40, eos_id=-1, pad_id=0)
    seen = {0: [], 1: []}
    incremental = []

    def cb(i):
        def on_token(req, tok):
            seen[i].append(tok)
            incremental.append(len(req.tokens))   # grows one at a time
        return on_token

    reqs = [eng.submit(p, max_new_tokens=6, on_token=cb(i))
            for i, p in enumerate(_prompts())]
    eng.run()
    for i, r in enumerate(reqs):
        assert seen[i] == list(r.tokens) and len(seen[i]) == 6
    # every callback fired with the token already appended
    assert all(n >= 1 for n in incremental)


def test_cancel_mid_decode_frees_slot():
    """Cancelling an in-flight request keeps its tokens so far, retires
    the slot, and the next queued request admits into it."""
    cfg, model, params = _model_and_params()
    eng = ServeEngine(model, params, max_batch=1, prompt_len=16,
                      max_len=64, eos_id=-1, pad_id=0)
    p0, p1 = _prompts()
    r0 = eng.submit(p0, max_new_tokens=30)
    for _ in range(4):
        eng.step()
    n_before = len(r0.tokens)
    assert 0 < n_before < 30
    r0.cancel()
    r1 = eng.submit(p1, max_new_tokens=5)
    eng.run()
    assert r0.done and r0.cancelled
    assert len(r0.tokens) == n_before            # nothing after cancel
    assert r1.done and len(r1.tokens) == 5       # slot was reused

    # r1's stream matches an uncontended engine (slot state fully reset)
    solo = ServeEngine(model, params, max_batch=1, prompt_len=16,
                       max_len=64, eos_id=-1, pad_id=0)
    rs = solo.submit(p1, max_new_tokens=5)
    solo.run()
    assert list(r1.tokens) == list(rs.tokens)


def test_cancel_while_queued_emits_nothing():
    cfg, model, params = _model_and_params()
    eng = ServeEngine(model, params, max_batch=1, prompt_len=16,
                      max_len=40, eos_id=-1, pad_id=0)
    p0, p1 = _prompts()
    r0 = eng.submit(p0, max_new_tokens=4)
    r1 = eng.submit(p1, max_new_tokens=4)        # waits for the one slot
    r1.cancel()
    eng.run()
    assert r0.done and len(r0.tokens) == 4
    assert r1.done and r1.tokens == []


def test_cancel_with_decode_block():
    """decode_block>1 may overshoot on-device after a cancel; the host
    discards the overshoot — no tokens after the cancel point."""
    cfg, model, params = _model_and_params()
    eng = ServeEngine(model, params, max_batch=1, prompt_len=16,
                      max_len=64, eos_id=-1, pad_id=0, decode_block=4)
    r0 = eng.submit(_prompts()[0], max_new_tokens=40)
    eng.step()
    n = len(r0.tokens)
    r0.cancel()
    eng.run()
    assert r0.done and len(r0.tokens) == n
