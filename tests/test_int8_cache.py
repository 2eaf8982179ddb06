"""int8 KV cache: quantized cache reads must track the float cache.

Decode attention is cache-READ-bandwidth-bound (B·S·layers·2·kv·dh bytes
per token), so cache width sets its speed; int8+per-token scales is ~51%
of bf16 traffic. These tests pin the numerics: per-token symmetric
quantization of K/V costs <1% logit error on a tiny trunk, the serving
engine runs end-to-end on an int8 cache, and speculative verification
still rewinds correctly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from setok_tpu import config as cfgs
from setok_tpu.models.setokim import Setokim
from setok_tpu.serve import ServeEngine

# engine end-to-end runs compile several graphs — full tier (the logit
# numerics test below stays in smoke)


def _model_and_params():
    cfg = cfgs.tiny_setokim()
    model = Setokim(cfg, target_token_id=3)
    ids0 = np.zeros((2, 12), np.int64)
    ids0[:, :5] = [[1, 17, 23, 99, 5], [1, 7, 3, 11, 2]]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids0),
                        method=lambda m, i: m.llama(i))
    return cfg, model, params, ids0


def test_int8_cache_decode_logits_close_to_float():
    cfg, model, params, ids0 = _model_and_params()
    outs = {}
    for dt in (jnp.float32, jnp.int8):
        logits, hidden, cache, valid, pos = model.apply(
            params, jnp.asarray(ids0), 32, cache_dtype=dt,
            method=model.prefill_text)
        # two decode steps so the second reads quantized entries written
        # by both the prefill AND a previous decode step
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        next_pos = jnp.sum(valid.astype(jnp.int32), axis=1)
        for _ in range(2):
            lg, hid, cache, valid = model.apply(
                params, nxt[:, None], cache, valid, next_pos,
                method=model.decode_step)
            nxt = jnp.argmax(lg, -1).astype(jnp.int32)
            next_pos = next_pos + 1
        outs[str(dt)] = (np.asarray(logits, np.float32),
                         np.asarray(lg, np.float32))
    for a, b in zip(*outs.values()):
        scale = np.abs(a).max()
        assert np.abs(a - b).max() / scale < 0.02, \
            np.abs(a - b).max() / scale
    # int8 cache actually stores int8
    assert cache.k.dtype == jnp.int8 and cache.k_scale is not None


@pytest.mark.full
def test_serve_engine_int8_cache_end_to_end():
    cfg, model, params, ids0 = _model_and_params()
    toks = {}
    for dt in (jnp.bfloat16, jnp.int8):
        eng = ServeEngine(model, params, max_batch=2, prompt_len=12,
                          max_len=32, eos_id=-1, pad_id=0, cache_dtype=dt)
        reqs = [eng.submit(ids0[i], max_new_tokens=6) for i in range(2)]
        eng.run()
        toks[str(dt)] = [list(r.tokens) for r in reqs]
        assert all(len(r.tokens) == 6 for r in reqs)
    # greedy streams agree at tiny scale (near-tie flips would show as a
    # suffix divergence; quantization noise here is ~1e-3 of logit scale)
    assert toks[str(jnp.bfloat16)] == toks[str(jnp.int8)], toks


@pytest.mark.full
def test_serve_engine_int8_cache_with_speculation():
    cfg, model, params, ids0 = _model_and_params()
    eng = ServeEngine(model, params, max_batch=2, prompt_len=12,
                      max_len=40, eos_id=-1, pad_id=0,
                      cache_dtype=jnp.int8, spec_len=3)
    reqs = [eng.submit(ids0[i], max_new_tokens=8) for i in range(2)]
    eng.run()
    for r in reqs:
        assert len(r.tokens) == 8


@pytest.mark.full
def test_tp_sharded_int8_cache_matches_single_device():
    """TP mesh + int8 cache: the k_scale/v_scale buffers get their own
    (kv-head-sharded) NamedSharding at engine init and ride the slot
    insert/decode paths; tokens must match the unsharded int8 engine."""
    from setok_tpu import config as cfgs_
    from setok_tpu.parallel.mesh import make_mesh

    cfg, model, params, ids0 = _model_and_params()
    outs = []
    for mesh in (None, make_mesh(cfgs_.MeshConfig(data=4, model=2))):
        eng = ServeEngine(model, params, max_batch=2, prompt_len=12,
                          max_len=32, eos_id=-1, pad_id=0,
                          cache_dtype=jnp.int8, mesh=mesh)
        reqs = [eng.submit(ids0[i], max_new_tokens=6) for i in range(2)]
        eng.run()
        assert eng._cache.k.dtype == jnp.int8
        assert eng._cache.k_scale is not None
        outs.append([list(r.tokens) for r in reqs])
    assert outs[0] == outs[1], outs


@pytest.mark.full
def test_decode_block_int8_cache_matches_single_step():
    """decode_block (K on-device steps per dispatch) over an int8 cache:
    the blocked scan carries the quantized cache + scales through
    _replace; tokens must match the single-step int8 engine."""
    cfg, model, params, ids0 = _model_and_params()
    outs = []
    for blk in (1, 3):
        eng = ServeEngine(model, params, max_batch=2, prompt_len=12,
                          max_len=40, eos_id=-1, pad_id=0,
                          cache_dtype=jnp.int8, decode_block=blk)
        reqs = [eng.submit(ids0[i], max_new_tokens=8) for i in range(2)]
        eng.run()
        outs.append([list(r.tokens) for r in reqs])
    assert outs[0] == outs[1], outs


def test_cache_kernel_opt_in_matches_default_path():
    """cache_kernel=True (the opt-in Pallas in-kernel dequant — measured
    slower on chip, PERF.md 'int8 KV cache') must stay numerically in
    line with the shipping XLA-dequant default."""
    cfg = cfgs.tiny_setokim()
    ids0 = np.zeros((2, 12), np.int64)
    ids0[:, :5] = [[1, 17, 23, 99, 5], [1, 7, 3, 11, 2]]
    outs = []
    for use_kernel in (False, True):
        model = Setokim(cfg, target_token_id=3, cache_kernel=use_kernel)
        if not outs:
            params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids0),
                                method=lambda m, i: m.llama(i))
        logits, hidden, cache, valid, pos = model.apply(
            params, jnp.asarray(ids0), 32, cache_dtype=jnp.int8,
            method=model.prefill_text)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        next_pos = jnp.sum(valid.astype(jnp.int32), axis=1)
        lg, hid, cache, valid = model.apply(
            params, nxt[:, None], cache, valid, next_pos,
            method=model.decode_step)
        outs.append(np.asarray(lg, np.float32))
    scale = np.abs(outs[0]).max()
    assert np.abs(outs[0] - outs[1]).max() / scale < 5e-3


def test_cache_attention_kernel_matches_dequant_reference():
    """kernels/cache_attention.py == dequantize-then-attend, GQA + mask."""
    from setok_tpu.kernels.cache_attention import int8_cache_decode_attention

    rs = np.random.RandomState(3)
    B, S, KVH, G, D = 2, 64, 2, 3, 32
    H = KVH * G
    q = rs.randn(B, H, D).astype(np.float32)
    kf = rs.randn(B, S, KVH, D).astype(np.float32)
    vf = rs.randn(B, S, KVH, D).astype(np.float32)
    ks = (np.abs(kf).max(-1) / 127.0 + 1e-8).astype(np.float32)
    vs = (np.abs(vf).max(-1) / 127.0 + 1e-8).astype(np.float32)
    k8 = np.clip(np.round(kf / ks[..., None]), -127, 127).astype(np.int8)
    v8 = np.clip(np.round(vf / vs[..., None]), -127, 127).astype(np.int8)
    valid = rs.rand(B, S) > 0.3
    valid[:, 0] = True

    got = np.asarray(int8_cache_decode_attention(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(ks),
        jnp.asarray(v8), jnp.asarray(vs), jnp.asarray(valid),
        interpret=True))

    kd = (k8.astype(np.float32) * ks[..., None]).repeat(G, axis=2)
    vd = (v8.astype(np.float32) * vs[..., None]).repeat(G, axis=2)
    s = np.einsum("bhd,bshd->bhs", q, kd) / np.sqrt(D)
    s = np.where(valid[:, None, :], s, -1e30)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("bhs,bshd->bhd", p, vd)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
