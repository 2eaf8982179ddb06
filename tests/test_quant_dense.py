"""QuantDense (int8-at-rest linear) oracle tests."""

import numpy as np
import jax
import jax.numpy as jnp

from setok_tpu.kernels.quant_matmul import quantize_weight
from setok_tpu.ops.blocks import QuantDense


def test_quant_dense_matches_dequant_oracle():
    """QuantDense forward == per-row-activation-quant reference math."""
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(64, 48).astype(np.float32) * 0.1)
    x = jnp.asarray(rs.randn(8, 64).astype(np.float32))
    qw = quantize_weight(w)
    params = {"params": {"q": qw.values, "s": qw.scales}}
    out = QuantDense(48).apply(params, x)

    xs = np.maximum(np.max(np.abs(np.asarray(x)), -1, keepdims=True),
                    1e-8) / 127.0
    x8 = np.clip(np.round(np.asarray(x) / xs), -127, 127)
    ref = (x8 @ np.asarray(qw.values, np.int64)) * xs * np.asarray(qw.scales)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    # quantization error vs the float matmul is bounded
    exact = np.asarray(x) @ np.asarray(w)
    rel = np.abs(np.asarray(out) - exact).max() / np.abs(exact).max()
    assert rel < 0.05, rel


def test_quantize_trunk_weights_structure():
    """Converter produces exactly the tree QuantDense-flagged modules
    declare, and non-trunk leaves are untouched."""
    from setok_tpu import config as cfgs
    from setok_tpu.models.llama import (LlamaForCausalLM,
                                        quantize_trunk_weights)
    cfg = cfgs.tiny_llama()
    ids = jnp.zeros((1, 4), jnp.int32)
    p_f = LlamaForCausalLM(cfg).init(jax.random.PRNGKey(0), ids)
    p_q = quantize_trunk_weights(p_f)
    p_ref = LlamaForCausalLM(cfg, weight_bits=8).init(
        jax.random.PRNGKey(0), ids)
    assert (jax.tree_util.tree_structure(p_q)
            == jax.tree_util.tree_structure(p_ref))
    # embeddings unchanged
    a = p_f["params"]["embed_tokens"]["embedding"]
    b = p_q["params"]["embed_tokens"]["embedding"]
    assert np.array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------- int4
def test_quant4_matmul_oracle():
    """Packed-nibble w4a8 kernel == dequantized reference math (same
    weight error, exact activation quant), interpret mode on CPU."""
    from setok_tpu.kernels.quant_matmul import (matmul4_reference,
                                                quant4_matmul,
                                                quantize_weight_int4)
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(64, 48).astype(np.float32) * 0.1)
    x = jnp.asarray(rs.randn(9, 64).astype(np.float32))   # odd M → pad path
    qw = quantize_weight_int4(w)
    out = quant4_matmul(x, qw, interpret=True)

    xs = np.maximum(np.max(np.abs(np.asarray(x)), -1, keepdims=True),
                    1e-8) / 127.0
    x8 = np.clip(np.round(np.asarray(x) / xs), -127, 127)
    ref = np.asarray(matmul4_reference(jnp.asarray(x8 * xs), qw))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    # int4 error vs the float matmul is bounded (looser than int8)
    exact = np.asarray(x) @ np.asarray(w)
    rel = np.abs(np.asarray(out) - exact).max() / np.abs(exact).max()
    assert rel < 0.15, rel


def test_quant4_pack_roundtrip():
    """pack(quantize_int4) → unpack recovers the exact int4 planes."""
    from setok_tpu.kernels.quant_matmul import (quantize_weight_int4,
                                                unpack_nibbles)
    rs = np.random.RandomState(1)
    w = jnp.asarray(rs.randn(32, 16).astype(np.float32))
    qw = quantize_weight_int4(w)
    lo, hi = unpack_nibbles(qw.packed)
    full = np.concatenate([np.asarray(lo), np.asarray(hi)], axis=0)
    direct = np.clip(np.round(np.asarray(w) / np.asarray(qw.scales)),
                     -7, 7)
    np.testing.assert_array_equal(full, direct)
    assert full.min() >= -7 and full.max() <= 7


def test_quantize_trunk_weights_int4_structure():
    """bits=4 converter produces exactly the tree Quant4Dense-flagged
    modules declare; embeddings untouched."""
    from setok_tpu import config as cfgs
    from setok_tpu.models.llama import (LlamaForCausalLM,
                                        quantize_trunk_weights)
    cfg = cfgs.tiny_llama()
    ids = jnp.zeros((1, 4), jnp.int32)
    p_f = LlamaForCausalLM(cfg).init(jax.random.PRNGKey(0), ids)
    p_q = quantize_trunk_weights(p_f, bits=4)
    p_ref = LlamaForCausalLM(cfg, weight_bits=4).init(
        jax.random.PRNGKey(0), ids)
    assert (jax.tree_util.tree_structure(p_q)
            == jax.tree_util.tree_structure(p_ref))
    a = p_f["params"]["embed_tokens"]["embedding"]
    b = p_q["params"]["embed_tokens"]["embedding"]
    assert np.array_equal(np.asarray(a), np.asarray(b))
    # forward agrees with the float trunk to int4 tolerance
    lf = LlamaForCausalLM(cfg).apply(p_f, ids)[0]
    lq = LlamaForCausalLM(cfg, weight_bits=4).apply(p_q, ids)[0]
    corr = np.corrcoef(np.asarray(lf).ravel(), np.asarray(lq).ravel())[0, 1]
    assert corr > 0.95, corr


def test_quant4_grouped_oracle_and_error():
    """Per-group (G=16) int4: kernel == grouped-dequant reference, and the
    group scales measurably beat per-channel RTN error on weights with
    per-row outliers (the regime real LLM linears live in)."""
    from setok_tpu.kernels.quant_matmul import (matmul4_reference,
                                                quant4_matmul,
                                                quantize_weight_int4)
    rs = np.random.RandomState(2)
    w = rs.randn(64, 48).astype(np.float32) * 0.1
    w[5] *= 12.0                 # outlier input rows inflate column scales
    w[40] *= 9.0
    w = jnp.asarray(w)
    x = jnp.asarray(rs.randn(8, 64).astype(np.float32))

    qg = quantize_weight_int4(w, group_size=16)
    assert qg.scales.shape == (4, 48)
    out = quant4_matmul(x, qg, interpret=True)
    xs = np.maximum(np.max(np.abs(np.asarray(x)), -1, keepdims=True),
                    1e-8) / 127.0
    x8 = np.clip(np.round(np.asarray(x) / xs), -127, 127)
    ref = np.asarray(matmul4_reference(jnp.asarray(x8 * xs), qg))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)

    qc = quantize_weight_int4(w)     # per-channel baseline
    exact = np.asarray(x) @ np.asarray(w)

    def rms(q):
        d = np.asarray(quant4_matmul(x, q, interpret=True)) - exact
        return np.sqrt((d * d).mean()) / np.sqrt((exact * exact).mean())

    ec, eg = rms(qc), rms(qg)
    assert eg < 0.65 * ec, (ec, eg)


def test_quant4_group_trunk_structure():
    """quantize_trunk_weights(bits=4, group_size=G) matches the
    quant_group-flagged module tree; valid_quant_group falls back for
    non-dividing tiny dims."""
    from setok_tpu import config as cfgs
    from setok_tpu.models.llama import (LlamaForCausalLM,
                                        quantize_trunk_weights,
                                        valid_quant_group)
    cfg = cfgs.tiny_llama()
    assert valid_quant_group(cfg, 128) == 0        # hidden 64 can't
    assert valid_quant_group(cfg, 16) == 16
    ids = jnp.zeros((1, 4), jnp.int32)
    p_f = LlamaForCausalLM(cfg).init(jax.random.PRNGKey(0), ids)
    p_q = quantize_trunk_weights(p_f, bits=4, group_size=16)
    p_ref = LlamaForCausalLM(cfg, weight_bits=4, quant_group=16).init(
        jax.random.PRNGKey(0), ids)
    assert (jax.tree_util.tree_structure(p_q)
            == jax.tree_util.tree_structure(p_ref))
    for a, b in zip(jax.tree_util.tree_leaves(p_q),
                    jax.tree_util.tree_leaves(p_ref)):
        assert a.shape == b.shape, (a.shape, b.shape)
    lf = LlamaForCausalLM(cfg).apply(p_f, ids)[0]
    lq = LlamaForCausalLM(cfg, weight_bits=4, quant_group=16).apply(
        p_q, ids)[0]
    corr = np.corrcoef(np.asarray(lf).ravel(), np.asarray(lq).ravel())[0, 1]
    assert corr > 0.97, corr


def test_quant4_clip_search_reduces_error():
    """clip_search picks per-group scales that beat absmax RTN in weighted
    reconstruction error — and the packed layout stays kernel-compatible.

    Heavy-tailed weights (student-t) are the regime where absmax wastes
    steps on one outlier; clipping it buys a finer step for the rest."""
    from setok_tpu.kernels.quant_matmul import (quant4_matmul,
                                                quantize_weight_int4)
    rs = np.random.RandomState(7)
    w = jnp.asarray(rs.standard_t(4, size=(64, 48)).astype(np.float32)
                    * 0.05)
    x = jnp.asarray(rs.randn(8, 64).astype(np.float32))
    exact = np.asarray(x) @ np.asarray(w)

    def rms(q):
        d = np.asarray(quant4_matmul(x, q, interpret=True)) - exact
        return np.sqrt((d * d).mean()) / np.sqrt((exact * exact).mean())

    for gs in (None, 16):
        q_rtn = quantize_weight_int4(w, group_size=gs)
        q_cs = quantize_weight_int4(w, group_size=gs, clip_search=8)
        assert q_cs.packed.shape == q_rtn.packed.shape
        assert q_cs.scales.shape == q_rtn.scales.shape
        e_rtn, e_cs = rms(q_rtn), rms(q_cs)
        assert e_cs < e_rtn, (gs, e_rtn, e_cs)
    # weight-space reconstruction improves too (the search objective)
    q_rtn = quantize_weight_int4(w, group_size=16)
    q_cs = quantize_weight_int4(w, group_size=16, clip_search=8)
    from setok_tpu.kernels.quant_matmul import matmul4_reference
    eye = jnp.eye(64, dtype=jnp.float32)
    w_rtn = np.asarray(matmul4_reference(eye, q_rtn))
    w_cs = np.asarray(matmul4_reference(eye, q_cs))
    err = lambda a: np.sqrt(((a - np.asarray(w)) ** 2).mean())
    assert err(w_cs) < err(w_rtn)


def test_quant4_clip_search_row_weight():
    """row_weight steers the search: with importance mass on a row subset,
    the weighted output error (== error on inputs living in that subspace)
    beats the unweighted search on the same inputs."""
    from setok_tpu.kernels.quant_matmul import (matmul4_reference,
                                                quantize_weight_int4)
    rs = np.random.RandomState(11)
    w = jnp.asarray(rs.standard_t(4, size=(64, 48)).astype(np.float32)
                    * 0.05)
    # calibration activations: only the first 16 input dims carry energy
    d = np.zeros((64,), np.float32)
    d[:16] = 1.0
    x = rs.randn(32, 64).astype(np.float32) * d[None, :]
    exact = x @ np.asarray(w)

    def out_rms(q):
        got = np.asarray(matmul4_reference(jnp.asarray(x), q))
        dd = got - exact
        return np.sqrt((dd * dd).mean())

    q_plain = quantize_weight_int4(w, group_size=16, clip_search=8)
    q_cal = quantize_weight_int4(w, group_size=16, clip_search=8,
                                 row_weight=jnp.asarray(d ** 2))
    assert out_rms(q_cal) <= out_rms(q_plain) * 1.0001, \
        (out_rms(q_plain), out_rms(q_cal))
