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
    p_ref = LlamaForCausalLM(cfg, weights_int8=True).init(
        jax.random.PRNGKey(0), ids)
    assert (jax.tree_util.tree_structure(p_q)
            == jax.tree_util.tree_structure(p_ref))
    # embeddings unchanged
    a = p_f["params"]["embed_tokens"]["embedding"]
    b = p_q["params"]["embed_tokens"]["embedding"]
    assert np.array_equal(np.asarray(a), np.asarray(b))
