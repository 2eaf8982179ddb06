"""Fused int8 MLP kernel vs float reference + Mlp param compatibility."""

import numpy as np
import jax
import jax.numpy as jnp

from setok_tpu.kernels.fused_mlp import fused_mlp_int8, mlp_reference
from setok_tpu.ops.blocks import Mlp


def test_fused_mlp_close_to_float():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(40, 32).astype(np.float32))
    w1 = jnp.asarray(rs.randn(32, 64).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rs.randn(64).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rs.randn(64, 32).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rs.randn(32).astype(np.float32) * 0.1)
    got = np.asarray(fused_mlp_int8(x, w1, b1, w2, b2, block_m=16,
                                    interpret=True))
    want = np.asarray(mlp_reference(x, w1, b1, w2, b2))
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 0.03


def test_mlp_quant8_shares_params_with_float_path():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 10, 32).astype(np.float32))
    m_f = Mlp(hidden_features=64)
    m_q = Mlp(hidden_features=64, quant8=True)
    params = m_f.init(jax.random.PRNGKey(0), x)
    # quant path reads the identical tree
    q = m_q.apply(params, x)
    f = m_f.apply(params, x)
    assert q.shape == f.shape
    denom = float(jnp.abs(f).max())
    assert float(jnp.abs(q - f).max()) / denom < 0.05
    # init from the quant path produces the same tree structure
    params_q = m_q.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_q)


def test_fused_attention_close_to_float():
    from setok_tpu.kernels.fused_attention_int8 import fused_attention_int8
    from setok_tpu.ops.blocks import Attention
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 12, 32).astype(np.float32))
    mask = jnp.asarray(rs.rand(2, 12, 12) > 0.2)
    mask = mask | jnp.eye(12, dtype=bool)[None]
    attn_f = Attention(num_heads=2)
    attn_q = Attention(num_heads=2, quant8=True)
    params = attn_f.init(jax.random.PRNGKey(0), x, mask)
    f = attn_f.apply(params, x, mask)
    q = attn_q.apply(params, x, mask)
    denom = float(jnp.abs(f).max())
    assert float(jnp.abs(q - f).max()) / denom < 0.06
    # param trees identical between paths
    params_q = attn_q.init(jax.random.PRNGKey(0), x, mask)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_q)


def test_fused_bert_attention_close_to_float():
    from setok_tpu.models.qformer import BertSelfAttentionCore
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 8, 32).astype(np.float32))
    kv = jnp.asarray(rs.randn(2, 6, 32).astype(np.float32))
    kv_mask = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0],
                                    [1, 1, 1, 1, 1, 1]], bool))
    a_f = BertSelfAttentionCore(num_heads=2)
    a_q = BertSelfAttentionCore(num_heads=2, quant8=True)
    params = a_f.init(jax.random.PRNGKey(0), x, kv, kv_mask)
    f = a_f.apply(params, x, kv, kv_mask)
    q = a_q.apply(params, x, kv, kv_mask)
    denom = float(jnp.abs(f).max())
    assert float(jnp.abs(q - f).max()) / denom < 0.06
    # self-attention variant + identical param trees
    params_q = a_q.init(jax.random.PRNGKey(0), x, kv, kv_mask)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_q)
    fs = a_f.apply(params, x)
    qs = a_q.apply(params, x)
    assert float(jnp.abs(qs - fs).max()) / float(jnp.abs(fs).max()) < 0.06
