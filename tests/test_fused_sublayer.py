"""Fused int8 sublayer kernels (LN + attn/MLP + residual in one pallas call)
vs the float module path, plus param-tree compatibility of the fused blocks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from setok_tpu.kernels.fused_sublayer import (attn_sublayer_int8,
                                              mlp_sublayer_int8)
from setok_tpu.ops.blocks import Block, ViTBlock


def _ln(x, g, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


def _attn_ref(y, wqkv, bqkv, wp, bp, heads, mask=None):
    n, c = y.shape[-2:]
    hd = c // heads
    qkv = y @ wqkv + bqkv
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    outs = []
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        s = q[..., sl] @ np.swapaxes(k[..., sl], -1, -2) * hd ** -0.5
        if mask is not None:
            s = np.where(mask, s, -1e30)
        p = np.exp(s - s.max(-1, keepdims=True))
        if mask is not None:
            p = p * mask
        p = p / np.maximum(p.sum(-1, keepdims=True), 1e-30)
        outs.append(p @ v[..., sl])
    return np.concatenate(outs, -1) @ wp + bp


def test_attn_sublayer_matches_float():
    rs = np.random.RandomState(0)
    b, n, c, heads = 2, 16, 32, 4
    x = rs.randn(b, n, c).astype(np.float32)
    g = rs.rand(c).astype(np.float32) + 0.5
    bb = rs.randn(c).astype(np.float32) * 0.1
    wqkv = (rs.randn(c, 3 * c) * 0.1).astype(np.float32)
    bqkv = (rs.randn(3 * c) * 0.1).astype(np.float32)
    wp = (rs.randn(c, c) * 0.1).astype(np.float32)
    bp = (rs.randn(c) * 0.1).astype(np.float32)

    got = np.asarray(attn_sublayer_int8(
        jnp.asarray(x), jnp.asarray(g), jnp.asarray(bb), jnp.asarray(wqkv),
        jnp.asarray(bqkv), jnp.asarray(wp), jnp.asarray(bp), heads,
        interpret=True))
    want = x + _attn_ref(_ln(x, g, bb), wqkv, bqkv, wp, bp, heads)
    assert np.abs(got - want).max() / np.abs(want).max() < 0.05


def test_attn_sublayer_masked_matches_float():
    rs = np.random.RandomState(1)
    b, n, c, heads = 2, 16, 32, 4
    x = rs.randn(b, n, c).astype(np.float32)
    g = np.ones(c, np.float32)
    bb = np.zeros(c, np.float32)
    wqkv = (rs.randn(c, 3 * c) * 0.1).astype(np.float32)
    bqkv = np.zeros(3 * c, np.float32)
    wp = (rs.randn(c, c) * 0.1).astype(np.float32)
    bp = np.zeros(c, np.float32)
    # block-diagonal mask (two clusters), like the inner encoder's
    mask = np.zeros((b, n, n), bool)
    mask[:, :8, :8] = True
    mask[:, 8:, 8:] = True

    got = np.asarray(attn_sublayer_int8(
        jnp.asarray(x), jnp.asarray(g), jnp.asarray(bb), jnp.asarray(wqkv),
        jnp.asarray(bqkv), jnp.asarray(wp), jnp.asarray(bp), heads,
        mask=jnp.asarray(mask), interpret=True))
    want = x + _attn_ref(_ln(x, g, bb), wqkv, bqkv, wp, bp, heads,
                         mask=mask[:, None][:, 0][..., :, :])
    assert np.abs(got - want).max() / np.abs(want).max() < 0.05


def test_mlp_sublayer_matches_float():
    rs = np.random.RandomState(2)
    x = rs.randn(3, 16, 32).astype(np.float32)
    g = rs.rand(32).astype(np.float32) + 0.5
    bb = rs.randn(32).astype(np.float32) * 0.1
    w1 = (rs.randn(32, 64) * 0.1).astype(np.float32)
    b1 = (rs.randn(64) * 0.1).astype(np.float32)
    w2 = (rs.randn(64, 32) * 0.1).astype(np.float32)
    b2 = (rs.randn(32) * 0.1).astype(np.float32)

    got = np.asarray(mlp_sublayer_int8(
        jnp.asarray(x), jnp.asarray(g), jnp.asarray(bb), jnp.asarray(w1),
        jnp.asarray(b1), jnp.asarray(w2), jnp.asarray(b2), block_m=16,
        interpret=True))
    y = _ln(x, g, bb)
    h = y @ w1 + b1
    h = 0.5 * h * (1 + np.tanh(np.sqrt(2 / np.pi) * (h + 0.044715 * h ** 3)))
    want = x + h @ w2 + b2
    assert np.abs(got - want).max() / np.abs(want).max() < 0.05


@pytest.mark.parametrize("cls,kw", [
    (ViTBlock, dict(num_heads=4)),
    (Block, dict(num_heads=4, mlp_hidden_dim=64, depth=2)),
])
def test_fused_block_param_tree_and_output(cls, kw):
    """quant8 fused blocks read the identical param tree as the float path
    and produce close outputs (the Setokim quant8 regression class)."""
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 16, 32).astype(np.float32))
    m_f = cls(**kw)
    m_q = cls(quant8=True, **kw)
    params = m_f.init(jax.random.PRNGKey(0), x)
    params_q = m_q.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_q))
    f = m_f.apply(params, x)
    q = m_q.apply(params, x)
    assert float(jnp.abs(q - f).max()) / float(jnp.abs(f).max()) < 0.08


def test_mlp_postnorm_matches_float():
    from setok_tpu.kernels.fused_sublayer import mlp_postnorm_int8
    rs = np.random.RandomState(4)
    x = rs.randn(2, 16, 32).astype(np.float32)
    w1 = (rs.randn(32, 64) * 0.1).astype(np.float32)
    b1 = (rs.randn(64) * 0.1).astype(np.float32)
    w2 = (rs.randn(64, 32) * 0.1).astype(np.float32)
    b2 = (rs.randn(32) * 0.1).astype(np.float32)
    g = rs.rand(32).astype(np.float32) + 0.5
    bb = rs.randn(32).astype(np.float32) * 0.1

    got = np.asarray(mlp_postnorm_int8(
        jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2),
        jnp.asarray(b2), jnp.asarray(g), jnp.asarray(bb), block_m=16,
        interpret=True))
    h = x @ w1 + b1
    h = 0.5 * h * (1 + np.tanh(np.sqrt(2 / np.pi) * (h + 0.044715 * h ** 3)))
    want = _ln(x + h @ w2 + b2, g, bb, eps=1e-12)
    assert np.abs(got - want).max() / np.abs(want).max() < 0.05


def test_qformer_quant8_param_tree_and_output():
    from setok_tpu.models.qformer import QFormer
    rs = np.random.RandomState(5)
    q = jnp.asarray(rs.randn(2, 16, 32).astype(np.float32))
    enc = jnp.asarray(rs.randn(2, 8, 32).astype(np.float32))
    m_f = QFormer(num_layers=2, num_heads=4, dropout=0.0, attn_dropout=0.0)
    m_q = QFormer(num_layers=2, num_heads=4, dropout=0.0, attn_dropout=0.0,
                  quant8=True)
    params = m_f.init(jax.random.PRNGKey(0), q, enc)
    params_q = m_q.init(jax.random.PRNGKey(0), q, enc)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_q))
    f = m_f.apply(params, q, enc)
    qq = m_q.apply(params, q, enc)
    assert float(jnp.abs(qq - f).max()) / float(jnp.abs(f).max()) < 0.08


def test_attn_sublayer_padded_head_dim():
    """head_dim not a lane multiple (decoder: 768/16=48) goes through the
    zero-padded head layout — must match the unpadded math exactly."""
    rs = np.random.RandomState(6)
    b, n, c, heads = 2, 16, 96, 2        # head_dim 48 → padded 64
    x = rs.randn(b, n, c).astype(np.float32)
    g = rs.rand(c).astype(np.float32) + 0.5
    bb = rs.randn(c).astype(np.float32) * 0.1
    wqkv = (rs.randn(c, 3 * c) * 0.1).astype(np.float32)
    bqkv = (rs.randn(3 * c) * 0.1).astype(np.float32)
    wp = (rs.randn(c, c) * 0.1).astype(np.float32)
    bp = (rs.randn(c) * 0.1).astype(np.float32)

    got = np.asarray(attn_sublayer_int8(
        jnp.asarray(x), jnp.asarray(g), jnp.asarray(bb), jnp.asarray(wqkv),
        jnp.asarray(bqkv), jnp.asarray(wp), jnp.asarray(bp), heads,
        interpret=True))
    want = x + _attn_ref(_ln(x, g, bb), wqkv, bqkv, wp, bp, heads)
    assert np.abs(got - want).max() / np.abs(want).max() < 0.05
