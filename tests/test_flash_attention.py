"""Pallas flash-attention vs plain-jax reference (interpret mode on CPU)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from setok_tpu.kernels.flash_attention import (attention_reference,
                                               flash_attention)


pytestmark = pytest.mark.full


def make_qkv(b=2, h=2, lq=16, lk=16, d=8, seed=0):
    rs = np.random.RandomState(seed)
    q = jnp.asarray(rs.randn(b, h, lq, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, h, lk, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h, lk, d).astype(np.float32))
    return q, k, v


def causal_mask_with_holes(b, lq, lk, seed=1):
    rs = np.random.RandomState(seed)
    valid = rs.rand(b, lk) > 0.2
    pos = np.where(valid, np.cumsum(valid, 1) - 1, lk + 1)
    causal = pos[:, :lq, None] >= pos[:, None, :]
    m = causal & valid[:, :lq, None] & valid[:, None, :]
    return jnp.asarray(m)


def test_forward_matches_reference():
    q, k, v = make_qkv()
    mask = causal_mask_with_holes(2, 16, 16)
    got = flash_attention(q, k, v, mask, None, 8, True)
    want = attention_reference(q, k, v, mask)
    valid_rows = np.asarray(mask).any(-1)
    np.testing.assert_allclose(np.asarray(got)[valid_rows[:, None]
                                               .repeat(2, 1)],
                               np.asarray(want)[valid_rows[:, None]
                                                .repeat(2, 1)],
                               rtol=1e-5, atol=1e-5)


def test_forward_uneven_lengths_and_blocks():
    q, k, v = make_qkv(lq=13, lk=21)     # non-multiples of block
    mask = jnp.ones((2, 13, 21), bool)
    got = flash_attention(q, k, v, mask, None, 8, True)
    want = attention_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    q, k, v = make_qkv(lq=16, lk=16)
    mask = causal_mask_with_holes(2, 16, 16)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, mask, None, 8, True)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, mask)
        return jnp.sum(o * jnp.cos(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4), name


def test_fully_masked_rows_are_safe():
    q, k, v = make_qkv()
    mask = jnp.zeros((2, 16, 16), bool)   # everything masked
    got = flash_attention(q, k, v, mask, None, 8, True)
    assert np.isfinite(np.asarray(got)).all()
    g = jax.grad(lambda q: jnp.sum(
        flash_attention(q, k, v, mask, None, 8, True)))(q)
    assert np.isfinite(np.asarray(g)).all()
