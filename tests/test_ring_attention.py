"""Ring attention over an 8-device mesh == single-device full attention."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from setok_tpu.parallel.ring_attention import ring_attention


pytestmark = pytest.mark.full


def full_attention(q, k, v, causal=True):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / (d ** 0.5)
    if causal:
        L = q.shape[2]
        mask = jnp.tril(jnp.ones((L, L), bool))
        s = jnp.where(mask[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full(causal):
    rs = np.random.RandomState(0)
    B, H, L, D = 2, 2, 64, 16          # 8 devices → 8 tokens per shard
    q = jnp.asarray(rs.randn(B, H, L, D).astype(np.float32))
    k = jnp.asarray(rs.randn(B, H, L, D).astype(np.float32))
    v = jnp.asarray(rs.randn(B, H, L, D).astype(np.float32))

    mesh = jax.make_mesh((8,), ("seq",))
    spec = P(None, None, "seq", None)

    ring = jax.jit(shard_map(
        lambda q, k, v: ring_attention(q, k, v, "seq", causal=causal),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec))

    got = np.asarray(ring(q, k, v))
    want = np.asarray(full_attention(q, k, v, causal=causal))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_ring_is_differentiable():
    rs = np.random.RandomState(1)
    B, H, L, D = 1, 2, 32, 8
    q = jnp.asarray(rs.randn(B, H, L, D).astype(np.float32))
    k = jnp.asarray(rs.randn(B, H, L, D).astype(np.float32))
    v = jnp.asarray(rs.randn(B, H, L, D).astype(np.float32))
    mesh = jax.make_mesh((8,), ("seq",))
    spec = P(None, None, "seq", None)
    ring = shard_map(lambda q, k, v: ring_attention(q, k, v, "seq"),
                     mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)

    g_ring = jax.jit(jax.grad(
        lambda q: jnp.sum(jnp.cos(ring(q, k, v)))))(q)
    g_full = jax.jit(jax.grad(
        lambda q: jnp.sum(jnp.cos(full_attention(q, k, v)))))(q)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_full),
                               rtol=2e-3, atol=2e-4)
