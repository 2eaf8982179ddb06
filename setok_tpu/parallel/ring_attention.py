"""Ring attention: sequence-parallel exact attention over the ICI ring.

The reference has no sequence parallelism (SURVEY.md §2.6: max seq 2048,
memory handled by flash-attn + checkpointing); this is the optional
long-context extension SURVEY.md §5 sketches — shard the sequence over a
mesh axis, keep Q local, and rotate K/V blocks around the ring with
`jax.lax.ppermute` while accumulating flash-style online softmax. Peak
memory per device is O(L_local²) instead of O(L²), and the K/V transfers
overlap compute around the ring (XLA schedules the collective-permute
against the local matmuls).

Use inside `jax.shard_map` with q/k/v sharded on the sequence axis:

    mesh = jax.make_mesh((8,), ("seq",))
    out = shard_map(lambda q, k, v: ring_attention(q, k, v, "seq",
                                                   causal=True),
                    mesh=mesh, in_specs=(P(None, None, "seq", None),) * 3,
                    out_specs=P(None, None, "seq", None))(q, k, v)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   axis_name: str, causal: bool = True,
                   sm_scale: Optional[float] = None) -> jnp.ndarray:
    """Exact attention with K/V rotated around `axis_name`.

    q/k/v: (B, H, L_local, D) — the local sequence shard (all shards equal
    length, concatenated in ring order = global sequence order).
    Returns (B, H, L_local, D).
    """
    n_dev = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, h, l_local, d = q.shape
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)

    q32 = q.astype(jnp.float32)
    # global positions of my queries
    q_pos = my_idx * l_local + jnp.arange(l_local)

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def body(step, carry):
        m, l, o, k_cur, v_cur = carry
        # the block currently held came from device (my_idx - step) mod n
        src = jax.lax.rem(my_idx - step + n_dev, n_dev)
        kv_pos = src * l_local + jnp.arange(l_local)

        s = jnp.einsum("bhqd,bhkd->bhqk", q32,
                       k_cur.astype(jnp.float32)) * scale
        if causal:
            allowed = q_pos[:, None] >= kv_pos[None, :]
            s = jnp.where(allowed[None, None], s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        m_new = jnp.maximum(m_new, -1e30)
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        if causal:
            p = jnp.where(allowed[None, None], p, 0.0)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        o_new = o * corr + jnp.einsum("bhqk,bhkd->bhqd", p,
                                      v_cur.astype(jnp.float32))

        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return m_new, l_new, o_new, k_nxt, v_nxt

    # mark the accumulators as device-varying over the ring axis (shard_map
    # tracks varying-ness; the loop body's outputs vary because q does)
    def _vary(x):
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(x, axis_name, to="varying")
        return jax.lax.pvary(x, axis_name)

    m0 = _vary(jnp.full((b, h, l_local, 1), -jnp.inf, jnp.float32))
    l0 = _vary(jnp.zeros((b, h, l_local, 1), jnp.float32))
    o0 = _vary(jnp.zeros((b, h, l_local, d), jnp.float32))
    m, l, o, _, _ = jax.lax.fori_loop(0, n_dev, body, (m0, l0, o0, k, v))

    l = jnp.maximum(l, 1e-30)
    out = o / l
    # rows with no visible keys (can't happen for causal with self) → 0
    return out.astype(q.dtype)
