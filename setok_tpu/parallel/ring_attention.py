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
                   sm_scale: Optional[float] = None,
                   positions: Optional[jnp.ndarray] = None,
                   valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Exact attention with K/V rotated around `axis_name`.

    q/k/v: (B, H, L_local, D) — the local sequence shard (all shards equal
    length, concatenated in ring order = global sequence order).
    Returns (B, H, L_local, D).

    positions/valid: optional (B, L_local) hole-aware global positions and
    token validity of the local shard (the Setokim splice leaves masked
    holes mid-sequence, models/setokim.py). They rotate around the ring
    with K/V so causality compares *semantic* positions, exactly like the
    dense path's make_attention_mask (models/llama.py:211-234). When
    omitted, causality uses raw ring order and every token is valid.
    """
    n_dev = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, h, l_local, d = q.shape
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)

    q32 = q.astype(jnp.float32)
    if positions is None:
        # global positions of my queries (ring order)
        q_pos = jnp.broadcast_to(my_idx * l_local + jnp.arange(l_local),
                                 (b, l_local))
    else:
        q_pos = positions
    if valid is None:
        q_valid = jnp.ones((b, l_local), bool)
    else:
        q_valid = valid > 0

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def body(step, carry):
        m, l, o, k_cur, v_cur, kv_pos, kv_valid = carry

        s = jnp.einsum("bhqd,bhkd->bhqk", q32,
                       k_cur.astype(jnp.float32)) * scale
        allowed = kv_valid[:, None, :] & q_valid[:, :, None]
        if causal:
            allowed = allowed & (q_pos[:, :, None] >= kv_pos[:, None, :])
        s = jnp.where(allowed[:, None], s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        m_new = jnp.maximum(m_new, -1e30)
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        p = jnp.where(allowed[:, None], p, 0.0)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        o_new = o * corr + jnp.einsum("bhqk,bhkd->bhqd", p,
                                      v_cur.astype(jnp.float32))

        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        pos_nxt = jax.lax.ppermute(kv_pos, axis_name, perm)
        val_nxt = jax.lax.ppermute(kv_valid, axis_name, perm)
        return m_new, l_new, o_new, k_nxt, v_nxt, pos_nxt, val_nxt

    # mark the accumulators as device-varying over the ring axis (shard_map
    # tracks varying-ness; the loop body's outputs vary because q does)
    def _vary(x):
        try:
            vma = getattr(jax.typeof(x), "vma", frozenset())
            if axis_name in vma:
                return x                       # already device-varying
        except Exception:
            pass
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(x, axis_name, to="varying")
        return jax.lax.pvary(x, axis_name)

    m0 = _vary(jnp.full((b, h, l_local, 1), -jnp.inf, jnp.float32))
    l0 = _vary(jnp.zeros((b, h, l_local, 1), jnp.float32))
    o0 = _vary(jnp.zeros((b, h, l_local, d), jnp.float32))
    m, l, o, _, _, _, _ = jax.lax.fori_loop(
        0, n_dev, body,
        (m0, l0, o0, k, v, _vary(q_pos), _vary(q_valid)))

    l = jnp.maximum(l, 1e-30)
    out = o / l
    # rows with no visible keys (fully-masked queries) → 0
    return out.astype(q.dtype)
