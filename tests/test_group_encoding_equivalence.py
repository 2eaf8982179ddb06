"""THE core recast proof: masked attention + segment-mean == the reference's
ragged per-cluster transformer loop (tokenizer.py:123-155), same weights.

The reference runs `inner_encoder` separately on each cluster's token slice
and mean-pools; the rebuild runs one attention over all tokens under a
block-diagonal same-cluster mask and pools with a one-hot matmul. These must
be *numerically identical* (softmax over the same key sets, per-token
norm/MLP, identical means).
"""

import numpy as np
import jax
import jax.numpy as jnp

from setok_tpu.ops.blocks import Block
from setok_tpu.ops.clustering import same_cluster_mask, segment_mean


def test_masked_recast_equals_ragged_loop():
    rs = np.random.RandomState(0)
    n, c = 12, 16
    x = jnp.asarray(rs.randn(n, c).astype(np.float32))
    labels = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2, 1, 0, 2])
    k_max = 4

    block = Block(num_heads=2, mlp_hidden_dim=32, depth=2)
    params = block.init(jax.random.PRNGKey(0), x[None])

    # --- reference semantics: per-cluster slices through the SAME block ---
    ref_pooled = np.zeros((k_max, c), np.float32)
    for cl in np.unique(labels):
        slice_x = x[jnp.asarray(np.nonzero(labels == cl)[0])]
        out = block.apply(params, slice_x[None])[0]
        ref_pooled[cl] = np.asarray(out).mean(0)

    # --- rebuild: one masked attention + segment mean ---
    mask = same_cluster_mask(jnp.asarray(labels))
    grouped = block.apply(params, x[None], mask=mask[None])[0]
    pooled, counts = segment_mean(grouped, jnp.asarray(labels), k_max)

    np.testing.assert_array_equal(np.asarray(counts),
                                  [4, 3, 5, 0])
    np.testing.assert_allclose(np.asarray(pooled)[:3], ref_pooled[:3],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled)[3], 0.0)


def test_masked_recast_with_invalid_tokens():
    """Padded tokens must affect neither attention nor the pooled means."""
    rs = np.random.RandomState(1)
    n, c = 10, 8
    x = np.asarray(rs.randn(n, c), np.float32)
    labels = np.array([0, 0, 1, 1, 1, 0, 1, 0, 0, 0])
    valid = np.array([1, 1, 1, 1, 1, 1, 1, 0, 0, 0], np.float32)

    block = Block(num_heads=1, mlp_hidden_dim=16, depth=1)
    params = block.init(jax.random.PRNGKey(0), jnp.asarray(x)[None])

    mask = same_cluster_mask(jnp.asarray(labels), jnp.asarray(valid))
    grouped = block.apply(params, jnp.asarray(x)[None], mask=mask[None])[0]
    pooled, _ = segment_mean(grouped, jnp.asarray(labels), 4,
                             jnp.asarray(valid))

    # garbage in the padded slots must not change valid clusters' outputs
    x2 = x.copy()
    x2[7:] = 999.0
    grouped2 = block.apply(params, jnp.asarray(x2)[None], mask=mask[None])[0]
    pooled2, _ = segment_mean(grouped2, jnp.asarray(labels), 4,
                              jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(pooled)[:2],
                               np.asarray(pooled2)[:2], rtol=1e-5, atol=1e-5)
