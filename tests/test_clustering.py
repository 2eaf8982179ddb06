"""DPC-KNN clustering vs. a numpy oracle transcribing the reference math.

Oracle mirrors /root/reference/src/model/setok/tokenizer.py:78-121 line by
line (numpy instead of torch), with the same deterministic tie-break injected
into both sides so assignments are exactly comparable.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from setok_tpu.ops.clustering import (
    cluster_dpc_knn, pairwise_dist, same_cluster_mask, segment_mean)


def oracle_dpc_knn(x, k, min_cluster_num, threshold, token_mask=None):
    """Reference cluster_dpc_knn in numpy with deterministic tie-break."""
    n, c = x.shape
    d2 = np.maximum(
        (x ** 2).sum(-1)[:, None] + (x ** 2).sum(-1)[None, :] - 2 * x @ x.T, 0)
    np.fill_diagonal(d2, 0.0)
    dist = np.sqrt(d2) / np.sqrt(c)

    if token_mask is not None:
        tm = token_mask > 0
        far = dist.max() + 1
        dist = dist * tm[None, :] + far * (~tm[None, :])

    dist_nearest = np.sort(dist, axis=-1)[:, :k]
    density = np.exp(-(dist_nearest ** 2).mean(-1))
    density = density + (np.arange(n) + 0.5) / n * 1e-6
    if token_mask is not None:
        density = density * (token_mask > 0)

    higher = density[None, :] > density[:, None]
    # fill = per-column row max: the reference's (1,1,N) broadcast at
    # tokenizer.py:98 fills entry (i, j) with max_k dist[j, k]
    rowmax = dist.max(-1)
    parent = np.where(higher, dist, rowmax[None, :]).min(-1)
    score = parent * density

    index_down = np.nonzero(score > threshold)[0]
    if index_down.size == 0:
        index_down = np.sort(np.argsort(-score)[:min_cluster_num])

    dist_c = dist[index_down, :]
    idx_cluster = dist_c.argmin(axis=0)
    idx_cluster[index_down] = np.arange(index_down.size)
    return index_down, idx_cluster, score


def make_clustered_data(seed, n=64, c=16, n_blobs=5, spread=0.05):
    rs = np.random.RandomState(seed)
    centers = rs.randn(n_blobs, c) * 3
    labels = rs.randint(0, n_blobs, size=n)
    return (centers[labels] + rs.randn(n, c) * spread).astype(np.float32)


def test_pairwise_dist_matches_numpy():
    x = np.random.RandomState(0).randn(32, 8).astype(np.float32)
    got = np.asarray(pairwise_dist(jnp.asarray(x)))
    want = np.sqrt(((x[:, None] - x[None, :]) ** 2).sum(-1)) / np.sqrt(8)
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("threshold", [0.55, 1e9])  # 1e9 forces the fallback
def test_cluster_matches_oracle(seed, threshold):
    """Exact assignment parity in float64 (float32 flips genuine density
    ties that the reference breaks with random noise — tested separately)."""
    x = make_clustered_data(seed).astype(np.float64)
    k, k_max, min_cn = 8, 16, 4

    with jax.enable_x64():
        res = cluster_dpc_knn(jnp.asarray(x), k=k, k_max=k_max,
                              min_cluster_num=min_cn, threshold=threshold)
        res = jax.tree.map(np.asarray, res)
    idx_ref, cl_ref, score_ref = oracle_dpc_knn(x, k, min_cn, threshold)

    np.testing.assert_allclose(res.score, score_ref, rtol=1e-9)
    assert int(res.num_clusters) == idx_ref.size
    got_centers = res.center_idx[res.center_valid]
    np.testing.assert_array_equal(got_centers, idx_ref)
    np.testing.assert_array_equal(res.idx_cluster, cl_ref)


def test_cluster_float32_close_to_oracle():
    """float32 path: scores agree to fp tolerance; assignments may flip only
    between near-duplicate densities (same-blob points)."""
    x = make_clustered_data(7)
    res = cluster_dpc_knn(jnp.asarray(x), k=8, k_max=16, min_cluster_num=4,
                          threshold=0.55)
    _, cl_ref, score_ref = oracle_dpc_knn(x.astype(np.float64), 8, 4, 0.55)
    # scores match to float32 noise except where density-comparison ties flip
    close = np.isclose(np.asarray(res.score), score_ref, rtol=1e-3, atol=1e-4)
    assert close.mean() > 0.9
    # cluster *partitions* agree even if center identities differ:
    same_ours = np.asarray(res.idx_cluster)[:, None] == np.asarray(res.idx_cluster)[None, :]
    same_ref = cl_ref[:, None] == cl_ref[None, :]
    assert (same_ours == same_ref).mean() > 0.95


def test_cluster_with_token_mask():
    x = make_clustered_data(3, n=48).astype(np.float64)
    mask = np.ones(48)
    mask[40:] = 0
    with jax.enable_x64():
        res = cluster_dpc_knn(jnp.asarray(x), k=8, k_max=16, min_cluster_num=4,
                              threshold=0.55, token_mask=jnp.asarray(mask))
        res = jax.tree.map(np.asarray, res)
    idx_ref, cl_ref, _ = oracle_dpc_knn(x, 8, 4, 0.55, token_mask=mask)
    got_centers = res.center_idx[res.center_valid]
    np.testing.assert_array_equal(got_centers, idx_ref)
    # assignments must agree on valid tokens
    np.testing.assert_array_equal(res.idx_cluster[:40], cl_ref[:40])


def test_static_shapes_across_inputs():
    """Different data → same output shapes: one compiled graph serves all."""
    shapes = set()
    for seed in range(3):
        x = make_clustered_data(seed, n=36, n_blobs=2 + seed)
        res = cluster_dpc_knn(jnp.asarray(x), k=6, k_max=12,
                              min_cluster_num=4, threshold=0.55)
        shapes.add(tuple(a.shape for a in res))
    assert len(shapes) == 1


def test_segment_mean_matches_loop():
    rs = np.random.RandomState(0)
    x = rs.randn(30, 8).astype(np.float32)
    idx = rs.randint(0, 5, size=30)
    pooled, counts = segment_mean(jnp.asarray(x), jnp.asarray(idx), k_max=8)
    for c in range(5):
        np.testing.assert_allclose(np.asarray(pooled)[c],
                                   x[idx == c].mean(0), rtol=1e-4, atol=1e-5)
    assert np.asarray(counts)[:5].tolist() == [int((idx == c).sum())
                                               for c in range(5)]
    np.testing.assert_allclose(np.asarray(pooled)[5:], 0.0)


def test_same_cluster_mask():
    idx = jnp.asarray([0, 0, 1, 2, 1])
    m = np.asarray(same_cluster_mask(idx))
    assert m[0, 1] and m[2, 4] and not m[0, 2] and m.diagonal().all()
    tm = jnp.asarray([1, 1, 1, 0, 1])
    m2 = np.asarray(same_cluster_mask(idx, tm))
    assert not m2[3, 3]


def test_vmap_batching():
    xs = jnp.asarray(np.stack([make_clustered_data(s) for s in range(4)]))
    batched = jax.vmap(lambda x: cluster_dpc_knn(
        x, k=8, k_max=16, min_cluster_num=4, threshold=0.55))
    res = batched(xs)
    assert res.idx_cluster.shape == (4, 64)
    assert res.center_idx.shape == (4, 16)


def test_dist_norm_scale_invariant():
    """dist_norm=True: any global rescale of x leaves the result identical
    (assignments, centers, K) — the property the adaptive-K-on-merged-
    features recipe needs (PERF.md). Default (False) must stay the exact
    reference semantics, i.e. scale-SENSITIVE."""
    x = jnp.asarray(make_clustered_data(0))
    kw = dict(k=8, k_max=16, min_cluster_num=4, threshold=0.4)
    a = cluster_dpc_knn(x, dist_norm=True, **kw)
    b = cluster_dpc_knn(x * 100.0, dist_norm=True, **kw)
    c = cluster_dpc_knn(x * 0.01, dist_norm=True, **kw)
    for other in (b, c):
        np.testing.assert_array_equal(np.asarray(a.idx_cluster),
                                      np.asarray(other.idx_cluster))
        np.testing.assert_array_equal(np.asarray(a.center_idx),
                                      np.asarray(other.center_idx))
        assert int(a.num_clusters) == int(other.num_clusters)
    # adaptive regime actually engaged (not the fallback) at this threshold
    assert 4 < int(a.num_clusters) <= 16

    # parity default: same rescale changes the outcome (absolute threshold)
    p1 = cluster_dpc_knn(x, **kw)
    p2 = cluster_dpc_knn(x * 100.0, **kw)
    assert (int(p1.num_clusters) != int(p2.num_clusters)
            or np.any(np.asarray(p1.idx_cluster)
                      != np.asarray(p2.idx_cluster)))


def test_dist_norm_false_unchanged_by_flag_plumbing():
    """dist_norm=False is bit-identical to the pre-flag behavior (the
    parity path must not move)."""
    x = jnp.asarray(make_clustered_data(1))
    kw = dict(k=8, k_max=16, min_cluster_num=4, threshold=0.55)
    a = cluster_dpc_knn(x, **kw)
    b = cluster_dpc_knn(x, dist_norm=False, **kw)
    np.testing.assert_array_equal(np.asarray(a.idx_cluster),
                                  np.asarray(b.idx_cluster))
    np.testing.assert_array_equal(np.asarray(a.score), np.asarray(b.score))


def test_dist_norm_with_token_mask():
    """Masked tokens are excluded from the mean-distance normalizer: the
    result on (x, mask) must equal the result on the valid subset alone
    (up to the index mapping), exactly like the unnormalized path."""
    x = make_clustered_data(2, n=48)
    mask = np.ones(48, np.float32)
    mask[40:] = 0.0
    res = cluster_dpc_knn(jnp.asarray(x), k=8, k_max=16, min_cluster_num=4,
                          threshold=0.4, token_mask=jnp.asarray(mask),
                          dist_norm=True)
    # invalid tokens must not become centers
    centers = np.asarray(res.center_idx)
    assert all(c >= 48 or c < 40 for c in centers.tolist())
    # scale invariance holds under masking too
    res2 = cluster_dpc_knn(jnp.asarray(x * 50.0), k=8, k_max=16,
                           min_cluster_num=4, threshold=0.4,
                           token_mask=jnp.asarray(mask), dist_norm=True)
    np.testing.assert_array_equal(np.asarray(res.idx_cluster),
                                  np.asarray(res2.idx_cluster))
