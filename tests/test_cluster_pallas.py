"""Fused Pallas DPC-KNN vs the XLA implementation (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from setok_tpu.kernels.cluster_pallas import (cluster_dpc_knn_pallas,
                                              dpc_density_parent)
from setok_tpu.ops.clustering import cluster_dpc_knn
from tests.test_clustering import make_clustered_data


@pytest.mark.parametrize("seed", [0, 1])
def test_density_parent_match_xla(seed):
    x = jnp.asarray(make_clustered_data(seed, n=64, c=16))
    density, parent, _ = dpc_density_parent(x, k=8, block_rows=32,
                                            interpret=True)
    ref = cluster_dpc_knn(x, k=8, k_max=16, min_cluster_num=4,
                          threshold=0.55)
    # density bisection is exact to fp32 resolution; parent distances can
    # flip only between same-blob density near-ties (sub-1e-6 margins), so
    # compare scores loosely overall and exactly on the high-score peaks
    got_score = np.asarray(density * parent)
    ref_score = np.asarray(ref.score)
    close = np.isclose(got_score, ref_score, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.9
    peaks = ref_score > 0.55
    np.testing.assert_allclose(got_score[peaks], ref_score[peaks],
                               rtol=1e-3)


@pytest.mark.parametrize("threshold", [0.55, 1e9])
def test_full_cluster_matches_xla(threshold):
    x = jnp.asarray(make_clustered_data(2, n=64, c=16))
    got = cluster_dpc_knn_pallas(x, k=8, k_max=16, min_cluster_num=4,
                                 threshold=threshold, interpret=True)
    ref = cluster_dpc_knn(x, k=8, k_max=16, min_cluster_num=4,
                          threshold=threshold)
    assert int(got.num_clusters) == int(ref.num_clusters)
    np.testing.assert_array_equal(np.asarray(got.center_idx),
                                  np.asarray(ref.center_idx))
    np.testing.assert_array_equal(np.asarray(got.idx_cluster),
                                  np.asarray(ref.idx_cluster))


def test_uneven_rows_padding():
    x = jnp.asarray(make_clustered_data(3, n=50, c=16))
    density, parent, _ = dpc_density_parent(x, k=8, block_rows=32,
                                            interpret=True)
    assert density.shape == (50,) and parent.shape == (50,)
    ref = cluster_dpc_knn(x, k=8, k_max=16, min_cluster_num=4,
                          threshold=0.55)
    got = np.asarray(density * parent)
    refs = np.asarray(ref.score)
    assert np.isclose(got, refs, rtol=1e-3, atol=1e-3).mean() > 0.9
