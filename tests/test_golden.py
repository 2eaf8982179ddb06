"""Golden regression pins: fixed seeds → fixed clustering outcomes.

These freeze the *behavior* of the clustering + schedule code so later
rounds can refactor kernels without silently changing semantics. If a pin
breaks intentionally (algorithm change), update the constant and note why.
"""

import numpy as np
import jax
import jax.numpy as jnp

from setok_tpu.diffusion import create_diffusion
from setok_tpu.ops.clustering import cluster_dpc_knn
from tests.test_clustering import make_clustered_data


import pytest

pytestmark = pytest.mark.full


def test_cluster_assignment_pin():
    x = jnp.asarray(make_clustered_data(0, n=64, c=16))
    res = cluster_dpc_knn(x, k=8, k_max=16, min_cluster_num=4,
                          threshold=0.55)
    assert int(res.num_clusters) == 5
    np.testing.assert_array_equal(
        np.asarray(res.center_idx[res.center_valid]), [5, 12, 25, 46, 47])
    # partition sizes are stable
    counts = np.bincount(np.asarray(res.idx_cluster), minlength=16)
    assert counts[:5].sum() == 64 and (counts[5:] == 0).all()


def test_beta_schedule_pin():
    d = create_diffusion("", noise_schedule="cosine")
    assert d.num_timesteps == 1000
    np.testing.assert_allclose(float(d.betas[0]), 4.1284225e-05, rtol=1e-5)
    np.testing.assert_allclose(float(d.betas[-1]), 0.999, rtol=1e-6)
    np.testing.assert_allclose(float(d.alphas_cumprod[500]), 0.4922852,
                               rtol=1e-5)


def test_posenc_pin():
    from setok_tpu.ops.posenc import posenc_2d
    p = np.asarray(posenc_2d(4, 4, 8))
    np.testing.assert_allclose(p[0, 0], [0, 1, 0, 1, 0, 1, 0, 1], atol=1e-6)
    np.testing.assert_allclose(float(p[1, 2, 0]), np.sin(1.0), rtol=1e-6)
    np.testing.assert_allclose(float(p[1, 2, 4]), np.sin(2.0), rtol=1e-6)
