"""DPC-KNN density-peaks clustering, recast for TPU as fixed-K masked ops.

Parity: /root/reference/src/model/setok/tokenizer.py:78-121
(`cluster_dpc_knn`). The reference computes, per image:

    dist      = cdist(x, x) / sqrt(C)                       (N, N)
    density_i = exp(-mean_k(nearest-k distances_i ** 2)) + U[0,1)*1e-6
    parent_i  = min_j ( density_j > density_i ? dist[i, j] : rowmax_j )
    score_i   = parent_i * density_i

    where rowmax_j = max_k dist[j, k]. The fill value for non-higher-density
    entries is the *per-column row max*, not a global max: the reference's
    `dist_matrix.flatten(1).max(dim=-1)[0][None, None]` (tokenizer.py:98) is
    a (1, 1, N) broadcast against the (N, N) matrix, so element (i, j) is
    filled with row j's max. (The TCFormer lineage uses a per-batch global
    max; the unbatched SeTok variant changed the semantics. We match the
    reference as-is — tests/test_reference_parity.py pins it against the
    actual torch function.)
    centers   = { i : score_i > threshold }   (fallback: top `min_cluster_num`
                 scores, index-sorted, when the set is empty)
    assign    = argmin over centers of dist[center, token]; centers self-assign

and returns a *variable-length* center list (torch.nonzero → host sync and a
shape that changes per image). The TPU recast keeps the identical math but
fixes the output shape: centers become the top-`k_max` scores restricted to
the threshold set (all of them, index-ordered, when ≤ k_max — exactly the
reference's set), plus a `center_valid` mask. One compiled graph serves every
image; no host round-trips, no recompilation.

Deliberate deviations (documented per SURVEY.md §7 hard-part 1):
  * the 1e-6 random density tie-break (tokenizer.py:91) defaults to a
    deterministic index-based perturbation of the same magnitude so results
    are reproducible; pass `rng` to recover the stochastic behavior;
  * if more than `k_max` tokens clear the threshold, the k_max highest
    scores win (the reference would keep all — unbounded K breaks jit;
    `k_max=80` exceeds the data pipeline's cap of 74, pairDataset.py:136).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class ClusterResult(NamedTuple):
    """Static-shaped clustering output for one image of N tokens."""

    center_idx: jnp.ndarray     # (k_max,) int32, token index of each center,
                                #   ascending; invalid slots hold N (sentinel)
    center_valid: jnp.ndarray   # (k_max,) bool
    idx_cluster: jnp.ndarray    # (N,) int32 in [0, k_max): cluster per token
    score: jnp.ndarray          # (N,) float32 density-peak score
    num_clusters: jnp.ndarray   # () int32


def pairwise_dist(x: jnp.ndarray) -> jnp.ndarray:
    """Euclidean cdist(x, x) / sqrt(C) via the matmul identity (MXU-friendly;
    the reference materializes torch.cdist, tokenizer.py:82).

    Dtype-polymorphic: float64 in (under enable_x64) → float64 out, so tests
    can compare bit-stably against a float64 oracle; float32 otherwise.
    """
    if x.dtype not in (jnp.float32, jnp.float64):
        x = x.astype(jnp.float32)
    n, c = x.shape
    sq = jnp.sum(x * x, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    d2 = jnp.maximum(d2, 0.0)
    # exact zero diagonal (cdist guarantees it; matmul form may leave ~1e-6)
    d2 = d2 * (1.0 - jnp.eye(n, dtype=d2.dtype))
    return jnp.sqrt(d2) / jnp.sqrt(jnp.asarray(c, d2.dtype))


@partial(jax.jit, static_argnames=("k", "k_max", "min_cluster_num",
                                   "dist_norm"))
def cluster_dpc_knn(
    x: jnp.ndarray,
    k: int,
    k_max: int,
    min_cluster_num: int,
    threshold: float,
    token_mask: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    dist_norm: bool = False,
) -> ClusterResult:
    """Cluster N tokens (one image) into at most `k_max` groups.

    Args:
      x: (N, C) token features.
      k: neighbourhood size for the k-NN density estimate.
      k_max: static cluster-count bound (output width).
      min_cluster_num: fallback center count when nothing clears `threshold`.
      threshold: density-peak score cut for center selection.
      token_mask: optional (N,) bool/0-1 validity mask.
      rng: optional PRNG key for the reference's stochastic density
        tie-break; deterministic index perturbation when None.
      dist_norm: scale-invariant variant (NOT in the reference; default off =
        exact parity): divide the distance matrix by its mean over valid
        off-diagonal pairs before density/parent/score, so `threshold` reads
        in units of the mean pairwise distance and the result is invariant
        to any global rescale of `x`. The reference's absolute threshold is
        calibrated on raw frozen-backbone features (tokenizer.py:88-91);
        merged/LN'd features live at a different scale where that
        calibration breaks (PERF.md "adaptive-K on merged features").
    """
    n, _ = x.shape
    assert min_cluster_num <= k_max, "k_max must bound the fallback count"
    k = min(k, n)  # knn neighbourhood cannot exceed the token count

    dist = pairwise_dist(x)                                   # (N, N)

    if dist_norm:
        if token_mask is not None:
            valid = (token_mask > 0).astype(dist.dtype)
            pair_w = valid[:, None] * valid[None, :]
        else:
            pair_w = jnp.ones_like(dist)
        pair_w = pair_w * (1.0 - jnp.eye(n, dtype=dist.dtype))  # off-diag
        mean_d = jnp.sum(dist * pair_w) / jnp.maximum(jnp.sum(pair_w), 1.0)
        dist = dist / jnp.maximum(mean_d, 1e-12)

    if token_mask is not None:
        token_mask = token_mask > 0
        # invalid columns pushed beyond any real distance (tokenizer.py:86)
        far = jnp.max(dist) + 1.0
        dist = jnp.where(token_mask[None, :], dist, far)

    # k-NN density (tokenizer.py:88-91)
    neg_nearest, _ = jax.lax.top_k(-dist, k)                  # k smallest dists
    density = jnp.exp(-jnp.mean(jnp.square(neg_nearest), axis=-1))
    if rng is not None:
        density = density + jax.random.uniform(rng, (n,), dtype=density.dtype) * 1e-6
    else:
        # deterministic tie-break of the same 1e-6 magnitude
        density = density + (jnp.arange(n, dtype=density.dtype) + 0.5) / n * 1e-6
    if token_mask is not None:
        density = density * token_mask

    # distance to nearest higher-density point (tokenizer.py:96-99);
    # non-higher entries fill with the per-column row max (see module
    # docstring — exact reference semantics)
    higher = density[None, :] > density[:, None]              # (N, N)
    rowmax = jnp.max(dist, axis=-1)                           # (N,)
    parent_dist = jnp.min(jnp.where(higher, dist, rowmax[None, :]), axis=-1)

    score = parent_dist * density                             # (N,)

    # --- center selection: threshold set, fallback top-min_cluster_num ---
    above = score > threshold
    n_above = jnp.sum(above.astype(jnp.int32))
    use_fallback = n_above == 0
    num_clusters = jnp.where(use_fallback, min_cluster_num,
                             jnp.minimum(n_above, k_max)).astype(jnp.int32)

    # rank key: raw score in fallback mode; -inf outside the threshold set
    # otherwise. top_k then holds the centers in its first num_clusters slots.
    sel_score = jnp.where(use_fallback, score,
                          jnp.where(above, score, -jnp.inf))
    _, top_idx = jax.lax.top_k(sel_score, k_max)              # (k_max,) desc
    slot_valid = jnp.arange(k_max) < num_clusters
    # reference orders centers by ascending token index (nonzero /
    # sorted top-k, tokenizer.py:103-107): sort with sentinel N for invalid
    center_idx = jnp.sort(jnp.where(slot_valid, top_idx, n)).astype(jnp.int32)
    center_valid = center_idx < n

    # --- assignment: nearest center, centers self-assign ---
    # (tokenizer.py:111-119)
    center_rows = dist[jnp.clip(center_idx, 0, n - 1), :]     # (k_max, N)
    center_rows = jnp.where(center_valid[:, None], center_rows, jnp.inf)
    idx_cluster = jnp.argmin(center_rows, axis=0).astype(jnp.int32)
    idx_cluster = idx_cluster.at[center_idx].set(
        jnp.arange(k_max, dtype=jnp.int32), mode="drop")      # sentinel N drops

    return ClusterResult(center_idx=center_idx, center_valid=center_valid,
                         idx_cluster=idx_cluster, score=score,
                         num_clusters=num_clusters)


def segment_mean(x: jnp.ndarray, idx_cluster: jnp.ndarray, k_max: int,
                 token_mask: Optional[jnp.ndarray] = None):
    """Mean-pool token features per cluster → (k_max, C), counts (k_max,).

    Replaces the reference's ragged Python loop + per-cluster mean
    (tokenizer.py:146-153) with a one-hot matmul that runs on the MXU.
    """
    onehot = jax.nn.one_hot(idx_cluster, k_max, dtype=x.dtype)  # (N, k_max)
    if token_mask is not None:
        onehot = onehot * token_mask.astype(x.dtype)[:, None]
    counts = jnp.sum(onehot, axis=0)                            # (k_max,)
    pooled = onehot.T @ x.astype(onehot.dtype)
    pooled = pooled / jnp.maximum(counts, 1.0)[:, None]
    return pooled, counts


def same_cluster_mask(idx_cluster: jnp.ndarray,
                      token_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(N, N) bool mask: True where tokens share a cluster (and are valid).

    The reference runs a separate transformer per cluster slice
    (tokenizer.py:147-152); attention under this block-diagonal mask over all
    N tokens computes exactly the same thing in one batched op.
    """
    same = idx_cluster[:, None] == idx_cluster[None, :]
    if token_mask is not None:
        valid = token_mask > 0
        same = same & valid[:, None] & valid[None, :]
    return same
