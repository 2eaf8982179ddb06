"""Fused DPC-KNN statistics as Pallas TPU kernels.

The reference materializes the full N×N `torch.cdist` in HBM and walks it
three times (k-NN density, parent distance, assignment —
/root/reference/src/model/setok/tokenizer.py:82-113). These kernels keep the
distance matrix in VMEM tiles only:

  * `dpc_density`  — squared-distance tile on the MXU + an in-register
    bisection for the k-th-smallest threshold (no sort, no top-k), emitting
    each token's k-NN density in one pass;
  * `dpc_parent`   — second pass re-computing distance tiles and reducing
    `min{ dist[i,j] : density[j] > density[i] }`;
  * assignment/pooling reuse the one-hot matmul formulation
    (ops/clustering.py) — they are O(N·K) and already fuse under XLA.

`cluster_dpc_knn_pallas` is a drop-in for `ops.clustering.cluster_dpc_knn`
(same ClusterResult contract, deterministic tie-break). The bisection
brackets the k-th smallest squared distance down to f32 ulp (45 iters),
then the exact k-th value is extracted as `min{d2 : d2 > lo}` — the
k-smallest sum is the exact multiset sum (duplicates of the k-th value
counted via `need`), so the only divergence from the XLA path's
top_k-then-mean is f32 summation order (≲1 ulp · √k; the parity test
bounds the partition effect with oracle margins)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from setok_tpu.ops.clustering import ClusterResult

_BISECT_ITERS = 45


def _density_kernel(x_tile_ref, x_all_ref, out_ref, *, k, n_valid, c_scale):
    """Row tile of k-NN densities. x_tile: (BR, C); x_all: (N, C)."""
    xt = x_tile_ref[...].astype(jnp.float32)
    xa = x_all_ref[...].astype(jnp.float32)
    br = xt.shape[0]
    n = xa.shape[0]

    sq_t = jnp.sum(xt * xt, axis=-1, keepdims=True)          # (BR, 1)
    sq_a = jnp.sum(xa * xa, axis=-1)[None, :]                # (1, N)
    d2 = sq_t + sq_a - 2.0 * jax.lax.dot_general(
        xt, xa, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    d2 = jnp.maximum(d2, 0.0) * c_scale                      # cdist²/C
    # zero self-distance: the tile's diagonal sits at column offset
    row0 = pl.program_id(0) * br
    cols = jax.lax.broadcasted_iota(jnp.int32, (br, n), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (br, n), 0) + row0
    d2 = jnp.where(cols == rows, 0.0, d2)
    # padding columns beyond n_valid must never be "near"
    d2 = jnp.where(cols < n_valid, d2, 1e30)

    # bisection for the k-th smallest value per row
    lo = jnp.zeros((br, 1), jnp.float32)
    hi = jnp.max(jnp.where(cols < n_valid, d2, 0.0), axis=-1,
                 keepdims=True) + 1e-6

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((d2 <= mid).astype(jnp.float32), axis=-1,
                      keepdims=True)
        lo = jnp.where(cnt < k, mid, lo)
        hi = jnp.where(cnt >= k, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
    # invariant: cnt(d2 <= lo) < k <= cnt(d2 <= hi). With the bracket at
    # f32-ulp width, the k-th smallest value is exactly min{d2 : d2 > lo}
    # (duplicates of it fill the remaining `need` slots) — no fractional
    # threshold fill, so the k-smallest sum is the exact multiset sum.
    below = (d2 <= lo).astype(jnp.float32)
    n_below = jnp.sum(below, axis=-1, keepdims=True)
    need = jnp.maximum(k - n_below, 0.0)
    kth = jnp.min(jnp.where(d2 > lo, d2, 1e30), axis=-1)
    kth = jnp.where(need[:, 0] > 0, kth, 0.0)
    sum_k = jnp.sum(d2 * below, axis=-1) + kth * need[:, 0]
    out_ref[...] = jnp.exp(-(sum_k / k))[None, :]  # (1, BR)


def _parent_kernel(x_tile_ref, x_all_ref, dens_tile_ref, dens_all_ref,
                   out_ref, rowmax_ref, *, n_valid, c_scale, dist_max):
    """Row tile of parent distances: min dist to any higher-density token.
    Also emits the per-row max distance so the caller can recover the
    global dist_max without an XLA N×N pass."""
    xt = x_tile_ref[...].astype(jnp.float32)
    xa = x_all_ref[...].astype(jnp.float32)
    dt = dens_tile_ref[...].astype(jnp.float32)[0, :]        # (BR,) lane-major
    da = dens_all_ref[...].astype(jnp.float32)[0, :]         # (N,) lane-major
    br = xt.shape[0]
    n = xa.shape[0]

    sq_t = jnp.sum(xt * xt, axis=-1, keepdims=True)
    sq_a = jnp.sum(xa * xa, axis=-1)[None, :]
    d2 = sq_t + sq_a - 2.0 * jax.lax.dot_general(
        xt, xa, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    d2 = jnp.maximum(d2, 0.0) * c_scale
    row0 = pl.program_id(0) * br
    cols = jax.lax.broadcasted_iota(jnp.int32, (br, n), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (br, n), 0) + row0
    d2 = jnp.where(cols == rows, 0.0, d2)
    dist = jnp.sqrt(d2)

    valid_col = (cols < n_valid).astype(jnp.float32)
    rowmax_ref[...] = jnp.max(dist * valid_col, axis=-1)[None, :]

    # arithmetic masking (bool vectors trip Mosaic relayouts)
    higher = ((da[None, :] > dt[:, None])
              & (cols < n_valid)).astype(jnp.float32)
    parent = jnp.min(dist * higher + dist_max * (1.0 - higher), axis=-1)
    out_ref[...] = parent[None, :]


def _pad_rows(x, mult):
    pad = (-x.shape[0]) % mult
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def cluster_fits_vmem(n: int, c: int, block_rows: int = 128) -> bool:
    """The density/parent kernels hold the full padded (N, C) feature block
    plus a row tile in VMEM; at so400m scale (N=729, C=4096) that exceeds
    the 16 MB scoped budget — fall back to the XLA path (measured a wash at
    base scale anyway, PERF.md)."""
    br = min(block_rows, n)
    npad = ((n + br - 1) // br) * br
    need = npad * c * 4 + br * c * 4 + 4 * npad * 4
    return need < 10 * 1024 * 1024


def dpc_density_parent(x: jnp.ndarray, k: int, block_rows: int = 128,
                       interpret: bool = False):
    """(density, parent_dist, dist_max) for x: (N, C), fused in VMEM."""
    n, c = x.shape
    br = min(block_rows, n)
    xp = _pad_rows(x.astype(jnp.float32), br)
    npad = xp.shape[0]
    c_scale = 1.0 / c

    density = pl.pallas_call(
        functools.partial(_density_kernel, k=min(k, n), n_valid=n,
                          c_scale=c_scale),
        grid=(npad // br,),
        in_specs=[pl.BlockSpec((br, c), lambda i: (i, 0)),
                  pl.BlockSpec((npad, c), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, br), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, npad), jnp.float32),
        interpret=interpret,
    )(xp, xp)[0, :n]

    # deterministic tie-break, as in ops.clustering
    density = density + (jnp.arange(n, dtype=jnp.float32) + 0.5) / n * 1e-6

    dens_p = _pad_rows(density, br)[None, :]               # (1, npad) rows
    parent, rowmax = pl.pallas_call(
        functools.partial(_parent_kernel, n_valid=n, c_scale=c_scale,
                          dist_max=1e30),
        grid=(npad // br,),
        in_specs=[pl.BlockSpec((br, c), lambda i: (i, 0)),
                  pl.BlockSpec((npad, c), lambda i: (0, 0)),
                  pl.BlockSpec((1, br), lambda i: (0, i)),
                  pl.BlockSpec((1, npad), lambda i: (0, 0))],
        out_specs=(pl.BlockSpec((1, br), lambda i: (0, i)),
                   pl.BlockSpec((1, br), lambda i: (0, i))),
        out_shape=(jax.ShapeDtypeStruct((1, npad), jnp.float32),
                   jax.ShapeDtypeStruct((1, npad), jnp.float32)),
        interpret=interpret,
    )(xp, xp, dens_p, dens_p)
    parent = parent[0, :n]
    rowmax_v = rowmax[0, :n]
    dist_max = jnp.max(rowmax_v)
    # Reference fill semantics (ops/clustering.py docstring): non-higher
    # entries fill with the per-column row max, so
    #   parent_ref[i] = min( min_{higher j} dist[i,j],
    #                        min_{non-higher j} rowmax[j] ).
    # The kernel computed the first term (1e30 fill); the second needs only
    # densities + the (N,) row maxes — an O(N²) scalar pass, no distances.
    higher = density[None, :] > density[:, None]
    fill_min = jnp.min(jnp.where(higher, jnp.inf, rowmax_v[None, :]),
                       axis=-1)
    parent = jnp.minimum(parent, fill_min)

    return density, parent, dist_max


def cluster_dpc_knn_pallas(x: jnp.ndarray, k: int, k_max: int,
                           min_cluster_num: int, threshold: float,
                           interpret: bool = False) -> ClusterResult:
    """Drop-in fused version of ops.clustering.cluster_dpc_knn (no
    token_mask support — padded-token masking stays on the XLA path)."""
    n, _ = x.shape
    assert min_cluster_num <= k_max

    density, parent_dist, _ = dpc_density_parent(x, k, interpret=interpret)
    score = parent_dist * density

    above = score > threshold
    n_above = jnp.sum(above.astype(jnp.int32))
    use_fallback = n_above == 0
    num_clusters = jnp.where(use_fallback, min_cluster_num,
                             jnp.minimum(n_above, k_max)).astype(jnp.int32)
    sel_score = jnp.where(use_fallback, score,
                          jnp.where(above, score, -jnp.inf))
    _, top_idx = jax.lax.top_k(sel_score, k_max)
    slot_valid = jnp.arange(k_max) < num_clusters
    center_idx = jnp.sort(jnp.where(slot_valid, top_idx, n)).astype(jnp.int32)
    center_valid = center_idx < n

    # assignment: distances to the K_max centers only — O(N·K·C)
    xf = x.astype(jnp.float32)
    centers = xf[jnp.clip(center_idx, 0, n - 1)]
    d2c = (jnp.sum(centers ** 2, -1)[:, None]
           + jnp.sum(xf ** 2, -1)[None, :] - 2 * centers @ xf.T)
    d2c = jnp.maximum(d2c, 0.0)
    d2c = jnp.where(center_valid[:, None], d2c, jnp.inf)
    idx_cluster = jnp.argmin(d2c, axis=0).astype(jnp.int32)
    idx_cluster = idx_cluster.at[center_idx].set(
        jnp.arange(k_max, dtype=jnp.int32), mode="drop")

    return ClusterResult(center_idx=center_idx, center_valid=center_valid,
                         idx_cluster=idx_cluster, score=score,
                         num_clusters=num_clusters)
