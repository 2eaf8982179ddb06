"""Reconstruction / generation quality metrics: PSNR, SSIM, FID machinery.

The reference repo ships no metric code (SURVEY.md §6: zero hits for
PSNR/FID); the paper reports FID/quality tables. This module provides the
engineering side: PSNR/SSIM as jit-able functions, and FID from
mean/covariance statistics with a pluggable feature extractor (InceptionV3
weights are an offline port via scripts/port_weights.py; any (B,H,W,3)→(B,D)
feature fn works, e.g. the frozen SigLIP ViT pooled features).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def psnr(pred: jnp.ndarray, target: jnp.ndarray,
         data_range: float = 2.0) -> jnp.ndarray:
    mse = jnp.mean((pred.astype(jnp.float32)
                    - target.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return g[:, None] * g[None, :]


def ssim(pred: jnp.ndarray, target: jnp.ndarray,
         data_range: float = 2.0) -> jnp.ndarray:
    """Mean SSIM over a batch of (B, H, W, C) images (standard 11×11
    gaussian window)."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    win = _gaussian_kernel()[None, None, :, :]          # OIHW (1,1,11,11)
    # cast UP FRONT: the x*x / x*y products below must run in f32 — for a
    # bf16 input, squaring in bf16 then casting loses the low bits to
    # cancellation in the xx/yy variance terms and visibly skews SSIM
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)

    def filt(x):
        x = jnp.moveaxis(x.astype(jnp.float32), -1, 1)  # NCHW
        b, c, h, w = x.shape
        x = x.reshape(b * c, 1, h, w)
        # HIGHEST: at default precision the TPU MXU runs this conv in
        # bf16 passes, and the filt(x·x) − mu² variance terms below then
        # cancel into noise — fp32 SSIM measured 0.22 vs the true 0.36
        # on identical pixels (PSNR matched to 4 decimals). Same failure
        # mode as the input-dtype skew, one level down.
        y = jax.lax.conv_general_dilated(
            x, win, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST)
        return y.reshape(b, c, *y.shape[2:])

    mu_x, mu_y = filt(pred), filt(target)
    xx = filt(pred * pred) - mu_x ** 2
    yy = filt(target * target) - mu_y ** 2
    xy = filt(pred * target) - mu_x * mu_y
    s = (((2 * mu_x * mu_y + c1) * (2 * xy + c2))
         / ((mu_x ** 2 + mu_y ** 2 + c1) * (xx + yy + c2)))
    return jnp.mean(s)


# ---------------------------------------------------------------------------
# FID


class FIDStats:
    """Streaming mean/covariance accumulator for feature vectors."""

    def __init__(self, dim: int):
        self.n = 0
        self.sum = np.zeros((dim,), np.float64)
        self.outer = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray) -> None:
        feats = np.asarray(feats, np.float64)
        self.n += feats.shape[0]
        self.sum += feats.sum(0)
        self.outer += feats.T @ feats

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        mu = self.sum / self.n
        cov = self.outer / self.n - np.outer(mu, mu)
        cov *= self.n / max(self.n - 1, 1)
        return mu, cov


def _sqrtm_psd(a: np.ndarray) -> np.ndarray:
    """Matrix square root of a (near-)PSD symmetric matrix via eigh."""
    vals, vecs = np.linalg.eigh((a + a.T) / 2)
    vals = np.clip(vals, 0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """FID between two gaussians: ‖μ1−μ2‖² + Tr(C1+C2−2(C1C2)^½)."""
    diff = mu1 - mu2
    s1 = _sqrtm_psd(cov1)
    cross = _sqrtm_psd(s1 @ cov2 @ s1)
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2 * np.trace(cross))


def compute_fid(real_images, fake_images,
                feature_fn: Callable[[np.ndarray], np.ndarray],
                batch_size: int = 32) -> float:
    """FID over two image sets with any feature extractor."""
    def stats(images):
        acc: Optional[FIDStats] = None
        for i in range(0, len(images), batch_size):
            f = np.asarray(feature_fn(images[i:i + batch_size]))
            if acc is None:
                acc = FIDStats(f.shape[1])
            acc.update(f)
        return acc.finalize()

    mu1, c1 = stats(real_images)
    mu2, c2 = stats(fake_images)
    return frechet_distance(mu1, c1, mu2, c2)
