"""Metrics (PSNR/SSIM/FID) + token-embedding resize tests."""

import numpy as np
import jax
import jax.numpy as jnp

from setok_tpu.utils.metrics import (FIDStats, compute_fid,
                                     frechet_distance, psnr, ssim)
from setok_tpu.utils.tokens import resize_token_embeddings


def test_psnr_ssim_identity():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    assert float(psnr(x, x)) > 100
    np.testing.assert_allclose(float(ssim(x, x)), 1.0, atol=1e-5)
    noisy = x + 0.3 * jnp.asarray(rs.randn(2, 32, 32, 3).astype(np.float32))
    assert float(ssim(x, noisy)) < 0.9
    assert float(psnr(x, noisy)) < 25


def test_ssim_dtype_invariant():
    """A bf16 input must score the same SSIM as its exact f32 upcast.

    Regression: ssim() used to square bf16 inputs in bf16 before the f32
    filter cast, so the xx/yy variance terms lost low bits to cancellation
    and a bf16-precision eval scored a *different* (higher) SSIM than the
    same pixels in f32 — precision sweeps compared metrics, not models."""
    rs = np.random.RandomState(1)
    tgt = jnp.asarray(rs.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    pred_bf16 = (tgt + 0.1 * jnp.asarray(
        rs.randn(2, 32, 32, 3).astype(np.float32))).astype(jnp.bfloat16)
    s_bf16 = float(ssim(pred_bf16, tgt))
    s_f32 = float(ssim(pred_bf16.astype(jnp.float32), tgt))
    np.testing.assert_allclose(s_bf16, s_f32, rtol=1e-6)


def test_fid_zero_for_identical_and_positive_for_shifted():
    rs = np.random.RandomState(1)
    feats = rs.randn(500, 8)
    s1, s2 = FIDStats(8), FIDStats(8)
    s1.update(feats)
    s2.update(feats)
    m1, c1 = s1.finalize()
    m2, c2 = s2.finalize()
    assert abs(frechet_distance(m1, c1, m2, c2)) < 1e-6

    s3 = FIDStats(8)
    s3.update(feats + 2.0)
    m3, c3 = s3.finalize()
    d = frechet_distance(m1, c1, m3, c3)
    np.testing.assert_allclose(d, 8 * 4.0, rtol=1e-6)   # ‖shift‖² = 8·2²


def test_compute_fid_with_feature_fn():
    rs = np.random.RandomState(2)
    real = rs.rand(64, 8, 8, 3).astype(np.float32)
    fake = real + 0.5
    feat = lambda imgs: imgs.reshape(imgs.shape[0], -1)[:, :16]
    d_same = compute_fid(real, real.copy(), feat, batch_size=16)
    d_diff = compute_fid(real, fake, feat, batch_size=16)
    assert d_same < 1e-6 < d_diff


def test_resize_token_embeddings():
    params = {"params": {"llama": {
        "embed_tokens": {"embedding": jnp.asarray(
            np.random.RandomState(0).randn(10, 4).astype(np.float32))},
        "lm_head": {"kernel": jnp.asarray(
            np.random.RandomState(1).randn(4, 10).astype(np.float32))},
    }}}
    out = resize_token_embeddings(params, 3)
    emb = np.asarray(out["params"]["llama"]["embed_tokens"]["embedding"])
    head = np.asarray(out["params"]["llama"]["lm_head"]["kernel"])
    assert emb.shape == (13, 4) and head.shape == (4, 13)
    old = np.asarray(params["params"]["llama"]["embed_tokens"]["embedding"])
    np.testing.assert_allclose(emb[10:], old.mean(0, keepdims=True)
                               .repeat(3, 0), rtol=1e-6)
    np.testing.assert_allclose(emb[:10], old)


def test_ssim_matches_float64_oracle():
    """jax ssim == a float64 numpy transcription of the same formula.

    Regression for the backend-precision skew: at default conv precision
    the TPU MXU ran the 11x11 gaussian filter in bf16 passes, so the
    filt(x*x) - mu^2 variance terms cancelled into noise and fp32 SSIM
    measured 0.22 where the true value was 0.36 (identical pixels, PSNR
    equal to 4 decimals). The f64 oracle catches that on any backend."""
    from scipy.signal import convolve2d

    rs = np.random.RandomState(7)
    tgt = rs.rand(2, 32, 32, 3).astype(np.float64) * 2 - 1
    pred = tgt + 0.25 * rs.randn(2, 32, 32, 3)

    x = np.arange(11, dtype=np.float64) - 5.0
    g = np.exp(-(x ** 2) / (2 * 1.5 ** 2))
    g = g / g.sum()
    win = g[:, None] * g[None, :]

    def filt(a):
        return np.stack([np.stack(
            [convolve2d(a[b, :, :, c], win[::-1, ::-1], mode="valid")
             for c in range(a.shape[-1])], -1)
            for b in range(a.shape[0])])

    c1, c2 = (0.01 * 2.0) ** 2, (0.03 * 2.0) ** 2
    mu_x, mu_y = filt(pred), filt(tgt)
    xx = filt(pred * pred) - mu_x ** 2
    yy = filt(tgt * tgt) - mu_y ** 2
    xy = filt(pred * tgt) - mu_x * mu_y
    want = np.mean(((2 * mu_x * mu_y + c1) * (2 * xy + c2))
                   / ((mu_x ** 2 + mu_y ** 2 + c1) * (xx + yy + c2)))

    got = float(ssim(jnp.asarray(pred, jnp.float32),
                     jnp.asarray(tgt, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-4)
