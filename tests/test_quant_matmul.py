"""w8a8 quantized matmul: accuracy vs float reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from setok_tpu.kernels.quant_matmul import (matmul_reference, quant_dense,
                                            quant_matmul, quantize_weight)


def test_weight_quantization_error_small():
    rs = np.random.RandomState(0)
    w = rs.randn(64, 32).astype(np.float32)
    qw = quantize_weight(jnp.asarray(w))
    wd = np.asarray(qw.values, np.float32) * np.asarray(qw.scales)
    rel = np.abs(wd - w).max() / np.abs(w).max()
    assert rel < 0.01          # ≤ 1/127 per channel


def test_quant_matmul_close_to_float():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(48, 64).astype(np.float32))
    w = jnp.asarray(rs.randn(64, 32).astype(np.float32))
    qw = quantize_weight(w)
    got = np.asarray(quant_matmul(x, qw, block_m=16, interpret=True))
    want = np.asarray(x @ w)
    # w8a8 error budget: ~1% relative of output scale
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 0.02
    # and matches the dequantized-weight reference even closer
    ref = np.asarray(matmul_reference(x, qw))
    assert np.abs(got - ref).max() / denom < 0.02


def test_quant_dense_with_bias_and_lead_dims():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 10, 64).astype(np.float32))
    w = jnp.asarray(rs.randn(64, 32).astype(np.float32))
    b = jnp.asarray(rs.randn(32).astype(np.float32))
    qw = quantize_weight(w)
    got = quant_dense(x, qw, b, interpret=True)
    assert got.shape == (2, 10, 32)
    want = np.asarray(x @ w + b)
    assert np.abs(np.asarray(got) - want).max() / np.abs(want).max() < 0.03
