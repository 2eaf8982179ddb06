"""Real-chip quantized-serving checks: the Pallas w8a8/w4a8 kernels and
the engine decode loop on actual TPU hardware (the CPU suite runs them in
interpret mode only). Run with no other TPU process alive."""

import numpy as np
import jax
import jax.numpy as jnp


def test_quant4_matmul_matches_reference_on_chip():
    from setok_tpu.kernels.quant_matmul import (matmul4_reference,
                                                quant4_matmul,
                                                quantize_weight_int4)
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(512, 256).astype(np.float32) * 0.05)
    x = jnp.asarray(rs.randn(8, 512).astype(np.float32))
    for kw in ({}, dict(group_size=128),
               dict(group_size=128, clip_search=8)):
        qw = quantize_weight_int4(w, **kw)
        out = np.asarray(quant4_matmul(x, qw))
        xs = np.maximum(np.max(np.abs(np.asarray(x)), -1, keepdims=True),
                        1e-8) / 127.0
        x8 = np.clip(np.round(np.asarray(x) / xs), -127, 127)
        ref = np.asarray(matmul4_reference(jnp.asarray(x8 * xs), qw))
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_serve_engine_bits4_decodes_on_chip():
    from setok_tpu import config as cfgs
    from setok_tpu.models.llama import quantize_trunk_weights
    from setok_tpu.models.setokim import Setokim
    from setok_tpu.serve import ServeEngine

    cfg = cfgs.tiny_setokim()
    model = Setokim(cfg, target_token_id=3)
    ids0 = np.zeros((1, 16), np.int64)
    ids0[0, :4] = [1, 17, 23, 9]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids0),
                        method=lambda m, i: m.llama(i))
    qp = quantize_trunk_weights(params, bits=4, group_size=0,
                                clip_search=4)
    m4 = Setokim(cfg, target_token_id=3, weight_bits=4)
    eng = ServeEngine(m4, qp, max_batch=2, prompt_len=16, max_len=48,
                      eos_id=-1, pad_id=0)
    reqs = [eng.submit(ids0[0], max_new_tokens=8) for _ in range(2)]
    eng.run()
    for r in reqs:
        assert len(r.tokens) == 8
        assert all(isinstance(t, int) for t in r.tokens)


def test_int8_cache_decode_kernel_compiles_on_chip():
    """kernels/cache_attention.py compiles via Mosaic and matches its own
    interpret-mode numerics on serving-like shapes (GQA, padded mask)."""
    import numpy as np
    import jax.numpy as jnp
    from setok_tpu.kernels.cache_attention import int8_cache_decode_attention

    rs = np.random.RandomState(5)
    B, S, KVH, G, D = 4, 512, 4, 2, 128
    H = KVH * G
    q = jnp.asarray(rs.randn(B, H, D), jnp.bfloat16)
    kf = rs.randn(B, S, KVH, D).astype(np.float32)
    vf = rs.randn(B, S, KVH, D).astype(np.float32)
    ks = (np.abs(kf).max(-1) / 127.0 + 1e-8).astype(np.float32)
    vs = (np.abs(vf).max(-1) / 127.0 + 1e-8).astype(np.float32)
    k8 = jnp.asarray(np.clip(np.round(kf / ks[..., None]), -127, 127)
                     .astype(np.int8))
    v8 = jnp.asarray(np.clip(np.round(vf / vs[..., None]), -127, 127)
                     .astype(np.int8))
    valid = np.zeros((B, S), bool)
    valid[:, :300] = True
    args = (q, k8, jnp.asarray(ks), v8, jnp.asarray(vs), jnp.asarray(valid))
    on_chip = np.asarray(int8_cache_decode_attention(*args), np.float32)
    interp = np.asarray(int8_cache_decode_attention(*args, interpret=True),
                        np.float32)
    np.testing.assert_allclose(on_chip, interp, rtol=2e-2, atol=2e-2)


def test_cache_kernel_opt_in_lowers_on_chip_at_production_shape():
    """ADVICE r3 low #4: interpret-mode CPU tests admit shapes the Mosaic
    layout rule silently rejects on hardware. This pins the opt-in
    int8-cache kernel (cache_kernel=True; the default is XLA dequant —
    PERF.md 'int8 KV cache') to the production head_dim=128 shape ON the
    chip and checks fits_vmem gates match what actually lowers."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from setok_tpu.kernels.cache_attention import (fits_vmem,
                                                   int8_cache_decode_attention)

    B, S, KVH, G, D = 2, 256, 2, 2, 128
    assert fits_vmem(S, D, KVH, interpret=False)
    rs = np.random.RandomState(0)
    q = rs.randn(B, KVH * G, D).astype(np.float32)
    kf = rs.randn(B, S, KVH, D).astype(np.float32)
    vf = rs.randn(B, S, KVH, D).astype(np.float32)
    ks = (np.abs(kf).max(-1) / 127.0 + 1e-8).astype(np.float32)
    vs = (np.abs(vf).max(-1) / 127.0 + 1e-8).astype(np.float32)
    k8 = np.clip(np.round(kf / ks[..., None]), -127, 127).astype(np.int8)
    v8 = np.clip(np.round(vf / vs[..., None]), -127, 127).astype(np.int8)
    valid = np.ones((B, S), bool)
    valid[:, 200:] = False

    got = np.asarray(int8_cache_decode_attention(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(ks),
        jnp.asarray(v8), jnp.asarray(vs), jnp.asarray(valid),
        interpret=False))          # real Mosaic lowering, not interpret

    kd = (k8.astype(np.float32) * ks[..., None]).repeat(G, axis=2)
    vd = (v8.astype(np.float32) * vs[..., None]).repeat(G, axis=2)
    s = np.einsum("bhd,bshd->bhs", q, kd) / np.sqrt(D)
    s = np.where(valid[:, None, :], s, -1e30)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("bhs,bshd->bhd", p, vd)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_cluster_pallas_exact_kth_on_chip():
    """The bisection's exact-k-th extraction (cluster_pallas.py) must hold
    under real Mosaic lowering, not just interpret mode: centers and
    assignments equal the XLA path's on blob data."""
    import numpy as np
    import jax.numpy as jnp
    from setok_tpu.kernels.cluster_pallas import cluster_dpc_knn_pallas
    from setok_tpu.ops.clustering import cluster_dpc_knn

    rs = np.random.RandomState(11)
    centers = rs.randn(5, 64) * 3
    labels = rs.randint(0, 5, size=256)
    x = (centers[labels] + rs.randn(256, 64) * 0.05).astype(np.float32)

    ours = cluster_dpc_knn_pallas(jnp.asarray(x), k=32, k_max=16,
                                  min_cluster_num=4, threshold=0.55)
    ref = cluster_dpc_knn(jnp.asarray(x), k=32, k_max=16,
                          min_cluster_num=4, threshold=0.55)
    np.testing.assert_array_equal(np.asarray(ours.center_idx),
                                  np.asarray(ref.center_idx))
    oc = np.asarray(ours.center_idx)[np.asarray(ours.idx_cluster)]
    rc = np.asarray(ref.center_idx)[np.asarray(ref.idx_cluster)]
    np.testing.assert_array_equal(oc, rc)
