"""A/B: f32 vs bf16 softmax tail in the fused int8 attention sublayer.

PERF.md r2: the phase-split kernel sits ~20% above its MXU floor; the
residual is softmax VPU time. bf16's (16, 128) native tile packs two
elements per lane word, so if Mosaic lowers bf16 max/sub/exp/sum packed,
the (N, N) softmax passes halve. This measures it (device time, 24-call
chains, H=12 ViT shape and H=16 decoder shape) and checks accuracy.

Run ON THE TPU (serialize with other TPU work):
    python perf/ab_softmax_bf16.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from perf.trace_ab import device_time_ab  # noqa: E402
from setok_tpu.kernels.fused_sublayer import attn_sublayer_int8  # noqa: E402


def run_shape(b, n, c, heads, label):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, n, c).astype(np.float32))
    g = jnp.ones((c,), jnp.float32)
    bb = jnp.zeros((c,), jnp.float32)
    wqkv = jnp.asarray(rs.randn(c, 3 * c).astype(np.float32) * 0.02)
    bqkv = jnp.asarray(rs.randn(3 * c).astype(np.float32) * 0.01)
    wp = jnp.asarray(rs.randn(c, c).astype(np.float32) * 0.02)
    bp = jnp.asarray(rs.randn(c).astype(np.float32) * 0.01)

    def f32(xx, *w):
        return attn_sublayer_int8(xx, *w, num_heads=heads)

    def bf16(xx, *w):
        return attn_sublayer_int8(xx, *w, num_heads=heads,
                                  softmax_bf16=True)

    args = (x, g, bb, wqkv, bqkv, wp, bp)
    ya = f32(*args)
    yb = bf16(*args)
    rel = float(jnp.max(jnp.abs(ya - yb))
                / jnp.maximum(jnp.max(jnp.abs(ya)), 1e-9))
    ms = device_time_ab({"f32sm": f32, "bf16sm": bf16}, args, iters=24)
    print(f"{label}: f32 {ms['f32sm']:.4f} ms  bf16 {ms['bf16sm']:.4f} ms "
          f"({100 * (1 - ms['bf16sm'] / max(ms['f32sm'], 1e-9)):+.1f}%)  "
          f"max-rel-diff {rel:.2e}")
    return ms, rel


if __name__ == "__main__":
    print("devices:", jax.devices())
    run_shape(32, 256, 768, 12, "H=12 vit  (32,256,768)")
    run_shape(32, 256, 768, 16, "H=16 deco (32,256,768)")
