"""Benchmark: SeTok tokenizer throughput (encode→cluster→decode) @256px.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

Baseline: the reference repo publishes no numbers (BASELINE.md); the
engineering target is 5,000 images/sec/chip on TPU v5e (BASELINE.json
north_star), so vs_baseline = value / 5000.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from setok_tpu import config as cfgs
from setok_tpu.models.setok import SeTok

BATCH = 32
WARMUP = 3
ITERS = 20
TARGET = 5000.0


def main():
    tok_cfg = cfgs.base_tokenizer()
    det_cfg = cfgs.base_detokenizer()
    model = SeTok(tok_cfg, det_cfg, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (BATCH, tok_cfg.vit.image_size,
                                      tok_cfg.vit.image_size, 3),
                                jnp.float32, -1.0, 1.0)
    params = model.init(rng, images[:1])

    def chained(params, images, iters):
        """ITERS forwards chained through a data dependency inside one
        dispatch — per-call async queueing through the device tunnel can't
        fake the timing (each iteration consumes the previous recon)."""
        def body(x, _):
            out = model.apply(params, x)
            nxt = images + 1e-6 * out.recon.astype(images.dtype)
            return nxt, out.num_clusters
        _, ncs = jax.lax.scan(body, images, None, length=iters)
        return ncs

    bench_fn = jax.jit(chained, static_argnums=2)
    jax.block_until_ready(bench_fn(params, images, WARMUP))

    t0 = time.perf_counter()
    out = bench_fn(params, images, ITERS)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    images_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "setok_tokenizer_throughput_256px_encode_cluster_decode",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
