"""Data-parallel (multi-chip) tokenizer bench: the route past the 5k wall.

PERF.md's ceiling analysis shows 5,000 img/s at ViT-B/int8 is >100% of one
v5e chip's int8 peak — unreachable per chip. But the tokenizer path has
zero cross-image dependencies (reference processes images one at a time:
tokenizer.py:162-169), so data-parallel scaling is communication-free:
params replicated, batch sharded over the `data` mesh axis, NO collectives
in the forward graph. Per-chip throughput at dp=N equals the single-chip
number, so a v5e-4 slice clears the north star (4 x 1567 ~ 6270 img/s).

This script makes that claim executable rather than rhetorical:
  * dp=1 on the real chip reproduces bench.py's headline inside the meshed
    program (same jit, now with shardings) — proving the meshed graph adds
    no overhead;
  * --cpu --dp 8 runs the same program over 8 virtual CPU devices,
    validating the sharded semantics (global batch splits, per-device
    results match the unsharded forward).

Run:  python perf/bench_mesh.py [--dp 1]            # real TPU
      python perf/bench_mesh.py --cpu --dp 8        # virtual-mesh check
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--batch", type=int, default=64,
                    help="PER-DEVICE batch (global = dp * batch)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="also compare sharded vs unsharded outputs")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(args.dp, 1)}")

    import numpy as np
    import jax
    if args.cpu:
        # the hosted axon plugin ignores the JAX_PLATFORMS env var; the
        # config update is the working CPU-force (XLA_FLAGS above must
        # still be set before first backend init for the device count)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from setok_tpu import config as cfgs
    from setok_tpu.models.setok import SeTok

    devs = jax.devices()[: args.dp]
    if len(devs) < args.dp:
        raise SystemExit(f"need {args.dp} devices, have {len(jax.devices())}")
    mesh = Mesh(np.asarray(devs), ("data",))
    quant8 = not args.cpu           # fused int8 kernels are TPU-only
    tok_cfg = cfgs.tiny_tokenizer() if args.cpu else cfgs.base_tokenizer()
    det_cfg = (cfgs.tiny_detokenizer() if args.cpu
               else cfgs.base_detokenizer())
    model = SeTok(tok_cfg, det_cfg, dtype=jnp.bfloat16, quant8=quant8)

    B = args.dp * args.batch
    size = tok_cfg.vit.image_size
    shape = (B, size, size, 3)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, size, size, 3), jnp.float32))
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    params = jax.device_put(params, repl)

    def chained(params, images, iters):
        def body(x, _):
            out = model.apply(params, x)
            r = jnp.clip(out.recon, -1, 1).astype(images.dtype)
            nxt = r if r.shape == x.shape else x + jnp.mean(r)
            return nxt, jnp.sum(out.num_clusters)
        _, ncs = jax.lax.scan(body, images, None, length=iters)
        return jnp.sum(ncs)

    bench_fn = jax.jit(chained, static_argnums=2,
                       in_shardings=(repl, batch_sh))

    def timed(iters, seed):
        # device-generated then resharded (no host round-trip — the input
        # pipeline is benched separately in perf/data_bench.py)
        imgs = jax.device_put(
            jax.random.uniform(jax.random.PRNGKey(seed), shape,
                               jnp.float32, -1, 1), batch_sh)
        t0 = time.perf_counter()
        float(bench_fn(params, imgs, iters))
        return time.perf_counter() - t0

    small, big = (2, 22) if not args.cpu else (1, 3)
    timed(small, 100)
    timed(big, 101)
    t_small = min(timed(small, 1), timed(small, 2))
    t_big = min(timed(big, 3), timed(big, 4))
    ips = B * (big - small) / (t_big - t_small)

    # unmeshed control IN THE SAME PROCESS/tunnel session (bench.py's exact
    # jit, no shardings, device-generated inputs): separates "the meshed
    # graph is slower" from cross-session tunnel variance.
    ctrl_fn = jax.jit(chained, static_argnums=2)

    def timed_ctrl(iters, seed):
        imgs = jax.random.uniform(jax.random.PRNGKey(seed), shape,
                                  jnp.float32, -1.0, 1.0)
        t0 = time.perf_counter()
        float(ctrl_fn(params, imgs, iters))
        return time.perf_counter() - t0

    timed_ctrl(small, 100)
    timed_ctrl(big, 101)
    c_small = min(timed_ctrl(small, 1), timed_ctrl(small, 2))
    c_big = min(timed_ctrl(big, 3), timed_ctrl(big, 4))
    ips_ctrl = B * (big - small) / (c_big - c_small)
    print(f"unmeshed control (same session): {ips_ctrl:.1f} img/s "
          f"(meshed/control = {ips / ips_ctrl:.3f})", file=sys.stderr)

    if args.check:
        # sharded program == unsharded forward on the same global batch
        imgs = np.asarray(jax.random.uniform(jax.random.PRNGKey(7), shape,
                                             jnp.float32, -1, 1))
        ref = float(chained(jax.device_get(params), jnp.asarray(imgs), 1))
        got = float(bench_fn(params, jax.device_put(imgs, batch_sh), 1))
        np.testing.assert_allclose(got, ref, rtol=1e-5)
        print("sharded == unsharded: ok", file=sys.stderr)

    line = {"metric": "setok_tokenizer_throughput_dp_mesh",
            "value": round(ips, 2), "unit": "images/sec",
            "unmeshed_control": round(ips_ctrl, 2),
            "dp": args.dp, "per_device_batch": args.batch,
            "platform": "cpu" if args.cpu else "tpu",
            "git": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                  capture_output=True, text=True,
                                  cwd="/root/repo").stdout.strip(),
            "time": time.time()}
    print(json.dumps(line))
    if not args.cpu:
        with open("/root/repo/perf/history.jsonl", "a") as f:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
