#!/bin/bash
# TPU queue, round-5 wave 1: retrain the fast-recipe checkpoints WITH the
# grad-clip fix (a48de6b — HF Trainer clips global-norm to 1.0 by default;
# our trainers never clipped, and the r4 combo/merge3 trains degraded after
# LR warmup into predict-the-mean, SSIM ~0.012). merge1-alone trained healthy
# even unclipped (SSIM 0.2398 > baseline 0.1799), so the clip is the one
# variable changing between the collapsed runs and these.
#
# Recipe held identical to the r4 quality program for comparability:
# 512 synthetic-structured images, 1500 steps, bs 16, fixed-K=16 via the
# reference's threshold fallback (threshold=1e9 + min_cluster_num=16),
# disc off (disc_start 100000), eval n=128 at eval_seed 10000 with FID proxy.
# Control row (same recipe, unmerged): PSNR 12.531 / SSIM 0.17986
# (qd_eval_base_fixedk @ e366fad).
set -x
cd /root/repo

sentinel() {  # sentinel <item-name> <rc>
  python - "$1" "$2" <<'EOF'
import json, subprocess, sys, time
git = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                     capture_output=True, text=True).stdout.strip()
line = {"tpu_queue": sys.argv[1], "rc": int(sys.argv[2]), "git": git,
        "time": time.time()}
open("perf/history.jsonl", "a").write(json.dumps(line) + "\n")
EOF
}

timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. combo (merge_layer=1 + detok_patch=32 — the 4014 img/s recipe): the
#    headline quality proof. Collapsed unclipped (SSIM 0.0117); retrain.
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --detok-patch 32 --output-dir /tmp/qd_comboe \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_comboe $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_comboe \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --detok-patch 32 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_comboe $?

# 2. merge0 + detok_patch=64 (the 5344 img/s point that crosses the 5k
#    north star as a speed number): does its quality hold?
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 0 --detok-patch 64 --output-dir /tmp/qd_m0d64 \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_m0d64 $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_m0d64 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 0 --detok-patch 64 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_m0d64 $?

# 3. detok_patch=32 alone (2654 img/s): isolates the decode-side quality
#    cost from the merge lever in the combo A/B.
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --threshold 1e9 --min-cluster-num 16 \
    --detok-patch 32 --output-dir /tmp/qd_dp32 \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_dp32 $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_dp32 \
    --threshold 1e9 --min-cluster-num 16 \
    --detok-patch 32 --batch-size 16 --fid --eval-seed 10000
sentinel qd_eval_dp32 $?

# 4. tail (best-effort): merge_layer=1 + detok_patch=64 (5033 img/s) —
#    fallback recipe if merge0+detok64 trains badly.
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --detok-patch 64 --output-dir /tmp/qd_m1d64 \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_m1d64 $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_m1d64 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --detok-patch 64 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_m1d64 $?

# 5. tail (best-effort): merge3 retrain with the clip — completes the
#    merge ladder (collapsed unclipped both waves).
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 3 --output-dir /tmp/qd_merge3e \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_merge3e $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_merge3e \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 3 --batch-size 16 --fid --eval-seed 10000
sentinel qd_eval_merge3e $?
