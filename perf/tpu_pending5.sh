#!/bin/bash
# TPU queue, round-5 wave 1b — re-prioritized replacement for the tail of
# tpu_pending4.sh (driver killed at the dp32 boundary; the in-flight m0d64
# train keeps running and this script waits on it).
#
# Why the reorder: the clipped combo retrain (qd_comboe) collapsed again
# (SSIM 0.0128) — clip alone does not rescue detok_patch=32. The shipping
# decision therefore hinges on (a) the >5k-img/s detok64 points
# (m0d64 = 5344 img/s, m1d64 = 5033 img/s) training healthy, and (b) an
# apples-to-apples CLIPPED control. Order below = decision value per chip
# minute: m0d64 eval → clipped control → clipped merge1 (the known-healthy
# fallback, 1998 img/s) → adaptive-K dist_norm sweeps on the merged ckpts
# (VERDICT r4 next-item 5) → m1d64 → gentle-LR combo rescue (tail).
#
# Recipe held identical to the r4/r5 quality program for comparability:
# 512 synthetic-structured images, 1500 steps, bs 16, fixed K=16 via the
# reference's threshold fallback (threshold=1e9 + min_cluster_num=16),
# disc off (disc_start 100000), eval n=128 at eval_seed 10000 + FID proxy.
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

# 0. wait for the in-flight m0d64 train (wave-1 item 2, PID from /tmp)
M0PID=${M0PID:-4736}
while kill -0 "$M0PID" 2>/dev/null; do sleep 20; done
sentinel qd_train_m0d64_waited 0

# 1. m0d64 eval (merge_layer=0 + detok_patch=64 — the 5344 img/s recipe)
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_m0d64 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 0 --detok-patch 64 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_m0d64 $?

# 2. clipped baseline control — every quality comparison's denominator
#    (the r4 control predates the clip default at a48de6b)
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --threshold 1e9 --min-cluster-num 16 \
    --output-dir /tmp/qd_basee \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_basee $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_basee \
    --threshold 1e9 --min-cluster-num 16 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_basee $?

# 3. merge1 retrain with the clip (healthy unclipped in r4: SSIM 0.2398)
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --output-dir /tmp/qd_merge1e \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_merge1e $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_merge1e \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --batch-size 16 --fid --eval-seed 10000
sentinel qd_eval_merge1e $?

# 4. adaptive-K restoration sweeps (cluster_dist_norm) on merged ckpts —
#    VERDICT r4 item 5; eval-time swap is legitimate (clustering is
#    stop_gradient'd data, not a trained path)
timeout 1750 python perf/adaptive_k_sweep.py --stage1-dir /tmp/qd_merge1e \
    --merge-layer 1 --n 64 --batch-size 16
sentinel adaptive_k_sweep_merge1e $?
timeout 1750 python perf/adaptive_k_sweep.py --stage1-dir /tmp/qd_m0d64 \
    --merge-layer 0 --detok-patch 64 --n 64 --batch-size 16
sentinel adaptive_k_sweep_m0d64 $?

# 5. m1d64 (merge_layer=1 + detok_patch=64, 5033 img/s) — the other >5k
#    candidate; also separates the merge0-vs-merge1 axis at detok64
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

# 6. tail (best-effort): combo rescue at gentler LR/warmup — the grad
#    spike preceding the comboe stall sits at steps ~150-200 of
#    warmup-100 runs
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --learning-rate 5e-4 --warmup-steps 300 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --detok-patch 32 --output-dir /tmp/qd_combof \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_combof $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_combof \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --detok-patch 32 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_combof $?
