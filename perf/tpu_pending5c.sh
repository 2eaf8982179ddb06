#!/bin/bash
# TPU queue, round-5 wave 3 — reacts to qd_eval_basee: the CLIPPED
# BASELINE control collapsed (SSIM 0.0128, same constant-token signature,
# NO merge / NO detok change). That overturns the detok_patch diagnosis:
# the clip regime is now the discriminator —
#   clip ON  (a48de6b default): comboe, m0d64, basee   → 3/3 collapsed
#   clip OFF (r4):              qd_run 0.1799, merge1d 0.2398 → healthy
#   clip OFF (r4):              merge3d/combod          → collapsed
# (so clip-off is necessary-looking, not sufficient; detok_patch>16 may
# still be bad — merge3d/combod were clip-off and collapsed.)
#
# This wave is a clean matrix at ONE recipe (clip OFF via
# --max-grad-norm 0, threshold=1e9 fixed-K=16, 1500 steps, bs 16,
# eval n=128 seed 10000): control, merge1 (replication of healthy
# merge1d in-container), merge1+detok_depth4 (shipping candidate).
# Clip isolation = basef-vs-basee (one variable).
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

# 0. wait for the in-flight ab_merge depth speed points
APID=${APID:-9732}
while kill -0 "$APID" 2>/dev/null; do sleep 15; done
sentinel ab_merge_depth_waited 0

# 1. basef: baseline, clip OFF — isolates the clip variable vs basee
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --max-grad-norm 0 \
    --threshold 1e9 --min-cluster-num 16 \
    --output-dir /tmp/qd_basef \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_basef $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_basef \
    --threshold 1e9 --min-cluster-num 16 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_basef $?

# 2. merge1f: merge1, clip OFF — in-container replication of merge1d +
#    adaptive-K sweep input
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --max-grad-norm 0 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --output-dir /tmp/qd_merge1f \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_merge1f $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_merge1f \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --batch-size 16 --fid --eval-seed 10000
sentinel qd_eval_merge1f $?

# 3. m1dd4: merge1 + detok_depth=4, clip OFF — the shipping candidate
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --max-grad-norm 0 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --detok-depth 4 --output-dir /tmp/qd_m1dd4 \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_m1dd4 $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_m1dd4 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --detok-depth 4 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_m1dd4 $?

# 4. adaptive-K restoration sweep (cluster_dist_norm) on the healthy
#    merged ckpt
timeout 1750 python perf/adaptive_k_sweep.py --stage1-dir /tmp/qd_merge1f \
    --merge-layer 1 --n 64 --batch-size 16
sentinel adaptive_k_sweep_merge1f $?

# 5. tail (best-effort): sweep on the shipping candidate too
timeout 1750 python perf/adaptive_k_sweep.py --stage1-dir /tmp/qd_m1dd4 \
    --merge-layer 1 --detok-depth 4 --n 64 --batch-size 16 \
    || true
sentinel adaptive_k_sweep_m1dd4 $?
