#!/bin/bash
# TPU queue, round-5 wave 6 — restart of wave 5 after the q5e crash:
# the basee2 control train died at step 500/1500 on a
# StepAlreadyExistsError (SIGTERM preemption save raced the periodic
# save of the same step — now idempotent in CheckpointRunner.save) and
# everything after it never ran. basee2 RESUMES from its step-500
# checkpoint (the point of the resume machinery — r4 verdict weak #5).
#
# Matrix at the SHIPPED DEFAULTS (clip 1.0, lr 1e-3, warmup 100;
# fixed-K recipe threshold=1e9 + min_cluster_num=16), fixed contrastive
# harness (per-image frozen embedding table, 2ac42f0):
#   1. basee2   — control (parity architecture)
#   2. m1dd4e2  — merge1 + detok_depth 4 (shipping candidate, 3421 img/s)
#   3. m1dd2e2  — merge1 + detok_depth 2 (stretch candidate, 3852 img/s)
#   4. m1e2     — merge1 full depth (fixed-harness replication of
#                 merge1f's legacy-harness SSIM 0.350)
#   5. adaptive-K dist_norm sweep on the shipping candidate (tail)
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

# 1. control resume: fixed-harness base at the shipped defaults
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --threshold 1e9 --min-cluster-num 16 \
    --output-dir /tmp/qd_basee2 \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_basee2 $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_basee2 \
    --threshold 1e9 --min-cluster-num 16 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_basee2 $?

# 2. shipping candidate: merge1 + detok_depth 4
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --detok-depth 4 --output-dir /tmp/qd_m1dd4e2 \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_m1dd4e2 $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_m1dd4e2 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --detok-depth 4 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_m1dd4e2 $?

# 3. stretch candidate: merge1 + detok_depth 2
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --detok-depth 2 --output-dir /tmp/qd_m1dd2e2 \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_m1dd2e2 $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_m1dd2e2 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --detok-depth 2 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_m1dd2e2 $?

# 4. merge1 full depth under the fixed harness (merge1f replication)
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --output-dir /tmp/qd_m1e2 \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_m1e2 $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_m1e2 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --batch-size 16 --fid --eval-seed 10000
sentinel qd_eval_m1e2 $?

# 5. tail (best-effort): adaptive-K dist_norm sweep on the shipping ckpt
timeout 1750 python perf/adaptive_k_sweep.py --stage1-dir /tmp/qd_m1dd4e2 \
    --merge-layer 1 --detok-depth 4 --n 64 --batch-size 16 || true
sentinel adaptive_k_sweep_m1dd4e2 $?
