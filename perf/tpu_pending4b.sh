#!/bin/bash
# TPU queue, round-5 wave 2. Reacts to wave 1's first result: the clipped
# combo retrain (qd_comboe) repeated the stall signature — l1 dipped to
# 0.37 by step ~100, a grad spike (~15 global-norm at steps 150-199, i.e.
# 50 clipped norm-1.0 steps at peak LR), then l1 stuck at ~0.41 with
# grad_norm ~0.15 (a predict-the-mean basin). Clip alone is NOT sufficient
# for detok_patch=32; merge1-alone trained healthy on the same recipe
# (r4 merge1d SSIM 0.2398 vs control 0.1799).
#
# This wave: (1) re-establish the healthy merge1 checkpoint IN THIS
# container (also = merge1-with-clip quality row), (2) rescue attempt for
# the combo at gentler LR/warmup, (3) the clipped baseline control every
# comparison needs (the r4 control predates the clip default), (4) the
# adaptive-K dist_norm sweep on the merged checkpoint, (5) detok32-only
# at the gentle recipe (isolates the detok32 lever).
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

# 1. merge1 retrain with the clip (fixed-K recipe) + eval
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

# 2. combo rescue: lr 5e-4, warmup 300 (the grad spike that precedes the
#    stall sits at steps ~150-200 of warmup-100 runs)
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

# 3. clipped baseline control (the r4 qd_eval_base_fixedk control was
#    trained pre-clip-default; /tmp did not survive the container)
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

# 4. adaptive-K restoration sweep (cluster_dist_norm) on the merged ckpt
timeout 1750 python perf/adaptive_k_sweep.py --stage1-dir /tmp/qd_merge1e \
    --merge-layer 1 --n 64 --batch-size 16
sentinel adaptive_k_sweep_merge1e $?

# 5. tail (best-effort): detok32-only at the gentle recipe
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --learning-rate 5e-4 --warmup-steps 300 \
    --threshold 1e9 --min-cluster-num 16 \
    --detok-patch 32 --output-dir /tmp/qd_dp32f \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_dp32f $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_dp32f \
    --threshold 1e9 --min-cluster-num 16 \
    --detok-patch 32 --batch-size 16 --fid --eval-seed 10000
sentinel qd_eval_dp32f $?
