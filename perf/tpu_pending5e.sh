#!/bin/bash
# TPU queue, round-5 wave 5 — the root cause landed: the synthetic
# harness drew text_emb from the BATCH seed, not the image identity, so
# the weight-1.0 contrastive term was unlearnable noise whose optimum is
# image-INDEPENDENT tokens — i.e. the harness itself pushed every run
# toward the measured constant-token attractor (PERF.md round-5; fix in
# scripts/train_setok.py: frozen per-image embedding table).
#
# This wave re-runs the quality matrix at the SHIPPED DEFAULTS (clip 1.0,
# lr 1e-3, warmup 100; fixed-K recipe unchanged): control and the
# merge1+detok_depth4 shipping candidate, under the fixed harness.
# merge1f (in flight) still evals first as the legacy-harness
# replication row for merge1d.
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

# 0. wait for the in-flight merge1f train (legacy harness)
MPID=${MPID:-15398}
while kill -0 "$MPID" 2>/dev/null; do sleep 20; done
sentinel qd_train_merge1f_waited 0

# 1. merge1f eval — merge1d replication test under the legacy harness
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_merge1f \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --batch-size 16 --fid --eval-seed 10000
sentinel qd_eval_merge1f $?

# 2. fixed-harness control at the shipped defaults
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

# 3. fixed-harness shipping candidate: merge1 + detok_depth 4
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

# 4. tail (best-effort): adaptive-K dist_norm sweep on the shipping ckpt
timeout 1750 python perf/adaptive_k_sweep.py --stage1-dir /tmp/qd_m1dd4e2 \
    --merge-layer 1 --detok-depth 4 --n 64 --batch-size 16 || true
sentinel adaptive_k_sweep_m1dd4e2 $?
