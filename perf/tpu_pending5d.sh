#!/bin/bash
# TPU queue, round-5 wave 4 — reacts to qd_eval_basef: the UNCLIPPED
# fixed-K baseline ALSO collapsed (SSIM 0.0104; grad-norm grew 1e4→1e19
# while losses stayed finite — the wd=0 norm-drift pathology made
# visible). Ledger now: 2 healthy (r4 qd_run @ adaptive-0.3, r4 merge1d)
# vs 6 collapsed across clip on/off, merge 0/1/3/none, detok 16/32/64 —
# NO single variable discriminates. Conclusion: the 1500-step synthetic
# proxy recipe has a dominant degenerate attractor (constant tokens /
# predict-the-mean); escaping it is config-sensitive luck at LR 1e-3.
#
# This wave tries the one untried systematic escape: the gentle recipe
# (lr 5e-4, warmup 300 — the grad spike that precedes every stall sits
# at steps ~150-200 of warmup-100 runs). Matrix at the gentle recipe:
# control, merge1+detok_depth4 (shipping candidate). merge1f (in
# flight, default recipe) doubles as the merge1d replication test.
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

# 0. wait for the in-flight merge1f train (wave-3 item 2)
MPID=${MPID:-15398}
while kill -0 "$MPID" 2>/dev/null; do sleep 20; done
sentinel qd_train_merge1f_waited 0

# 1. merge1f eval — the merge1d replication test (default recipe)
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_merge1f \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --batch-size 16 --fid --eval-seed 10000
sentinel qd_eval_merge1f $?

# 2. gentle control: base, lr 5e-4, warmup 300, clip off
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --max-grad-norm 0 --learning-rate 5e-4 --warmup-steps 300 \
    --threshold 1e9 --min-cluster-num 16 \
    --output-dir /tmp/qd_baseg \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_baseg $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_baseg \
    --threshold 1e9 --min-cluster-num 16 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_baseg $?

# 3. gentle shipping candidate: merge1 + detok_depth 4
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --max-grad-norm 0 --learning-rate 5e-4 --warmup-steps 300 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --detok-depth 4 --output-dir /tmp/qd_m1dd4g \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_m1dd4g $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_m1dd4g \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --detok-depth 4 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_m1dd4g $?

# 4. adaptive-K restoration sweep on the healthiest merged ckpt
#    (merge1f if healthy, else m1dd4g — pick merge1f; rc!=0 tolerated)
timeout 1750 python perf/adaptive_k_sweep.py --stage1-dir /tmp/qd_merge1f \
    --merge-layer 1 --n 64 --batch-size 16 || true
sentinel adaptive_k_sweep_merge1f $?
