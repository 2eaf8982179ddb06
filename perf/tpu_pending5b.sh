#!/bin/bash
# TPU queue, round-5 wave 2 — reacts to qd_eval_m0d64: SSIM 0.0127, the
# SAME constant-token collapse as combo (×2) and merge3 (×2). Every
# detok_patch>16 config now collapses under the synthetic recipe while
# merge1 at patch 16 trained healthy (r4 merge1d SSIM 0.2398 > control
# 0.1799). The /tmp/qd_comboe probe localized it: tokens vary across
# slots (std 114) but are nearly image-independent (std 2.9 at |tok|≈66)
# — a degenerate tokenizer basin, decoder responsive. Coarse decoder
# queries starve the token gradient; the detok_DEPTH lever keeps the
# quality-proven patch-16 query grid and shrinks the same decode
# residual, so it is now the shipping-recipe critical path.
#
# Order: basee eval (control) → depth speed points → merge1e train+eval
# (clipped healthy row + sweep input) → merge1+depth4 train+eval (new
# shipping candidate) → adaptive-K sweeps → gentle-LR combo rescue (tail).
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

# 0. wait for the in-flight basee train (pending5 item 2)
BPID=${BPID:-7275}
while kill -0 "$BPID" 2>/dev/null; do sleep 20; done
sentinel qd_train_basee_waited 0

# 1. clipped-control eval — every quality comparison's denominator
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_basee \
    --threshold 1e9 --min-cluster-num 16 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_basee $?

# 2. detok_depth speed points (merge1 + decoder_depth {8,4,2}; patch 16)
timeout 1750 python perf/ab_merge.py --configs "1:-:8,1:-:4,1:-:2"
sentinel ab_merge_depth $?

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

# 4. merge1 + detok_depth=4 (patch 16): the new shipping candidate
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
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

# 5. adaptive-K restoration sweeps (cluster_dist_norm) on merged ckpts
timeout 1750 python perf/adaptive_k_sweep.py --stage1-dir /tmp/qd_merge1e \
    --merge-layer 1 --n 64 --batch-size 16
sentinel adaptive_k_sweep_merge1e $?

# 6. tail (best-effort): combo rescue at gentler LR/warmup — tests the
#    optimization-basin diagnosis for the detok_patch family
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
