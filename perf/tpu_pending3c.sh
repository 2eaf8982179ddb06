#!/bin/bash
# TPU queue, round-4 wave 3c. Supersedes 3b (killed at its combo item):
# the 3b merge1 eval still read SSIM 0.013 — train L1 beat the baseline
# but held-out collapsed (trainable random post-merge tail = moving
# target for the detokenizer, + overfit on 512 images). The library now
# pool-inits merge_proj (exact 2x2 average) and keeps the WHOLE backbone
# frozen under freeze_backbone, so the merged recipe has
# baseline-identical training dynamics (tiny CPU A/B: merged SSIM now
# matches tiny baseline). Same flags as 3b — pool-init is the library
# default; fixed-K=16 via threshold=1e9 (reference fallback semantics);
# fresh output dirs. tests_tpu_v2 already passed (9/9).
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

# 1. merge_layer=1 retrain, fixed-K=16 + eval
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --output-dir /tmp/qd_merge1d \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_merge1d $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_merge1d \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --batch-size 16 --fid --eval-seed 10000
sentinel qd_eval_merge1d $?

# 2. combo retrain (merge1 + detok_patch 32), fixed-K=16 + eval
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --detok-patch 32 --output-dir /tmp/qd_combod \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_combod $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_combod \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 1 --detok-patch 32 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_combod $?

# 3. speed points past the combo: merge after block 0, detok_patch 64
timeout 3000 python perf/ab_merge.py --configs "0:32,1:64,0:64"
sentinel ab_merge_wave3 $?

# 4. component split AT the combo config — what dominates at 0.249 ms/img?
timeout 1750 python perf/ab_merge_split.py --configs "1:32"
sentinel ab_merge_split_combo $?

# 5. engine bits A/B, third run: per-variant traces + total-jit fallback
#    (device-ms column must be nonzero this time)
timeout 1750 python perf/serve_bits_ab.py; sentinel serve_bits_ab_v3 $?

# 6. control: the threshold-0.3-trained BASELINE evaluated at fixed K=16 —
#    separates "fixed-K recipe cost" from "merge cost" in the A/B
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_run \
    --threshold 1e9 --min-cluster-num 16 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_base_fixedk $?

# 7. tail (best-effort): merge3 fixed-K retrain + eval
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 3 --output-dir /tmp/qd_merge3d \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_merge3d $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_merge3d \
    --threshold 1e9 --min-cluster-num 16 \
    --merge-layer 3 --batch-size 16 --fid --eval-seed 10000
sentinel qd_eval_merge3d $?

# 8. tail (best-effort): long-context cache A/B under per-variant traces
timeout 1750 python perf/ab_int8_cache.py; sentinel ab_int8_cache_v2 $?
