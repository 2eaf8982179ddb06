#!/bin/bash
# TPU queue, round-4 wave 3: the merge-variant quality retrains with the
# merge_out_norm fix (PERF.md "quality program": wave-2 merge evals
# collapsed — feature-norm drift saturated DPC-KNN at K=N), the fixed
# tests_tpu oracle, the name-erasing-platform trace fallback, and the
# next speed points past the measured 4014 img/s combo.
# Same rules: serialize, ONE TPU process, per-item sentinels to history.
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

# 1. real-chip test tier with the fixed quant4 oracle (wave-2 rc=1 was
#    ORACLE error: plain f32 matmul on TPU runs bf16 MXU passes; the
#    reference now pins Precision.HIGHEST). Full run, no -x.
timeout 3000 python -m pytest tests_tpu/ -q; sentinel tests_tpu_v2 $?

# 2. merge_layer=1 retrain with merge_out_norm + eval (fresh dir — the
#    old /tmp/qd_merge1 checkpoint has no LN params and is the collapsed
#    run anyway)
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 --threshold 0.3 \
    --merge-layer 1 --output-dir /tmp/qd_merge1b \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_merge1b $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_merge1b --threshold 0.3 \
    --merge-layer 1 --batch-size 16 --fid --eval-seed 10000
sentinel qd_eval_merge1b $?

# 3. combo retrain (merge1 + detok_patch 32) + eval — the shipping-
#    recommendation candidate (4014 img/s); the wave-2 combo checkpoint
#    trained without the LN and is expected collapsed
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 --threshold 0.3 \
    --merge-layer 1 --detok-patch 32 --output-dir /tmp/qd_combob \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_combob $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_combob --threshold 0.3 \
    --merge-layer 1 --detok-patch 32 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_combob $?

# 4. speed points past the combo: merge after block 0, detok_patch 64
timeout 3000 python perf/ab_merge.py --configs "0:32,1:64,0:64"
sentinel ab_merge_wave3 $?

# 5. component split AT the combo config — what dominates at 0.249 ms/img?
timeout 1750 python perf/ab_merge_split.py --configs "1:32"
sentinel ab_merge_split_combo $?

# 6. engine bits A/B, third run: per-variant traces + total-jit fallback
#    for the name-erasing tunnel (trace_ab.py) — device-ms column must be
#    nonzero this time
timeout 1750 python perf/serve_bits_ab.py; sentinel serve_bits_ab_v3 $?

# 7. tail (best-effort): merge3 retrain + eval completes the quality table
timeout 4200 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 --threshold 0.3 \
    --merge-layer 3 --output-dir /tmp/qd_merge3b \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_merge3b $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_merge3b --threshold 0.3 \
    --merge-layer 3 --batch-size 16 --fid --eval-seed 10000
sentinel qd_eval_merge3b $?

# 8. tail (best-effort): long-context cache A/B under the per-variant
#    trace fallback — revalidates the r3 device-ms methodology on the
#    current tunnel
timeout 1750 python perf/ab_int8_cache.py; sentinel ab_int8_cache_v2 $?
