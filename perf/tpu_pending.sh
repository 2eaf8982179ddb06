#!/bin/bash
# Pending TPU measurements — run top-to-bottom on the chip (each item is
# independent; serialize, never two TPU procs). Every item appends a
# COMPLETION SENTINEL to perf/history.jsonl so a half-executed queue is
# visible (VERDICT r3 weak #4: items 3-5 of the r3 queue silently never
# ran). Check status:  grep tpu_queue perf/history.jsonl
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

# 0. tunnel check (fail fast)
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. headline bench refresh
timeout 1200 python bench.py; sentinel bench $?

# 2. int8-KV-cache A/B under the new default (XLA dequant) + opt-in kernel
timeout 1200 python perf/ab_int8_cache.py; sentinel ab_int8_cache $?

# 3. token-merge throughput at merge_layer 1/3/5 (VERDICT r3 next #1)
timeout 1750 python perf/ab_merge.py; sentinel ab_merge $?

# 4. meshed tokenizer bench, dp=1 (meshed graph == unmeshed headline)
timeout 900 python perf/bench_mesh.py --dp 1; sentinel bench_mesh $?

# 5. train-step ms/step + MFU at base scale, both stages
timeout 1200 python perf/train_bench.py --stage 1 --scale base --batch 16 \
    --steps 10 --warmup 2; sentinel train_bench_s1 $?
timeout 1200 python perf/train_bench.py --stage 2 --scale mid --batch 4 \
    --steps 8 --warmup 2; sentinel train_bench_s2 $?

# 6. serving: wall tok/s sweep + trace device ms/step + spec bounds
timeout 1750 python perf/serve_bench.py; sentinel serve_bench $?

# 7. engine-level bits=4 vs 8 vs bf16 decode A/B w/ greedy-match guard
timeout 1750 python perf/serve_bits_ab.py; sentinel serve_bits_ab $?

# 8. quality program: retrain the quality-dry-run baseline (the r3 /tmp
#    checkpoint did not survive the container), then the precision sweep
#    incl. the quant8 row, then the token-merge quality A/B (VERDICT #1).
timeout 3500 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 --threshold 0.3 \
    --output-dir /tmp/qd_run --disc-start 100000 --checkpoint-every 500
sentinel qd_train_baseline $?
for prec in fp32 bf16 quant8; do
  timeout 1200 python scripts/eval_recon.py --synthetic 128 \
      --synthetic-structured --stage1-dir /tmp/qd_run --threshold 0.3 \
      --batch-size 16 --fid --eval-seed 10000 --precision $prec
  sentinel "qd_eval_$prec" $?
done
for ml in 3 1; do
  timeout 3500 python scripts/train_setok.py --synthetic 512 \
      --synthetic-structured --steps 1500 --batch-size 16 --threshold 0.3 \
      --merge-layer $ml --output-dir /tmp/qd_merge$ml \
      --disc-start 100000 --checkpoint-every 500
  sentinel "qd_train_merge$ml" $?
  timeout 1200 python scripts/eval_recon.py --synthetic 128 \
      --synthetic-structured --stage1-dir /tmp/qd_merge$ml --threshold 0.3 \
      --merge-layer $ml --batch-size 16 --fid --eval-seed 10000
  sentinel "qd_eval_merge$ml" $?
done
