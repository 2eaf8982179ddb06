#!/bin/bash
# Pending TPU measurements — run top-to-bottom the moment the axon tunnel
# is back (each step is independent; serialize, never two TPU procs).
# Status context: ROADMAP.md "Performance" + PERF.md "quality dry run".
set -x
cd /root/repo

# 0. tunnel check (fail fast)
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. headline bench refresh (appends perf/history.jsonl)
timeout 580 python bench.py

# 2. int8-KV-cache decode A/B at cache-bound shapes (ROADMAP item 9 tail)
timeout 580 python perf/ab_int8_cache.py

# 3. quality dry run, quant8 row (PERF.md table: "pending TPU window")
#    — same checkpoint/flags as the committed fp32/bf16 rows
timeout 580 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_run --threshold 0.3 \
    --batch-size 16 --fid --eval-seed 10000 --precision quant8

# 4. meshed tokenizer bench, dp=1 on the real chip (bench_mesh.py claim:
#    the meshed graph reproduces the unmeshed headline)
timeout 580 python perf/bench_mesh.py --dp 1

# 5. train-step MFU at base scale (new harness, no TPU numbers yet)
timeout 580 python perf/train_bench.py --stage 1 --scale base --batch 16 \
    --steps 10 --warmup 2
