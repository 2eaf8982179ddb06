#!/bin/bash
# Follow-up TPU queue (round 4, second wave): re-runs of the harnesses
# fixed AFTER the first queue started — do not edit tpu_pending.sh while
# bash is mid-file. Same rules: serialize, one TPU proc, per-item
# completion sentinels into perf/history.jsonl.
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

# 1. token-merge A/B, now APPENDING history entries (first run printed to
#    the queue log only) — 6 configs now (detok-patch + combo points);
#    wave-1 took ~26 min for 4, so 1750s would clip the tail
timeout 3000 python perf/ab_merge.py; sentinel ab_merge_v2 $?

# 2. meshed bench dp=1 with the in-process unmeshed control (first run
#    read 995 vs the 1568 headline — separate graph cost from tunnel
#    session variance) + device-generated inputs
timeout 1200 python perf/bench_mesh.py --dp 1; sentinel bench_mesh_v2 $?

# 2b. engine bits A/B re-run: the r4 first run's device-ms column was 0.0
#     (trace helper hardwired the chain_ prefix); the fixed helper also
#     dumps top device events if the name still doesn't match
timeout 1750 python perf/serve_bits_ab.py; sentinel serve_bits_ab_v2 $?

# 2c. quant8 precision-sweep row re-run: wave-1 hit the 1200s timeout
#     (rc 124 sentinel) — int8 Pallas compile at batch 16 + FID re-jit;
#     give it the full window (compile cache is on by default: 'auto')
#     batch 64 == the bench's compiled shape -> persistent-cache hit for
#     the int8 forward (PSNR/SSIM are batch-size-invariant; 128 = 2x64)
timeout 3000 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_run --threshold 0.3 \
    --batch-size 64 --fid --eval-seed 10000 --precision quant8
sentinel qd_eval_quant8_v2 $?

# 2d. merge3 eval re-run: wave-1 rc=1 — eval_recon replaced the vit
#     before the clamped knobs landed (fixed: atomic replace); the
#     trained checkpoint at /tmp/qd_merge3 is intact
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_merge3 --threshold 0.3 \
    --merge-layer 3 --batch-size 16 --fid --eval-seed 10000
sentinel qd_eval_merge3_v2 $?

# 3. train-step MFU with a real readback barrier (first run timed dispatch
#    enqueue: 138% "MFU")
timeout 1200 python perf/train_bench.py --stage 1 --scale base --batch 16 \
    --steps 10 --warmup 2; sentinel train_bench_s1_v2 $?
timeout 1200 python perf/train_bench.py --stage 2 --scale mid --batch 4 \
    --steps 8 --warmup 2; sentinel train_bench_s2_v2 $?

# 4. component split of the merge variant: tokenize vs detokenize ms/img
#    (the detokenizer's grid^2-query mapper doesn't shrink with N — how
#    hard does Amdahl bite at merge_layer=1?)
timeout 1750 python perf/ab_merge_split.py; sentinel ab_merge_split $?

# 5. real-chip test tier (exact-kth cluster kernel under Mosaic, opt-in
#    cache kernel at head_dim=128, chip-vs-CPU SSIM equality, ...)
timeout 3000 python -m pytest tests_tpu/ -q -x; sentinel tests_tpu $?

# 6. quality A/B for the combined fast recipe (merge_layer=1 +
#    detok_patch=32) — lowest priority; runs only if the window allows
timeout 3500 python scripts/train_setok.py --synthetic 512 \
    --synthetic-structured --steps 1500 --batch-size 16 --threshold 0.3 \
    --merge-layer 1 --detok-patch 32 --output-dir /tmp/qd_combo \
    --disc-start 100000 --checkpoint-every 500
sentinel qd_train_combo $?
timeout 1200 python scripts/eval_recon.py --synthetic 128 \
    --synthetic-structured --stage1-dir /tmp/qd_combo --threshold 0.3 \
    --merge-layer 1 --detok-patch 32 --batch-size 16 --fid \
    --eval-seed 10000
sentinel qd_eval_combo $?

# 7. serve_bench re-run (best-effort): device-ms rows with the fixed
#    trace-name matching
timeout 1750 python perf/serve_bench.py; sentinel serve_bench_v2 $?
