#!/bin/bash
# Stage-1 SeTok training launch (parity: reference scripts/train_setok.sh —
# deepspeed zero2, bs 24, lr 1e-3, seq 77 → one process drives the mesh;
# ZeRO ≡ the FSDP sharding rules applied inside).
python scripts/train_setok.py \
    --data-path "${DATA_PATH:?set DATA_PATH to a cc3m-style json}" \
    --image-folder "${IMAGE_FOLDER:-}" \
    --batch-size 24 --learning-rate 1e-3 --image-size 256 \
    --min-cluster-num 64 --threshold 0.55 --disc-start 5000 \
    --output-dir "${OUTPUT_DIR:-./checkpoints/setok_stage1}" "$@"
