#!/bin/bash
# Stage-2 projector pretraining (parity: reference scripts/pretrain_mm_proj.sh —
# --version plain, tune in/out adapters, bs 32, lr 1e-3, seq 2048).
python scripts/train_setokim.py \
    --task-type pair --data-path "${DATA_PATH:?}" \
    --batch-size 32 --learning-rate 1e-3 --model-max-length 2048 \
    --tune-mm-in-mlp-adapter --tune-mm-out-mlp-adapter \
    --output-dir "${OUTPUT_DIR:-./checkpoints/setokim_stage2}" "$@"
