#!/bin/bash
# Stage-3 LoRA instruction tuning (parity: reference scripts/finetune.sh —
# --lora_r 128 --lora_alpha 256 --mm_projector_lr 2e-5, 6-dataset mixture).
python scripts/train_setokim.py \
    --task-type instruction \
    --dataset-name ${DATASET_NAMES:?space-separated names} \
    --data-path ${DATA_PATHS:?} \
    --batch-size 32 --learning-rate 2e-4 --model-max-length 2048 \
    --lora-enable --lora-r 128 --lora-alpha 256 \
    --mm-in-projector-lr 2e-5 --mm-out-projector-lr 2e-5 \
    --output-dir "${OUTPUT_DIR:-./checkpoints/setokim_stage3}" "$@"
