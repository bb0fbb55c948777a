#!/usr/bin/env bash
# Seed-sweep training driver (reference main/train.sh:1-17 semantics: the
# reference reran 3 identical configs for repeatability-by-sweep).
set -euo pipefail

CONFIG=${CONFIG:-ms1m_arcface_122}
NETWORK=${NETWORK:-AlterNet50}
OPTIMIZER=${OPTIMIZER:-AdamW}
LR=${LR:-5e-4}
SAMPLE_RATE=${SAMPLE_RATE:-0.3}
SEEDS=${SEEDS:-3}

for seed in $(seq 1 "${SEEDS}"); do
  echo "=== run ${seed}/${SEEDS}: ${NETWORK} ${OPTIMIZER} lr=${LR} r=${SAMPLE_RATE} ==="
  python -m fr_tpu.cli.main \
    --config "${CONFIG}" \
    --mode train \
    --network "${NETWORK}" \
    --optimizer "${OPTIMIZER}" \
    --lr "${LR}" \
    --sample_rate "${SAMPLE_RATE}" \
    "$@"
done
