#!/usr/bin/env bash
# Checkpoint evaluation driver (reference main/test.sh:1-9: loop saved
# encoder checkpoints through pair verification).
set -euo pipefail

CONFIG=${CONFIG:-ms1m_arcface_122}
NETWORK=${NETWORK:-AlterNet50}
TEST_TYPE=${TEST_TYPE:-pair}

for ckpt in "$@"; do
  echo "=== testing ${ckpt} ==="
  python -m fr_tpu.cli.main \
    --config "${CONFIG}" \
    --mode test \
    --network "${NETWORK}" \
    --test_type "${TEST_TYPE}" \
    --ckpt_path "${ckpt}"
done
