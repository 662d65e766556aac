#!/bin/bash
# Round-4 resume chain: the dev box rebooted after r4_hard_stage1.sh had run
# (its calibration result is recorded in docs/QUALITY.md), wiping every
# artifact outside /root/repo (DCCA trunks, run dirs, classifier pool, jax
# compile cache). This script re-creates stage 1's artifacts, then runs the
# remaining round-4 chain end to end:
#   1. hard DCCA pretrain + flagship hard point train/validate  (stage 1)
#   2. the 7 remaining hard-grid points + table                 (stage 2)
#   3. PRD/classifier-FID, bench --all, traces, MSF HMC, bf16   (post-grid)
set -x
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1

EXP_HARD=${EXP_HARD:-/root/exp_r4_hard}
CMAX=${CMAX:-0.7}

retry_tpu() {
  local attempt
  for attempt in 1 2 3; do
    if timeout "${TPU_STEP_TIMEOUT:-2400}" "$@"; then
      return 0
    fi
    echo "retry_tpu: attempt $attempt failed for: $*" >&2
    sleep 20
  done
  echo "retry_tpu: GIVING UP on: $*" >&2
  return 1
}

# --- stage 1 rebuild (artifacts wiped by reboot; results already in QUALITY.md,
#     but stage 2 + post-grid need the DCCA npz and the flagship run dir) ---
retry_tpu python -u -m mmvae_tpu.cli.dcca_train --dataset mnist_svhn \
  --synthetic-n 20000 --difficulty 0.55 --confound-max "$CMAX" \
  --out /root/experiments/dcca_hard_r4 --epochs 20 \
  --platform "" --backend chol > /tmp/r4_dcca.log 2>&1 || exit 1

retry_tpu python -u -m mmvae_tpu.cli.train \
  --config-path configs/mnist_svhn/hard/jnfd_hard_nmade_2.json \
  --experiments-dir "$EXP_HARD" > /tmp/r4_flagship_train.log 2>&1 || exit 1

retry_tpu python -u -m mmvae_tpu.cli.validate \
  --model jmvae_nf_dcca/mnist_svhn_hard --experiments-dir "$EXP_HARD" \
  --skip-fid > /tmp/r4_flagship_validate.log 2>&1

# --- stage 2: the 7 remaining grid points ---
EXP="$EXP_HARD" bash scripts/r4_hard_stage2.sh > /tmp/r4_stage2.log 2>&1

# --- post-grid demonstration chain ---
HARD_EXP="$EXP_HARD" bash scripts/r4_post_grid.sh > /tmp/r4_post_grid.log 2>&1

echo "r4_resume: done"
