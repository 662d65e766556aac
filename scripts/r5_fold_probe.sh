#!/bin/bash
# Round-5 n_made-curve probe (VERDICT r4 missing#1): does the fold=2.0
# non-convex stand-in (configs/mnist_svhn/hard2) make cross-coherence RISE
# with flow depth? Trains the two decisive grid points (n_made 0 vs 2) on a
# fresh hard2 DCCA artifact and validates both. If acc(n_made=2) >
# acc(n_made=0) in at least one direction, run the remaining points
# (r5_fold_grid.sh) to trace the full published curve.
set -ex
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1

EXP=${EXP:-/root/exp_r5_hard2}

retry_tpu() {
  local attempt
  for attempt in 1 2 3; do
    if timeout "${TPU_STEP_TIMEOUT:-1800}" "$@"; then
      return 0
    fi
    echo "retry_tpu: attempt $attempt failed for: $*" >&2
    sleep 20
  done
  echo "retry_tpu: GIVING UP on: $*" >&2
  return 1
}

retry_tpu python -u -m mmvae_tpu.cli.dcca_train --dataset mnist_svhn \
  --synthetic-n 20000 --difficulty 0.55 --confound-max 0.7 --fold 2.0 \
  --out /root/experiments/dcca_hard2_r5 --epochs 20 \
  --platform "" --backend chol

for cfg in nmade_0 nmade_2; do
  retry_tpu python -u -m mmvae_tpu.cli.train \
    --config-path "configs/mnist_svhn/hard2/jnfd_hard2_${cfg}.json" \
    --experiments-dir "$EXP"
done

retry_tpu python -u -m mmvae_tpu.cli.validate --model jmvae_nf_dcca_nmade0/mnist_svhn_hard2 \
  --experiments-dir "$EXP" --skip-fid
retry_tpu python -u -m mmvae_tpu.cli.validate --model jmvae_nf_dcca/mnist_svhn_hard2 \
  --experiments-dir "$EXP" --skip-fid
