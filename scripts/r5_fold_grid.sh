#!/bin/bash
# Round-5 hard2 n_made grid, remaining points (after r5_fold_probe.sh
# trained/validated n_made 0 and 2): trace the full published curve
# (tests/ablation_n_made.py:8-13) on the fold=2.0 non-convex stand-in.
set -x
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

fail=0
for cfg in nmade_1 nmade_3 nmade_5; do
  retry_tpu python -u -m mmvae_tpu.cli.train \
    --config-path "configs/mnist_svhn/hard2/jnfd_hard2_${cfg}.json" \
    --experiments-dir "$EXP" || fail=1
done
for exp in jmvae_nf_dcca_nmade1 jmvae_nf_dcca_nmade3 jmvae_nf_dcca_nmade5; do
  retry_tpu python -u -m mmvae_tpu.cli.validate \
    --model "$exp/mnist_svhn_hard2" \
    --experiments-dir "$EXP" --skip-fid || fail=1
done
exit $fail
