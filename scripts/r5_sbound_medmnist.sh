#!/bin/bash
# Round-5 MAF-overflow fix validation (VERDICT r4 weak#1): rerun the
# MedMNIST 100-epoch JNF recipe with s_bound_flow=8 (bounded log-scale,
# flows/autoregressive.py). The unbounded twin NaN'd at epoch 92/100.
# Done = full 100 epochs, zero nan_guard skips, quality matching the
# epoch-91 early-stop row in docs/QUALITY.md.
set -x
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
EXP=${EXP:-/root/exp_r5_hard2}

retry_tpu() {
  local attempt
  for attempt in 1 2 3; do
    if timeout "${TPU_STEP_TIMEOUT:-2400}" "$@"; then return 0; fi
    echo "retry_tpu: attempt $attempt failed for: $*" >&2
    sleep 20
  done
  echo "retry_tpu: GIVING UP on: $*" >&2
  return 1
}

fail=0
retry_tpu python -u -m mmvae_tpu.cli.train \
  --config-path configs/medmnist/jnf_sbound.json --experiments-dir "$EXP" || fail=1
retry_tpu python -u -m mmvae_tpu.cli.validate --model jmvae_nf/medmnist_sbound \
  --experiments-dir "$EXP" --skip-fid || fail=1
exit $fail
