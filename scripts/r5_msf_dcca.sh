#!/bin/bash
# Round-5 trimodal DCCA pipeline end to end (VERDICT r4 missing#2):
# 3-view DCCA pretraining with mcca_loss (the reference's msf.sh:7 stage,
# dcca/objectives.py:89-108, dcca/trainings/main_mnist_svhn_fashion.py) ->
# graft into JNF-MSF (dcca=true) -> full validate incl. PoE/HMC subsets.
set -x
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1

EXP=${EXP:-/root/exp_r5_hard2}

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

fail=0
retry_tpu python -u -m mmvae_tpu.cli.dcca_train --dataset mnist_svhn_fashion \
  --synthetic-n 20000 --epochs 30 \
  --out /root/experiments/dcca_msf_r5 --platform "" --backend chol || fail=1

retry_tpu python -u -m mmvae_tpu.cli.train \
  --config-path configs/msf/jnf_dcca_synth.json --experiments-dir "$EXP" || fail=1

retry_tpu python -u -m mmvae_tpu.cli.validate --model jmvae_nf_dcca/msf_synth \
  --experiments-dir "$EXP" --skip-fid --mcmc-steps 100 || fail=1
exit $fail
