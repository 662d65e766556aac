#!/bin/bash
# Round-5 cross-model table on the CALIBRATED hard stand-in (VERDICT r4
# missing#3): the 7-family comparison — MMVAE, MVAE, MoE-PoE (beta=20 and
# beta=1), MMVAE-NF, TELBO-NF (this script) + JNF-DCCA (the r4 hard
# flagship row, docs/QUALITY.md) — each with its reference-corpus recipe,
# all against difficulty=0.55 / confound_max=0.7 data where the supervised
# ceilings are 0.845/0.958, so the families can RANK.
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
for cfg in mmvae mvae moepoe moepoe_b1 mmvae_nf telbo; do
  retry_tpu python -u -m mmvae_tpu.cli.train \
    --config-path "configs/mnist_svhn/hard_xm/${cfg}_hard.json" \
    --experiments-dir "$EXP" || fail=1
done

for exp in mmvae/mnist_svhn_hard mvae/mnist_svhn_hard moepoe/mnist_svhn_hard \
           moepoe/mnist_svhn_b1_hard mmvae_nf/mnist_svhn_hard \
           telbo/mnist_svhn_hard; do
  retry_tpu python -u -m mmvae_tpu.cli.validate --model "$exp" \
    --experiments-dir "$EXP" --skip-fid || fail=1
done
exit $fail
