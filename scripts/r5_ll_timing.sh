#!/bin/bash
# Round-5 likelihood-protocol wall-clock (VERDICT r4 weak#3 done-criterion):
# train the flagship MMVAE (mmvae_synth, ~2.5 min chunked), then run the
# full K=1000 5-repeat --bis protocol under the scan-chunked dispatch
# (--steps-per-dispatch 16, the new default) and record wall-clock.
# r4 per-batch baseline: 24.5 min (docs/QUALITY.md).
set -x
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
EXP=${EXP:-/root/exp_r5_hard2}

retry_tpu() {
  local attempt
  for attempt in 1 2 3; do
    if timeout "${TPU_STEP_TIMEOUT:-3600}" "$@"; then return 0; fi
    echo "retry_tpu: attempt $attempt failed for: $*" >&2
    sleep 20
  done
  echo "retry_tpu: GIVING UP on: $*" >&2
  return 1
}

fail=0
retry_tpu python -u -m mmvae_tpu.cli.train \
  --config-path configs/mnist_svhn/mmvae_synth.json --experiments-dir "$EXP" || fail=1
start=$(date +%s)
retry_tpu python -u -m mmvae_tpu.cli.compute_likelihoods \
  --model mmvae/mnist_svhn_synth --experiments-dir "$EXP" --bis || fail=1
echo "LL_PROTOCOL_WALL_SECONDS=$(( $(date +%s) - start ))"
exit $fail
