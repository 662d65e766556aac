#!/bin/bash
# Round-4 manual tail (replaces r4_post_grid.sh steps 4-5 after its 2400s
# timeout proved too short for the 150-epoch MSF train at degraded-tunnel
# epoch times — the retry wrapper was restarting the train from scratch in
# an endless treadmill):
#   0. activation-bf16 flagship row + byte counts (roofline follow-up)
#   1. trimodal MSF retrain (timeout 5400) + validate --mcmc-steps 100
#      + HMC chain-length convergence sweep
#   2. bf16 flagship quality train + validate
#   3. driver-mode bench.py (exercises the new watchdog wrapper on-chip)
set -x
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1

EXP=${EXP:-/root/experiments}

retry_tpu() {
  local tmo=$1; shift
  local attempt
  for attempt in 1 2 3; do
    if timeout "$tmo" "$@"; then
      return 0
    fi
    echo "retry_tpu: attempt $attempt failed for: $*" >&2
    sleep 20
  done
  echo "retry_tpu: GIVING UP on: $*" >&2
  return 1
}

retry_tpu 2400 python -u scripts/bench_act_row.py \
  > /tmp/r4_act_row.log 2>&1

retry_tpu 5400 python -u -m mmvae_tpu.cli.train \
  --config-path configs/msf/jnf_synth.json --experiments-dir "$EXP" \
  > /tmp/r4_msf_train.log 2>&1
retry_tpu 2400 python -u -m mmvae_tpu.cli.validate --model jmvae_nf/msf_synth \
  --experiments-dir "$EXP" --skip-fid --mcmc-steps 100 \
  > /tmp/r4_msf_validate.log 2>&1
retry_tpu 2400 python -u scripts/hmc_convergence.py --model jmvae_nf/msf_synth \
  --experiments-dir "$EXP" > /tmp/r4_hmc_convergence.log 2>&1

retry_tpu 5400 python -u -m mmvae_tpu.cli.train \
  --config-path configs/mnist_svhn/mmvae_synth_bf16.json \
  --experiments-dir "$EXP" > /tmp/r4_bf16_train.log 2>&1
retry_tpu 2400 python -u -m mmvae_tpu.cli.validate \
  --model mmvae/mnist_svhn_synth_bf16 --experiments-dir "$EXP" --skip-fid \
  > /tmp/r4_bf16_validate.log 2>&1

# bench.py's internal watchdog already retries (up to ~3*2500s with the
# escalating timeouts); skip it under the outer wrapper so the two retry
# layers don't multiply (ADVICE r4) — one attempt, generous outer bound
retry_tpu 9000 env MMVAE_BENCH_CHILD=1 python -u bench.py > /tmp/r4_driver_bench.log 2>&1

echo "r4_manual_tail: done"
