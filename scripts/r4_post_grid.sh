#!/bin/bash
# Round-4 demonstration chain after the hard grids (VERDICT r3 next#2-#6):
#  1. PRD + classifier-featurized FID on the trained hard flagship (#4)
#  2. bench.py --all — JNF fast-path measurement + scan row (#2) and the
#     bf16/f32 flagship rows (#5); regenerates bench_details.json
#  3. profiler traces of the JNF post-warmup and bf16 flagship steps (#2,#5)
#  4. trimodal MSF retrain + validate at --mcmc-steps 100 + chain-length
#     convergence sweep (#3)
#  5. bf16 flagship quality run: train + validate (#6)
set -x
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1

HARD_EXP=${HARD_EXP:-/root/exp_r4_hard}
EXP=${EXP:-/root/experiments}

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

# 1. PRD + classifier-FID on the hard flagship (validate writes metrics.json
#    into the run dir; repeats=2 keeps it ~10 min — the coherence numbers
#    are already pinned by the skip-fid 5-repeat run)
retry_tpu python -u -m mmvae_tpu.cli.validate \
  --model jmvae_nf_dcca/mnist_svhn_hard --experiments-dir "$HARD_EXP" \
  --repeats 2 --prd --fid-encoder classifier \
  > /tmp/r4_prd_validate.log 2>&1

# 2. full bench grid
retry_tpu python -u bench.py --all > /tmp/r4_bench.json 2>/tmp/r4_bench.log

# 3. profiler traces
retry_tpu python -u scripts/profile_step.py jnf /tmp/mmvae_trace_jnf \
  > /tmp/r4_trace_jnf.log 2>&1
retry_tpu python -u scripts/profile_step.py flagship_bf16 \
  /tmp/mmvae_trace_flagship > /tmp/r4_trace_flagship.log 2>&1

# 4. trimodal MSF quality retrain (150 epochs ~18 min) + reference-fidelity
#    HMC validate + convergence sweep
retry_tpu python -u -m mmvae_tpu.cli.train \
  --config-path configs/msf/jnf_synth.json --experiments-dir "$EXP" \
  > /tmp/r4_msf_train.log 2>&1
retry_tpu python -u -m mmvae_tpu.cli.validate --model jmvae_nf/msf_synth \
  --experiments-dir "$EXP" --skip-fid --mcmc-steps 100 \
  > /tmp/r4_msf_validate.log 2>&1
retry_tpu python -u scripts/hmc_convergence.py --model jmvae_nf/msf_synth \
  --experiments-dir "$EXP" > /tmp/r4_hmc_convergence.log 2>&1

# 5. bf16 flagship quality run (40 epochs ~22 min) + validate
retry_tpu python -u -m mmvae_tpu.cli.train \
  --config-path configs/mnist_svhn/mmvae_synth_bf16.json \
  --experiments-dir "$EXP" > /tmp/r4_bf16_train.log 2>&1
retry_tpu python -u -m mmvae_tpu.cli.validate \
  --model mmvae/mnist_svhn_synth_bf16 --experiments-dir "$EXP" --skip-fid \
  > /tmp/r4_bf16_validate.log 2>&1

echo "r4_post_grid: done"
