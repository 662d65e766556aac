#!/bin/bash
# Round-5 off-manifold asymmetry study (VERDICT r4 weak#2 / next#5):
# 1) recon-likelihood ablation: retrain the hard flagship with the
#    mnist-side likelihood switched to bernoulli / laplace, score each
#    with classifier-FID/PRD (validate --fid-encoder classifier --prd).
# 2) supervised oracle: L2-trained svhn->mnist regressor scored with the
#    same protocol (r5_asymmetry_oracle.py) -- the inherent-to-data arm.
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
retry_tpu python -u scripts/r5_asymmetry_oracle.py || fail=1

for tag in bern lap; do
  retry_tpu python -u -m mmvae_tpu.cli.train \
    --config-path "configs/mnist_svhn/hard/jnfd_hard_${tag}.json" \
    --experiments-dir "$EXP" || fail=1
  retry_tpu python -u -m mmvae_tpu.cli.validate \
    --model "jmvae_nf_dcca_${tag}/mnist_svhn_hard" --experiments-dir "$EXP" \
    --repeats 2 --fid-encoder classifier --prd || fail=1
done

# PRD-curve figures for the r4 hard flagship itself (VERDICT r4 weak#4
# done-criterion: curves in the run dir)
retry_tpu python -u -m mmvae_tpu.cli.validate \
  --model jmvae_nf_dcca/mnist_svhn_hard --experiments-dir /root/exp_r4_hard \
  --repeats 2 --fid-encoder classifier --prd || fail=1
exit $fail
