#!/bin/bash
# Evaluation-only driver (the reference's run_eval.sh): full-test-set
# validate (5 repeats) + K=1000 likelihoods for the latest run of each
# named experiment. Usage: scripts/run_eval.sh <experiment> [experiment...]
# e.g. scripts/run_eval.sh mmvae/circles jmvae_nf/circles
set -e
cd "$(dirname "$0")/.."

for model in "$@"; do
  python -m mmvae_tpu.cli.validate --model "$model"
  python -m mmvae_tpu.cli.compute_likelihoods --model "$model" --bis
done
