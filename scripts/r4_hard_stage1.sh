#!/bin/bash
# Round-4 ablation-grid calibration (VERDICT r3 next#1): pretrain the DCCA
# trunks on the HARD synthetic MNIST-SVHN stand-in (difficulty=0.55,
# confound_max=0.7 — calibrated via scripts/calibrate_confound.py, table in
# docs/QUALITY.md), train the flagship grid point (nmade_2 == dim9), and
# validate. The coherence readout decides whether confound_max=0.7 lands in
# the reference's real-data regime (~0.8 cross coherence,
# tests/ablation_n_made.py:8-13).
set -ex
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1

EXP=${EXP:-/root/exp_r4_hard}
CMAX=${CMAX:-0.7}

# DCCA on the TPU (Cholesky-whitening CCA loss, f32): the CPU float64 eigh
# path is ~2.5 min/epoch on this 1-core host; the chol backend is
# parity-tested against the eigh oracle (tests) and runs the epoch jitted
# on-device.
python -u -m mmvae_tpu.cli.dcca_train --dataset mnist_svhn --synthetic-n 20000 \
  --difficulty 0.55 --confound-max "$CMAX" \
  --out /root/experiments/dcca_hard_r4 --epochs 20 \
  --platform "" --backend chol

python -u -m mmvae_tpu.cli.train \
  --config-path configs/mnist_svhn/hard/jnfd_hard_nmade_2.json \
  --experiments-dir "$EXP"

python -u -m mmvae_tpu.cli.validate --model jmvae_nf_dcca/mnist_svhn_hard \
  --experiments-dir "$EXP" --skip-fid
