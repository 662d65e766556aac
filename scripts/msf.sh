#!/bin/bash
# Canonical trimodal MNIST-SVHN-Fashion pipeline (mirrors the reference's
# msf.sh): trimodal mcca DCCA pretrain -> train JMVAE/JMVAE-NF/MVAE/MMVAE ->
# validate (incl. PoE-subset HMC metrics) -> likelihoods.
# Reference timings: DCCA ~50s/epoch x100; train ~1min/epoch x150 (msf.sh:9-24).
set -e
cd "$(dirname "$0")/.."

# stage 0: trimodal DCCA (pairwise mcca loss)
python -m mmvae_tpu.cli.dcca_train --dataset mnist_svhn_fashion --outdim 16 --epochs 100

# stage 1: train
python -m mmvae_tpu.cli.train --config-path configs/msf/jmvae.json
python -m mmvae_tpu.cli.train --config-path configs/msf/jmvae_nf.json
python -m mmvae_tpu.cli.train --config-path configs/msf/jmvae_nf_dcca.json
python -m mmvae_tpu.cli.train --config-path configs/msf/mvae.json
python -m mmvae_tpu.cli.train --config-path configs/msf/mmvae.json

# stage 2: evaluation (validate <=30 min; likelihoods ~2h per model at
# K=1000 in the reference, msf.sh:41-63)
python -m mmvae_tpu.cli.validate --model jmvae_nf/msf
python -m mmvae_tpu.cli.compute_likelihoods --model jmvae_nf/msf
