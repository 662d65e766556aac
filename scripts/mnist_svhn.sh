#!/bin/bash
# Canonical MNIST-SVHN pipeline (mirrors the reference's mnist_svhn.sh):
# DCCA pretrain -> JMVAE-NF-DCCA train -> validate -> likelihoods.
set -e
cd "$(dirname "$0")/.."

# stage 0: DCCA joint-embedding pretraining
python -m mmvae_tpu.cli.dcca_train --dataset mnist_svhn --outdim 16 --epochs 50

# stage 1: train the flagship models
python -m mmvae_tpu.cli.train --config-path configs/mnist_svhn/jmvae_nf_dcca.json
python -m mmvae_tpu.cli.train --config-path configs/mnist_svhn/mmvae.json

# stage 2: evaluation
python -m mmvae_tpu.cli.validate --model jmvae_nf_dcca/mnist_svhn
python -m mmvae_tpu.cli.compute_likelihoods --model jmvae_nf_dcca/mnist_svhn
