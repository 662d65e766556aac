#!/bin/bash
# Canonical CelebA pipeline (mirrors the reference's celeba.sh:7-27):
# DCCA pretrain -> train every family -> classifier pretrain happens
# automatically on first validate -> validate -> likelihoods.
set -e
cd "$(dirname "$0")/.."

# stage 0: DCCA joint-embedding pretraining (main_celeba.py, outdim 40)
python -m mmvae_tpu.cli.dcca_train --dataset celeba --outdim 40 --epochs 100

# stage 1: train all families
python -m mmvae_tpu.cli.train --config-path configs/celeba/jmvae_nf_dcca.json
python -m mmvae_tpu.cli.train --config-path configs/celeba/jmvae.json
python -m mmvae_tpu.cli.train --config-path configs/celeba/jmvae_nf.json
python -m mmvae_tpu.cli.train --config-path configs/celeba/mmvae.json
python -m mmvae_tpu.cli.train --config-path configs/celeba/mvae.json

# stage 2: evaluation (classifiers auto-train into the shared pool)
python -m mmvae_tpu.cli.validate --model jmvae_nf_dcca/celeba
python -m mmvae_tpu.cli.validate --model mvae/celeba

# stage 3: likelihoods
python -m mmvae_tpu.cli.compute_likelihoods --model jmvae_nf_dcca/celeba
python -m mmvae_tpu.cli.compute_likelihoods --model mvae/celeba
