#!/bin/bash
# The reference's run.sh smoke recipes: circles-squares end-to-end in
# minutes (run.sh:8,21 — latent_dim 2, 30 epochs). The synthetic builder
# regenerates bin/make-circles-squares.py's dataset in-process.
set -e
cd "$(dirname "$0")/.."

# JMVAE-NF (no recon term, maf flows — configs_experiments/circles/*.json)
python -m mmvae_tpu.cli.train --config-path configs/circles/jmvae_nf.json

# MMVAE (dreg K=10, run.sh:21)
python -m mmvae_tpu.cli.train --config-path configs/circles/mmvae.json
