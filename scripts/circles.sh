#!/bin/bash
# CPU-runnable smoke pipeline on the synthetic circles-squares dataset
# (the reference's run.sh smoke config).
set -e
cd "$(dirname "$0")/.."
python -m mmvae_tpu.cli.train --config-path configs/circles/mmvae.json
python -m mmvae_tpu.cli.train --config-path configs/circles/jmvae_nf.json
python -m mmvae_tpu.cli.validate --model mmvae/circles --skip-fid
