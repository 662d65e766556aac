#!/bin/bash
# Round-5 sequential TPU chain (single chip; stages serialized). Run after
# r5_fold_grid.sh. Each stage logs to /tmp/r5_<stage>.log.
set -x
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
export EXP=/root/exp_r5_hard2

bash scripts/r5_crossmodel_hard.sh  > /tmp/r5_crossmodel.log 2>&1
bash scripts/r5_msf_dcca.sh         > /tmp/r5_msf_dcca.log 2>&1
bash scripts/r5_sbound_medmnist.sh  > /tmp/r5_sbound.log 2>&1
bash scripts/r5_ll_timing.sh        > /tmp/r5_ll_timing.log 2>&1
bash scripts/r5_asymmetry.sh        > /tmp/r5_asymmetry.log 2>&1
echo "r5_chain: done"
