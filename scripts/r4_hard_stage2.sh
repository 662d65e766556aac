#!/bin/bash
# Round-4 ablation grids on the HARD synthetic stand-in (VERDICT r3 next#1),
# stage 2: after r4_hard_stage1.sh calibrated confound_max=0.7 on the
# flagship point (nmade_2 == dim9), train + validate the remaining 8 grid
# points. Each point reuses the single hard DCCA artifact, exactly like the
# reference grids reuse one pretrained DCCA (tests/plot_dcca_size_graphs.py,
# dcca/models/mnist_svhn.py:65-95 LCCA-column slicing).
set -ex
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1

EXP=${EXP:-/root/exp_r4_hard}

for cfg in nmade_0 nmade_1 nmade_3 nmade_5 dim2 dim5 dim16; do
  python -u -m mmvae_tpu.cli.train \
    --config-path "configs/mnist_svhn/hard/jnfd_hard_${cfg}.json" \
    --experiments-dir "$EXP"
done

for cfg in nmade_0 nmade_1 nmade_3 nmade_5 dim2 dim5 dim16; do
  exp=$(python - "$cfg" <<'PYEOF'
import json, sys
with open(f"configs/mnist_svhn/hard/jnfd_hard_{sys.argv[1]}.json") as f:
    print(json.load(f)["experiment"])
PYEOF
)
  python -u -m mmvae_tpu.cli.validate --model "$exp" \
    --experiments-dir "$EXP" --skip-fid
done
