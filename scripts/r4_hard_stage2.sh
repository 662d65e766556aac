#!/bin/bash
# Round-4 ablation grids on the HARD synthetic stand-in (VERDICT r3 next#1),
# stage 2: after r4_hard_stage1.sh calibrated confound_max=0.7 on the
# flagship point (nmade_2 == dim9), train + validate the remaining grid
# points. Each point reuses the single hard DCCA artifact, exactly like the
# reference grids reuse one pretrained DCCA (tests/plot_dcca_size_graphs.py,
# dcca/models/mnist_svhn.py:65-95 LCCA-column slicing).
#
# Every TPU invocation is wrapped in retry_tpu: the axon remote backend
# nondeterministically hangs on compile/first-dispatch (docs/BENCH_NOTES.md
# "deserialize hang"; observed again r4 on fresh program shapes) — a
# bounded timeout + retry converts that into a few lost minutes (the
# server-side compile usually lands in the cache, so the retry is fast).
set -x
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1

EXP=${EXP:-/root/exp_r4_hard}

retry_tpu() {
  local attempt
  for attempt in 1 2 3; do
    if timeout "${TPU_STEP_TIMEOUT:-1500}" "$@"; then
      return 0
    fi
    echo "retry_tpu: attempt $attempt failed for: $*" >&2
    sleep 20
  done
  echo "retry_tpu: GIVING UP on: $*" >&2
  return 1
}

fail=0
for cfg in nmade_0 nmade_1 nmade_3 nmade_5 dim2 dim5 dim16; do
  retry_tpu python -u -m mmvae_tpu.cli.train \
    --config-path "configs/mnist_svhn/hard/jnfd_hard_${cfg}.json" \
    --experiments-dir "$EXP" || fail=1
done

for cfg in nmade_0 nmade_1 nmade_3 nmade_5 dim2 dim5 dim16; do
  exp=$(python - "$cfg" <<'PYEOF'
import json, sys
with open(f"configs/mnist_svhn/hard/jnfd_hard_{sys.argv[1]}.json") as f:
    print(json.load(f)["experiment"])
PYEOF
)
  retry_tpu python -u -m mmvae_tpu.cli.validate --model "$exp" \
    --experiments-dir "$EXP" --skip-fid || fail=1
done

python scripts/hard_grid_table.py --experiments-dir "$EXP"
exit $fail
