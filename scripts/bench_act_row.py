"""Measure the activation-bf16 flagship row + its compiled byte counts.

The round-4 roofline (docs/BENCH_NOTES.md) predicts the opt-in
`"activation_dtype": "bfloat16"` policy roughly halves the flagship
step's HBM byte floor; this script measures the row AND dumps the
compiled program's cost-analysis byte totals for the f32-act vs bf16-act
variants so the byte reduction is recorded, not assumed.

    python -u scripts/bench_act_row.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def cost_summary(cfg):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmvae_tpu.models import registry
    from mmvae_tpu.train import Trainer

    bundle = registry.build(cfg)
    trainer = Trainer(bundle.model, bundle.spec, cfg)
    batch = cfg.batch_size
    pipeline = bench._make_pipeline(bundle.shape_mods, 8192, 4 * 8192, batch)
    key = jax.random.PRNGKey(0)
    xs0 = [np.zeros((batch,) + s, np.float32) for s in bundle.shape_mods]
    variables = trainer.init_variables(xs0, key)
    opt_state = trainer.init_opt_state(variables, past_warmup=True)
    step = trainer.device_counter_step(past_warmup=True, pipeline=pipeline)
    it = pipeline.epoch_index_batches()
    rows_dev = jnp.asarray(np.stack([next(it) for _ in range(8)]))
    args = (variables, opt_state, pipeline.data_state, rows_dev,
            jnp.int32(0), key, jnp.float32(1e-3), jnp.float32(1.0),
            jnp.float32(1.0))
    ca = step.lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return {"flops": float(ca.get("flops", 0.0)),
            "bytes_total": float(ca.get("bytes accessed", 0.0)),
            "bytes_out": float(ca.get("bytes accessedout{}", 0.0))}


def main():
    from mmvae_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()

    base = bench.flagship_cfg()
    base.extra["compute_dtype"] = "bfloat16"
    act = bench.flagship_cfg()
    act.extra["compute_dtype"] = "bfloat16"
    act.extra["activation_dtype"] = "bfloat16"

    out = {"bf16_cost": cost_summary(base), "bf16act_cost": cost_summary(act)}
    print(json.dumps(out, indent=2), flush=True)

    row = bench.measure_tpu(act, "mmvae-dreg-K30-bf16act")
    out["bf16act_row"] = row
    # comparison row under identical tunnel conditions
    out["bf16_row"] = bench.measure_tpu(base, "mmvae-dreg-K30-bf16")
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
