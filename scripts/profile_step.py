"""Capture a jax.profiler trace of a bench step and print the op-level
time breakdown (VERDICT r3 next#2/#5: trace-backed analysis of the JNF
post-warmup step and the bf16 flagship step).

    python -u scripts/profile_step.py flagship_bf16|flagship_f32|jnf [out_dir]

Parses the XSpace protobuf directly (tensorflow.core.profiler.protobuf),
aggregating event self-time per line (thread/stream) and per HLO-op
category, so the analysis works headless (no TensorBoard UI).
"""
import collections
import glob
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_step(which):
    import bench
    from mmvae_tpu.models import registry
    from mmvae_tpu.train import Trainer

    if which == "jnf":
        cfg = bench.jnf_cfg()
    else:
        cfg = bench.flagship_cfg()
        if which == "flagship_bf16":
            cfg.extra["compute_dtype"] = "bfloat16"
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
    rows_dev = jnp.asarray(np.stack([next(it) for _ in range(64)]))
    return step, (variables, opt_state, pipeline.data_state, rows_dev,
                  jnp.int32(0), key, jnp.float32(1e-3), jnp.float32(1.0),
                  jnp.float32(1.0))


def run_traced(which, out_dir, n_steps=30):
    from mmvae_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    step, args = build_step(which)
    variables, opt_state, data_state, rows_dev, counter, key, lr, one, _ = args
    # compile + warm
    for _ in range(5):
        variables, opt_state, counter, loss, _ = step(
            variables, opt_state, data_state, rows_dev, counter, key, lr,
            one, one)
    float(jax.device_get(loss))
    t0 = time.time()
    with jax.profiler.trace(out_dir):
        for _ in range(n_steps):
            variables, opt_state, counter, loss, _ = step(
                variables, opt_state, data_state, rows_dev, counter, key,
                lr, one, one)
        float(jax.device_get(loss))
    dt = time.time() - t0
    print(f"[{which}] traced {n_steps} steps in {dt:.2f}s "
          f"({1000*dt/n_steps:.3f} ms/step incl. trace overhead)")
    return dt / n_steps


def analyze(out_dir, top=25):
    from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print("NO xplane.pb produced — backend did not emit a trace")
        return
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        print(f"\n=== {os.path.relpath(path, out_dir)} ===")
        for plane in xspace.planes:
            evmeta = {m.id: m.name for m in plane.event_metadata.values()}
            total_by_line = {}
            by_name = collections.Counter()
            for line in plane.lines:
                tot = 0
                for ev in line.events:
                    tot += ev.duration_ps
                    by_name[evmeta.get(ev.metadata_id, "?")] += ev.duration_ps
                total_by_line[line.name or str(line.id)] = tot
            if not any(total_by_line.values()):
                continue
            print(f"-- plane: {plane.name}")
            for ln, tot in sorted(total_by_line.items(),
                                  key=lambda kv: -kv[1])[:8]:
                print(f"   line {ln:40s} {tot/1e9:10.3f} ms total")
            print("   top events by accumulated duration:")
            for name, ps in by_name.most_common(top):
                print(f"     {ps/1e9:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "jnf"
    out_dir = (sys.argv[2] if len(sys.argv) > 2
               else f"/tmp/mmvae_trace_{which}")
    run_traced(which, out_dir)
    analyze(out_dir)
