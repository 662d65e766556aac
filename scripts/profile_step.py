"""Capture a jax.profiler trace of a bench step and print the op-level
time breakdown (VERDICT r3 next#2/#5: trace-backed analysis of the JNF
post-warmup step and the bf16 flagship step).

    python -u scripts/profile_step.py flagship_bf16|flagship_f32|jnf [out_dir]

Parses the Chrome trace-event JSON the profiler writes alongside the
xplane (plugins/profile/*/… .trace.json.gz) with stdlib only — the boxed
tensorflow build ships no xplane_pb2 proto module — aggregating event
time per lane (process/thread) and per op name, so the analysis works
headless (no TensorBoard UI).
"""
import collections
import glob
import gzip
import json
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
    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        print("NO trace.json.gz produced — backend did not emit a trace")
        return
    for path in paths:
        with gzip.open(path, "rt") as f:
            events = json.load(f).get("traceEvents", [])
        print(f"\n=== {os.path.relpath(path, out_dir)} ===")
        pnames = {}
        tnames = {}
        for ev in events:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pnames[ev["pid"]] = ev["args"].get("name", str(ev["pid"]))
            if ev.get("ph") == "M" and ev.get("name") == "thread_name":
                tnames[(ev["pid"], ev.get("tid"))] = \
                    ev["args"].get("name", str(ev.get("tid")))
        lanes = collections.Counter()       # (pid,tid) -> busy us
        spans = {}                          # (pid,tid) -> (min_ts, max_ts)
        by_name = collections.Counter()     # device op name -> us
        for ev in events:
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            key = (ev["pid"], ev.get("tid"))
            lanes[key] += ev["dur"]
            lo, hi = spans.get(key, (float("inf"), 0.0))
            spans[key] = (min(lo, ev["ts"]), max(hi, ev["ts"] + ev["dur"]))
            lane = (pnames.get(ev["pid"], "") + "/" +
                    tnames.get(key, "")).lower()
            # accumulate op durations on device lanes only (TPU/XLA ops);
            # host lanes carry python/runtime frames that are not op time,
            # and the "Steps" marker lane spans idle gaps, not op time
            if ("steps" not in lane
                    and ("tpu" in lane or "device" in lane or "xla" in lane)):
                by_name[ev.get("name", "?")] += ev["dur"]
        print("-- lanes by busy time (span = last_end - first_start):")
        for key, busy in lanes.most_common(12):
            lo, hi = spans[key]
            nm = (f"{pnames.get(key[0], key[0])}/"
                  f"{tnames.get(key, key[1])}")
            print(f"   {nm[:58]:58s} busy {busy/1e3:9.3f} ms"
                  f"  span {(hi - lo)/1e3:9.3f} ms"
                  f"  occ {100.0 * busy / max(hi - lo, 1e-9):5.1f}%")
        if by_name:
            print("   top device ops by accumulated duration:")
            for name, us in by_name.most_common(top):
                print(f"     {us/1e3:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "jnf"
    out_dir = (sys.argv[2] if len(sys.argv) > 2
               else f"/tmp/mmvae_trace_{which}")
    run_traced(which, out_dir)
    analyze(out_dir)
