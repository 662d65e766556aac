"""Profile-driven perf probe for VERDICT r3 item 3.

Measures, on the real TPU:
1. JNF post-warmup step time vs batch size (dispatch-bound vs compute-bound:
   if step time is flat in B, the 2.4 ms is per-dispatch overhead, not math)
2. component ablation of the JNF step (joint encoder / decoders / unimodal
   encoders / MAF density passes), each as its own jitted function
3. flagship bf16 at B in {128, 256}

Writes scripts/perf_probe_results.json. Run with
  python -u scripts/perf_probe.py > /tmp/perf_probe.log 2>&1
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, args, label, iters=100, warmup=3, trials=3):
    import jax

    t0 = time.time()
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    per = []
    for _ in range(trials):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        per.append((time.time() - t0) / iters)
    ms = sorted(per)[1] * 1000
    print(f"[{label}] {ms:.3f} ms (compile {compile_s:.1f}s)", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from mmvae_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    from mmvae_tpu.core import precision
    from mmvae_tpu.models import registry
    from mmvae_tpu.train import Trainer

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from bench import flagship_cfg, jnf_cfg

    results = {"devices": str(jax.devices())}

    # ---- 1. JNF step vs batch size --------------------------------------
    for B in (128, 256, 512, 1024):
        cfg = jnf_cfg()
        cfg.batch_size = B
        bundle = registry.build(cfg)
        trainer = Trainer(bundle.model, bundle.spec, cfg)
        key = jax.random.PRNGKey(0)
        xs = [jnp.zeros((B,) + s, jnp.float32) for s in bundle.shape_mods]
        variables = trainer.init_variables(xs, key)
        opt_state = trainer.init_opt_state(variables, past_warmup=True)
        step = trainer.train_step(past_warmup=True)

        def run(v, o):
            v, o, loss, _ = step(v, o, xs, key, jnp.float32(1e-3),
                                 jnp.float32(1.0), jnp.float32(1.0))
            return loss

        # non-donated wrapper would break donation; call step directly
        t0 = time.time()
        v, o = variables, opt_state
        for _ in range(3):
            v, o, loss, _ = step(v, o, xs, key, jnp.float32(1e-3),
                                 jnp.float32(1.0), jnp.float32(1.0))
        float(loss)
        compile_s = time.time() - t0
        per = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(50):
                v, o, loss, _ = step(v, o, xs, key, jnp.float32(1e-3),
                                     jnp.float32(1.0), jnp.float32(1.0))
            float(jax.device_get(loss))
            per.append((time.time() - t0) / 50)
        ms = sorted(per)[1] * 1000
        print(f"[jnf-B{B}] {ms:.3f} ms/step ({B / ms * 1000:.0f} sps; "
              f"compile {compile_s:.1f}s)", flush=True)
        results[f"jnf_step_ms_B{B}"] = round(ms, 3)

    # ---- 2. component ablation at B=128 ----------------------------------
    B = 128
    cfg = jnf_cfg()
    cfg.batch_size = B
    bundle = registry.build(cfg)
    model = bundle.model
    trainer = Trainer(model, bundle.spec, cfg)
    key = jax.random.PRNGKey(0)
    xs = [jnp.zeros((B,) + s, jnp.float32) for s in bundle.shape_mods]
    variables = trainer.init_variables(xs, key)

    @jax.jit
    def joint_enc(v, xs):
        return model.apply(v, xs, method="encode_joint")

    @jax.jit
    def full_fwd(v, xs, k):
        return model.apply(v, xs, K=1, rngs={"sample": k})

    @jax.jit
    def kld_pass(v, xs, k):
        return model.apply(v, xs, method="compute_kld", rngs={"sample": k},
                           train=False)

    z = jnp.zeros((B, cfg.latent_dim), jnp.float32)

    @jax.jit
    def decoders(v, z):
        return model.apply(v, z, method="decode_all")

    for label, fn, args in [
        ("joint_encoder", joint_enc, (variables, xs)),
        ("decoders", decoders, (variables, z)),
        ("full_forward", full_fwd, (variables, xs, key)),
        ("kld_flow_pass", kld_pass, (variables, xs, key)),
    ]:
        try:
            results[f"jnf_comp_{label}_ms"] = round(
                timeit(fn, args, f"jnf/{label}"), 3)
        except Exception as e:
            print(f"[jnf/{label}] failed: {e}", flush=True)

    # empty-dispatch floor: how much is per-call overhead on this backend
    @jax.jit
    def tiny(a):
        return a + 1.0

    results["dispatch_floor_ms"] = round(
        timeit(tiny, (jnp.zeros((8, 128)),), "dispatch_floor"), 3)

    # ---- 3. flagship bf16 at B=128/256 -----------------------------------
    for B in (128, 256):
        cfg = flagship_cfg()
        cfg.batch_size = B
        cfg.extra["compute_dtype"] = "bfloat16"
        bundle = registry.build(cfg)
        trainer = Trainer(bundle.model, bundle.spec, cfg)
        xs = [jnp.zeros((B,) + s, jnp.float32) for s in bundle.shape_mods]
        variables = trainer.init_variables(xs, jax.random.PRNGKey(0))
        opt_state = trainer.init_opt_state(variables, past_warmup=True)
        step = trainer.train_step(past_warmup=True)
        v, o = variables, opt_state
        t0 = time.time()
        for _ in range(3):
            v, o, loss, _ = step(v, o, xs, key, jnp.float32(1e-3),
                                 jnp.float32(1.0), jnp.float32(1.0))
        float(loss)
        compile_s = time.time() - t0
        flops = None
        try:
            compiled = step.lower(v, o, xs, key, jnp.float32(1e-3),
                                  jnp.float32(1.0), jnp.float32(1.0)).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass
        per = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(50):
                v, o, loss, _ = step(v, o, xs, key, jnp.float32(1e-3),
                                     jnp.float32(1.0), jnp.float32(1.0))
            float(jax.device_get(loss))
            per.append((time.time() - t0) / 50)
        ms = sorted(per)[1] * 1000
        mfu = flops / (ms / 1000) / 197e12 if flops else None
        print(f"[flagship-bf16-B{B}] {ms:.3f} ms/step "
              f"({B / ms * 1000:.0f} sps, MFU={mfu and round(mfu, 4)}; "
              f"compile {compile_s:.1f}s)", flush=True)
        results[f"flagship_bf16_B{B}"] = {
            "step_ms": round(ms, 3), "sps": round(B / ms * 1000, 1),
            "mfu": mfu and round(mfu, 4)}

    out = os.path.join(os.path.dirname(__file__), "perf_probe_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
