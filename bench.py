"""Benchmark: paired samples/sec/chip, FLOPs/step, and MFU.

Default (driver mode) measures the BASELINE flagship config — MNIST-SVHN
MMVAE, Laplace MoE posteriors, DReG-looser K=30, batch 128
(configs_experiments/mnist_svhn/mmvae.json) — and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "flops_per_step": F, "mfu": M}

`python bench.py --all` additionally measures the paper's actual model —
JMVAE-NF post-warmup (joint encoder + MAF-flow KLD path) — and a full
measured MSF epoch (vs the reference's ~60-75s/epoch GPU timings,
msf.sh:9-24), writing every row to bench_details.json and still printing
the single flagship JSON line last.

vs_baseline compares against the reference-style PyTorch implementation of
the same model + objective running on this host's CPU (the reference has no
recorded throughput numbers — BASELINE.md — so the north-star comparison is
>=10x over CPU torch). The torch baseline is measured once and cached in
.bench_baseline.json.

MFU denominator: TPU v5e peak 197e12 bf16 FLOP/s. The train step is mostly
f32 (the MXU runs f32 matmuls at reduced rate), so MFU here is a
conservative "fraction of the chip's bf16 ceiling" figure.
"""

import json
import os
import sys
import time

BATCH = 128
K = 30
LATENT = 20
BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")
V5E_PEAK_FLOPS = 197e12  # bf16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# JAX/TPU measurement
# ---------------------------------------------------------------------------

def _make_pipeline(shapes, n_base, n_pairs, batch):
    import numpy as np

    from mmvae_tpu.data.device_pipeline import DeviceDataPipeline

    rng = np.random.default_rng(0)
    base = [(rng.uniform(size=(n_base,) + s) * 255).astype(np.uint8)
            for s in shapes]
    pair_idx = [rng.integers(0, n_base, n_pairs).astype(np.int32)
                for _ in shapes]
    return DeviceDataPipeline(base, pair_idx, batch, shuffle=True)


def measure_tpu(cfg, label, steps: int = 100, warmup: int = 3,
                n_base: int = 8192, n_pairs: int = None,
                past_warmup: bool = True) -> dict:
    """End-to-end train-step throughput WITH the fused on-device input
    pipeline (data/device_pipeline.py): per step the host ships only a (B,)
    int32 index batch. Returns {sps, flops_per_step, mfu, step_ms}."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmvae_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()

    from mmvae_tpu.models import registry
    from mmvae_tpu.train import Trainer

    bundle = registry.build(cfg)
    trainer = Trainer(bundle.model, bundle.spec, cfg)
    batch = cfg.batch_size
    pipeline = _make_pipeline(bundle.shape_mods, n_base,
                              n_pairs or 4 * n_base, batch)

    key = jax.random.PRNGKey(0)
    xs0 = [np.zeros((batch,) + s, np.float32) for s in bundle.shape_mods]
    variables = trainer.init_variables(xs0, key)
    opt_state = trainer.init_opt_state(variables, past_warmup=past_warmup)
    # device-counter step: identical program every dispatch, all-on-device
    # args -> host enqueues asynchronously with zero per-step transfers
    step = trainer.device_counter_step(past_warmup=past_warmup,
                                       pipeline=pipeline)

    lr = jnp.float32(1e-3)
    one = jnp.float32(1.0)
    it = pipeline.epoch_index_batches()
    n_staged = min(warmup + steps, len(pipeline))
    rows_dev = jnp.asarray(np.stack([next(it) for _ in range(n_staged)]))
    counter = jnp.int32(0)
    data_state = pipeline.data_state
    args = (variables, opt_state, data_state, rows_dev, counter, key, lr,
            one, one)

    # FLOPs from the compiled program (jax cost analysis)
    flops = None
    try:
        compiled = step.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:  # cost_analysis can be backend-dependent
        log(f"[{label}] cost_analysis unavailable: {e}")

    t0 = time.time()
    for _ in range(warmup):
        variables, opt_state, counter, loss, _ = step(
            variables, opt_state, data_state, rows_dev, counter, key, lr,
            one, one)
    float(jax.device_get(loss))
    log(f"[{label}] compile+warmup: {time.time() - t0:.1f}s")

    # median of 3 trials; the final device_get forces a host fetch of the
    # chain-dependent loss, so a relay that acks block_until_ready early
    # (observed: impossible 0.39ms/step readings) cannot fake the timing
    n_meas = min(steps, n_staged - warmup)
    per_step = []
    for _ in range(3):
        counter = jnp.int32(warmup)
        t0 = time.time()
        for _ in range(n_meas):
            variables, opt_state, counter, loss, _ = step(
                variables, opt_state, data_state, rows_dev, counter, key, lr,
                one, one)
        float(jax.device_get(loss))
        per_step.append((time.time() - t0) / n_meas)
    dt = sorted(per_step)[1] * n_meas
    sps = batch * n_meas / dt
    row = {
        "label": label,
        "sps": round(sps, 1),
        "step_ms": round(1000 * dt / n_meas, 3),
        "flops_per_step": flops,
        "mfu": round(flops * (n_meas / dt) / V5E_PEAK_FLOPS, 4) if flops else None,
    }
    log(f"[{label}] {n_meas} steps in {dt:.2f}s -> {sps:.1f} paired samples/s"
        f" | {row['step_ms']}ms/step | flops/step={flops and f'{flops:.3e}'}"
        f" | MFU={row['mfu']} (devices {jax.devices()})")
    return row


def measure_tpu_scan(cfg, label, n_scan: int = 16, chunks: int = 8,
                     past_warmup: bool = True) -> dict:
    """Per-step time with Trainer.device_multi_step: lax.scan over n_scan
    steps per dispatch. The delta vs measure_tpu's one-dispatch-per-step
    row separates host/tunnel dispatch overhead from device compute — the
    'dispatch-bound or not' proof for the small-step models (JNF/MSF,
    VERDICT r3 next#2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmvae_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()

    from mmvae_tpu.models import registry
    from mmvae_tpu.train import Trainer

    bundle = registry.build(cfg)
    trainer = Trainer(bundle.model, bundle.spec, cfg)
    batch = cfg.batch_size
    pipeline = _make_pipeline(bundle.shape_mods, 8192, 4 * 8192, batch)
    key = jax.random.PRNGKey(0)
    xs0 = [np.zeros((batch,) + s, np.float32) for s in bundle.shape_mods]
    variables = trainer.init_variables(xs0, key)
    opt_state = trainer.init_opt_state(variables, past_warmup=past_warmup)
    step = trainer.device_multi_step(past_warmup=past_warmup,
                                     pipeline=pipeline, n_steps=n_scan)
    it = pipeline.epoch_index_batches()
    rows = jnp.asarray(np.stack(
        [next(it) for _ in range(n_scan)]))
    lr, one = jnp.float32(1e-3), jnp.float32(1.0)
    data_state = pipeline.data_state
    # FLOPs accounting for the scan rows (VERDICT r4 weak#5). XLA's
    # cost_analysis counts a while-loop BODY once regardless of trip
    # count (verified here: the scanned executable reports ~1x the
    # per-dispatch row's flops, not n_scan x), so the reported total IS
    # the per-step figure — no division.
    flops = None
    try:
        compiled = step.lower(variables, opt_state, data_state, rows, key,
                              lr, one, one).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:  # cost_analysis can be backend-dependent
        log(f"[{label}] cost_analysis unavailable: {e}")
    # compile + warm
    variables, opt_state, loss, _ = step(
        variables, opt_state, data_state, rows, key, lr, one, one)
    float(jax.device_get(loss))
    per_chunk = []
    for _ in range(3):
        t0 = time.time()
        for c in range(chunks):
            variables, opt_state, loss, _ = step(
                variables, opt_state, data_state, rows,
                jax.random.fold_in(key, c), lr, one, one)
        float(jax.device_get(loss))
        per_chunk.append((time.time() - t0) / chunks)
    dt_step = sorted(per_chunk)[1] / n_scan
    row = {"label": label, "sps": round(batch / dt_step, 1),
           "step_ms": round(1000 * dt_step, 3), "n_scan": n_scan,
           "flops_per_step": flops,
           "mfu": (round(flops / dt_step / V5E_PEAK_FLOPS, 4)
                   if flops else None)}
    log(f"[{label}] scan{n_scan}: {row['step_ms']}ms/step -> "
        f"{row['sps']} paired samples/s")
    return row


def flagship_cfg():
    from mmvae_tpu.core.config import ExperimentConfig

    return ExperimentConfig(
        model="mnist_svhn", obj="dreg", looser=True, K=K, dist="laplace",
        recon_losses=("normal", "normal"), latent_dim=LATENT,
        batch_size=BATCH, learning_rate=1e-3, warmup=0,
    )


def jnf_cfg():
    """The paper's model: JMVAE-NF post-warmup (joint encoder + MAF-flow
    KLD path, n_made_blocks=2, no_recon as in the published configs)."""
    from mmvae_tpu.core.config import ExperimentConfig

    return ExperimentConfig(
        model="jnf_mnist_svhn_dcca", obj="jmvae_nf", K=1, dist="normal",
        recon_losses=("normal", "normal"), latent_dim=LATENT,
        batch_size=BATCH, learning_rate=1e-3, warmup=0, no_nf=False,
        flow="maf", no_recon=True, dcca=False,
    )


def msf_cfg():
    from mmvae_tpu.core.config import ExperimentConfig

    return ExperimentConfig(
        model="jnf_msf", obj="jmvae_nf", K=1, dist="normal",
        recon_losses=("normal", "normal", "normal"), latent_dim=LATENT,
        batch_size=128, learning_rate=1e-3, warmup=0, no_nf=False,
        flow="maf", no_recon=True,
    )


def measure_msf_epoch() -> dict:
    """An actually-measured trimodal MSF epoch at reference scale (~100k
    paired triples; the reference logs ~60s/epoch JMVAE-NF on GPU,
    msf.sh:9-24)."""
    n_pairs = 100_000
    steps = n_pairs // 128
    row = measure_tpu(msf_cfg(), "msf-jnf-epoch", steps=steps, warmup=3,
                      n_base=10000, n_pairs=n_pairs)
    row["epoch_s"] = round(row["step_ms"] * steps / 1000, 1)
    row["n_pairs"] = n_pairs
    row["reference_gpu_epoch_s"] = 60.0
    return row


def measure_msf_epoch_chunked() -> dict:
    """The same MSF epoch under the PRODUCTION dispatch recipe — lax.scan
    chunks of 16 steps (train/loop.py steps_per_dispatch default; the
    per-dispatch row above keeps the dispatch-latency-exposed variant for
    the dispatch-bound comparison, docs/BENCH_NOTES.md round-4)."""
    n_pairs = 100_000
    steps = n_pairs // 128
    row = measure_tpu_scan(msf_cfg(), "msf-jnf-epoch-chunked16", n_scan=16,
                           chunks=steps // 16)
    row["epoch_s"] = round(row["step_ms"] * steps / 1000, 1)
    row["n_pairs"] = n_pairs
    row["reference_gpu_epoch_s"] = 60.0
    return row


# ---------------------------------------------------------------------------
# Torch CPU reference baseline (reference-style model + m_dreg_looser)
# ---------------------------------------------------------------------------

def measure_torch_cpu(steps: int = 3) -> float:
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    import torch.distributions as td

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)

    class MLPEnc(nn.Module):
        def __init__(self, indim):
            super().__init__()
            self.l = nn.Linear(indim, 512)
            self.mu = nn.Linear(512, LATENT)
            self.lv = nn.Linear(512, LATENT)

        def forward(self, x):
            h = F.relu(self.l(x.reshape(x.shape[0], -1)))
            return self.mu(h), self.lv(h)

    class MLPDec(nn.Module):
        def __init__(self, outshape):
            super().__init__()
            self.outshape = outshape
            self.l = nn.Linear(LATENT, 512)
            self.out = nn.Linear(512, int(torch.tensor(outshape).prod()))

        def forward(self, z):
            h = F.relu(self.l(z))
            return torch.sigmoid(self.out(h)).reshape(*z.shape[:-1], *self.outshape)

    class ConvEnc(nn.Module):
        def __init__(self):
            super().__init__()
            f = 32
            self.enc = nn.Sequential(
                nn.Conv2d(3, f, 4, 2, 1), nn.ReLU(True),
                nn.Conv2d(f, f * 2, 4, 2, 1), nn.ReLU(True),
                nn.Conv2d(f * 2, f * 4, 4, 2, 1), nn.ReLU(True),
            )
            self.c1 = nn.Conv2d(f * 4, LATENT, 4, 2, 0)
            self.c2 = nn.Conv2d(f * 4, LATENT, 4, 2, 0)

        def forward(self, x):
            e = self.enc(x)
            return self.c1(e).reshape(-1, LATENT), self.c2(e).reshape(-1, LATENT)

    class ConvDec(nn.Module):
        def __init__(self):
            super().__init__()
            f = 32
            self.dec = nn.Sequential(
                nn.ConvTranspose2d(LATENT, f * 4, 4, 1, 0), nn.ReLU(True),
                nn.ConvTranspose2d(f * 4, f * 2, 4, 2, 1), nn.ReLU(True),
                nn.ConvTranspose2d(f * 2, f, 4, 2, 1), nn.ReLU(True),
                nn.ConvTranspose2d(f, 3, 4, 2, 1), nn.Sigmoid(),
            )

        def forward(self, z):
            lead = z.shape[:-1]
            out = self.dec(z.reshape(-1, LATENT, 1, 1))
            return out.reshape(*lead, *out.shape[1:])

    encs = [MLPEnc(28 * 28), ConvEnc()]
    decs = [MLPDec((1, 28, 28)), ConvDec()]
    params = [p for m in encs + decs for p in m.parameters()]
    opt = torch.optim.Adam(params, lr=1e-3, amsgrad=True)
    lik = ((3 * 32 * 32) / (28 * 28), 1.0)

    x = [torch.rand(BATCH, 1, 28, 28), torch.rand(BATCH, 3, 32, 32)]

    def softmax_std(lv):
        return torch.softmax(lv, dim=-1) * lv.shape[-1] + 1e-6

    def step():
        opt.zero_grad()
        qz, zss = [], []
        for m in range(2):
            mu, lv = encs[m](x[m])
            std = softmax_std(lv)
            q = td.Laplace(mu, std)
            qz.append(q)
            zss.append(q.rsample([K]))
        lws = []
        pz = td.Laplace(torch.zeros(1, LATENT), torch.ones(1, LATENT))
        qz_det = [td.Laplace(q.loc.detach(), q.scale.detach()) for q in qz]
        for r in range(2):
            lpz = pz.log_prob(zss[r]).sum(-1)
            lqz = torch.logsumexp(
                torch.stack([q.log_prob(zss[r]).sum(-1) for q in qz_det]), 0
            ) - torch.log(torch.tensor(2.0))
            lpx = 0
            for d in range(2):
                recon = decs[d](zss[r])
                lp = td.Normal(recon, torch.ones(1)).log_prob(x[d])
                lpx = lpx + lp.reshape(K, BATCH, -1).sum(-1) * lik[d]
            lws.append(lpz + lpx - lqz)
        lws_t = torch.stack(lws)
        with torch.no_grad():
            w = (lws_t - torch.logsumexp(lws_t, 1, keepdim=True)).exp()
        for r in range(2):
            zss[r].register_hook(lambda g, r=r: w[r].unsqueeze(-1) * g)
        loss = -(w * lws_t).mean(0).sum()
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.time()
    for _ in range(steps):
        step()
    dt = time.time() - t0
    sps = BATCH * steps / dt
    log(f"torch-cpu: {steps} steps in {dt:.2f}s -> {sps:.1f} paired samples/s")
    return sps


def get_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["paired_samples_per_sec_cpu_torch"]
    sps = measure_torch_cpu()
    with open(BASELINE_CACHE, "w") as f:
        json.dump({
            "paired_samples_per_sec_cpu_torch": sps,
            "config": "mnist_svhn mmvae laplace dreg_looser K=30 B=128",
            "note": "reference-style torch CPU implementation measured on this host",
        }, f)
    return sps


def _supervised_rerun() -> None:
    """Driver-mode watchdog: run the measurement in a CHILD process under a
    bounded timeout, up to 3 attempts, and re-print its final JSON line.

    The axon remote backend nondeterministically hangs on compile or
    first-dispatch (docs/BENCH_NOTES.md "deserialize hang"; observed again
    r4 for >40 min windows). The driver invokes `python bench.py` exactly
    once per round, so a single unlucky hang would lose the round's
    BENCH_r*.json. A fresh process re-establishes the tunnel client and the
    server-side compile cache makes retries fast; the in-process
    measurement path is unchanged (MMVAE_BENCH_CHILD=1)."""
    import subprocess

    # escalating per-attempt timeouts (ADVICE r4): with the documented
    # 2-3x tunnel timing fluctuation a fixed 1500s could kill a
    # legitimately slow run on all 3 attempts — exactly the failure the
    # watchdog exists to prevent. Env-overridable for outer wrappers.
    timeouts = [int(t) for t in os.environ.get(
        "MMVAE_BENCH_TIMEOUTS", "1500,2400,3600").split(",")]
    for attempt in range(1, len(timeouts) + 1):
        env = dict(os.environ, MMVAE_BENCH_CHILD="1")
        try:
            p = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)]
                + sys.argv[1:],
                env=env, timeout=timeouts[attempt - 1],
                stdout=subprocess.PIPE,
                stderr=sys.stderr, text=True)
        except subprocess.TimeoutExpired:
            log(f"[bench] attempt {attempt} timed out (tunnel hang); "
                "retrying in a fresh process")
            continue
        lines = [ln for ln in p.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if p.returncode == 0 and lines:
            print(lines[-1])
            return
        log(f"[bench] attempt {attempt} failed rc={p.returncode}")
        time.sleep(20)
    log(f"[bench] giving up after {len(timeouts)} attempts")
    sys.exit(1)


def main():
    run_all = "--all" in sys.argv
    if os.environ.get("MMVAE_BENCH_CHILD") != "1" and not run_all:
        _supervised_rerun()
        return
    baseline = get_baseline()
    rows = []
    # bf16 mixed precision is the bench default (VERDICT r2 next#3): params
    # and optimizer stay f32, MXU operands cast to bf16 (core/precision.py).
    # Training-quality parity for the policy is pinned by
    # tests/test_precision.py and a trained-to-convergence bf16 quality row
    # (docs/QUALITY.md); the f32 row is measured on every run below.
    flag = flagship_cfg()
    flag.extra["compute_dtype"] = "bfloat16"
    flagship = measure_tpu(flag, "mmvae-dreg-K30-bf16")
    rows.append(flagship)
    # f32 row always measured too (advisor r3): the headline switched to
    # bf16 in round 3 while vs_baseline divides the torch-CPU *f32*
    # baseline — emitting vs_baseline_f32 alongside keeps the BENCH_r01/r02
    # (f32-headline) series comparable across rounds.
    f32 = measure_tpu(flagship_cfg(), "mmvae-dreg-K30-f32")
    rows.append(f32)
    if run_all:
        # activation-storage bf16 (opt-in "activation_dtype"): conv feature
        # maps stored bf16 between layers — attacks the HBM byte floor the
        # round-4 roofline identified (docs/BENCH_NOTES.md); parity pinned
        # by tests/test_precision.py
        act = flagship_cfg()
        act.extra["compute_dtype"] = "bfloat16"
        act.extra["activation_dtype"] = "bfloat16"
        rows.append(measure_tpu(act, "mmvae-dreg-K30-bf16act"))
        # saturation probe: same model, B=512 bf16. At K=30 the effective
        # batch is B*K, so B=128 already saturates the MXU; this row pins
        # that raising B past the parity recipe does NOT buy throughput
        # (measured: ~24k sps at B=512 vs ~30k at B=128, docs/BENCH_NOTES.md)
        ceil = flagship_cfg()
        ceil.batch_size = 512
        ceil.extra["compute_dtype"] = "bfloat16"
        rows.append(measure_tpu(ceil, "mmvae-dreg-K30-bf16-B512"))
        rows.append(measure_tpu(jnf_cfg(), "jnf-postwarmup-maf"))
        # scan variant: dispatch overhead amortized over 16 steps/dispatch —
        # the JNF/MSF step-time floor is device compute, not tunnel latency,
        # iff this row matches the per-dispatch one (docs/BENCH_NOTES.md r4)
        rows.append(measure_tpu_scan(jnf_cfg(), "jnf-postwarmup-maf-scan16"))
        rows.append(measure_msf_epoch())
        rows.append(measure_msf_epoch_chunked())
        with open(os.path.join(os.path.dirname(__file__),
                               "bench_details.json"), "w") as f:
            json.dump({"rows": rows, "baseline_cpu_torch_sps": baseline}, f,
                      indent=2)
        log("bench_details.json written")
    print(json.dumps({
        "metric": "paired samples/sec/chip (MNIST-SVHN MMVAE, DReG-looser K=30, B=128, bf16 MXU)",
        "value": flagship["sps"],
        "unit": "samples/s",
        "vs_baseline": round(flagship["sps"] / baseline, 2),
        "flops_per_step": flagship["flops_per_step"],
        "mfu": flagship["mfu"],
        "f32_sps": f32["sps"],
        "vs_baseline_f32": round(f32["sps"] / baseline, 2),
        "mfu_f32": f32["mfu"],
    }))


if __name__ == "__main__":
    main()
