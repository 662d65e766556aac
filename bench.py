"""Benchmark: paired samples/sec/chip on the BASELINE flagship config —
MNIST-SVHN MMVAE, Laplace MoE posteriors, DReG-looser K=30, batch 128
(configs_experiments/mnist_svhn/mmvae.json).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline compares against the reference-style PyTorch implementation of
the same model + objective running on this host's CPU (the reference has no
recorded throughput numbers — BASELINE.md — so the north-star comparison is
>=10x over CPU torch). The torch baseline is measured once and cached in
.bench_baseline.json.
"""

import json
import os
import sys
import time

BATCH = 128
K = 30
LATENT = 20
BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# JAX/TPU measurement
# ---------------------------------------------------------------------------

def measure_tpu(steps: int = 100, warmup: int = 3) -> float:
    """End-to-end train-step throughput WITH the fused on-device input
    pipeline: per step the host ships only a (B,) int32 index batch; the
    index-pair gather + uint8 decode + normalize run inside the jitted step
    (data/device_pipeline.py — the BASELINE north-star input stage)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmvae_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()

    from mmvae_tpu.core.config import ExperimentConfig
    from mmvae_tpu.data.device_pipeline import DeviceDataPipeline
    from mmvae_tpu.models import registry
    from mmvae_tpu.train import Trainer

    cfg = ExperimentConfig(
        model="mnist_svhn", obj="dreg", looser=True, K=K, dist="laplace",
        recon_losses=("normal", "normal"), latent_dim=LATENT,
        batch_size=BATCH, learning_rate=1e-3, warmup=0,
    )
    bundle = registry.build(cfg)
    trainer = Trainer(bundle.model, bundle.spec, cfg)

    rng = np.random.default_rng(0)
    n_base = 8192
    base = [
        (rng.uniform(size=(n_base, 1, 28, 28)) * 255).astype(np.uint8),
        (rng.uniform(size=(n_base, 3, 32, 32)) * 255).astype(np.uint8),
    ]
    n_pairs = 4 * n_base
    pair_idx = [rng.integers(0, n_base, n_pairs).astype(np.int32) for _ in range(2)]
    pipeline = DeviceDataPipeline(base, pair_idx, BATCH, shuffle=True)

    key = jax.random.PRNGKey(0)
    xs0 = [np.zeros((BATCH, 1, 28, 28), np.float32),
           np.zeros((BATCH, 3, 32, 32), np.float32)]
    variables = trainer.init_variables(xs0, key)
    opt_state = trainer.init_opt_state(variables)
    # device-counter step: identical program every dispatch, all-on-device
    # args -> host enqueues asynchronously with zero per-step transfers
    step = trainer.device_counter_step(past_warmup=True, pipeline=pipeline)

    lr = jnp.float32(1e-3)
    one = jnp.float32(1.0)
    it = pipeline.epoch_index_batches()
    rows_dev = jnp.asarray(np.stack([next(it) for _ in range(warmup + steps)]))
    counter = jnp.int32(0)

    t0 = time.time()
    data_state = pipeline.data_state
    for _ in range(warmup):
        variables, opt_state, counter, loss, _ = step(
            variables, opt_state, data_state, rows_dev, counter, key, lr, one, one)
    jax.block_until_ready(loss)
    log(f"compile+warmup: {time.time() - t0:.1f}s")

    t0 = time.time()
    for _ in range(steps):
        variables, opt_state, counter, loss, _ = step(
            variables, opt_state, data_state, rows_dev, counter, key, lr, one, one)
    jax.block_until_ready(loss)
    dt = time.time() - t0
    sps = BATCH * steps / dt
    log(f"tpu (fused on-device input pipeline): {steps} steps in {dt:.2f}s -> "
        f"{sps:.1f} paired samples/s (devices {jax.devices()})")
    return sps


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
            import numpy as np
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


def main():
    baseline = get_baseline()
    sps = measure_tpu()
    print(json.dumps({
        "metric": "paired samples/sec/chip (MNIST-SVHN MMVAE, DReG-looser K=30, B=128)",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / baseline, 2),
    }))


if __name__ == "__main__":
    main()
