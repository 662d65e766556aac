"""Train entry point — the main.py equivalent.

Usage: python -m mmvae_tpu.cli.train --config-path path/to/config.json
Accepts the reference's JSON schema verbatim (main.py:25-35). Creates the
same run-dir layout: ../experiments/<experiment>/<date>/<runId>/ with
args.json, model checkpoints, losses history.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
from pathlib import Path
from tempfile import mkdtemp

import jax
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Multi-Modal VAEs (TPU)")
    parser.add_argument("--config-path", type=str, default="")
    parser.add_argument("--experiments-dir", type=str, default="../experiments")
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu)")
    info = parser.parse_args(argv)

    if info.platform:
        jax.config.update("jax_platforms", info.platform)

    from ..core.runtime import enable_compilation_cache

    enable_compilation_cache()
    from ..core.config import ExperimentConfig
    from ..data import get_dataloaders
    from ..models import registry
    from ..parallel import make_mesh
    from ..train import Trainer

    cfg = ExperimentConfig.from_json(info.config_path)
    np.random.seed(cfg.seed)

    # use_pretrain resume (main.py:54-62, 88-91): adopt the old run's args,
    # extend the epoch budget, reload its checkpoint below
    pretrained_path = cfg.use_pretrain
    if pretrained_path:
        new_cfg = cfg
        cfg = ExperimentConfig.from_json(os.path.join(pretrained_path, "args.json"))
        prev_epochs = cfg.epochs
        cfg.epochs = prev_epochs + new_cfg.epochs
        cfg.warmup = prev_epochs + new_cfg.warmup
        cfg.freq_analytics = new_cfg.freq_analytics
        cfg.use_pretrain = pretrained_path

    bundle = registry.build(cfg)
    mesh = make_mesh(n_data=cfg.mesh_data, n_k=cfg.mesh_k)

    run_id = datetime.datetime.now().isoformat()
    experiment = cfg.experiment or bundle.model_name
    exp_dir = Path(info.experiments_dir) / experiment / datetime.date.today().isoformat()
    exp_dir.mkdir(parents=True, exist_ok=True)
    run_path = mkdtemp(prefix=run_id, dir=str(exp_dir))
    print("Expt:", run_path)
    with open(os.path.join(run_path, "args.json"), "w") as f:
        json.dump(cfg.to_dict(), f)

    kw = dict(batch_size=cfg.batch_size, data_path=cfg.data_path)
    if cfg.len_train and bundle.dataset == "mnist_svhn":
        kw["len_train"] = cfg.len_train
    # forward unknown config keys that the dataset constructor accepts
    # (e.g. dataset_size/n_repeat for the synthetic circles builder)
    import inspect

    from ..data.loaders import DATASETS
    sig = inspect.signature(DATASETS[bundle.dataset]).parameters
    kw.update({k: v for k, v in cfg.extra.items() if k in sig})
    train_loader, test_loader, val_loader = get_dataloaders(bundle.dataset, **kw)

    # use_gen warm start: append joint-encoder-generated samples to the
    # train set (main.py:123-127)
    if cfg.skip_warmup and cfg.use_gen:
        from ..data.loaders import ArrayLoader, PairedDataset

        pool = os.path.join(info.experiments_dir, "joint_encoders",
                            (cfg.experiment or "default").split("/")[-1])
        gen = [np.load(os.path.join(pool, f"generated_modality_{i}.npy"))
               for i in range(len(bundle.shape_mods))]
        if cfg.len_gen:
            gen = [g[: cfg.len_gen] for g in gen]
        ds = train_loader.dataset
        merged = PairedDataset(
            [np.concatenate([m, g]) for m, g in zip(ds.modalities, gen)],
            [np.concatenate([l, np.zeros(len(gen[0]), dtype=l.dtype)])
             for l in ds.labels],
        )
        train_loader = ArrayLoader(merged, cfg.batch_size, shuffle=True)
        print(f"use_gen: appended {len(gen[0])} generated pairs")
    print(f"Train: {train_loader.num_examples}, Test: {test_loader.num_examples}, "
          f"Val: {val_loader.num_examples}")

    trainer = Trainer(bundle.model, bundle.spec, cfg, mesh=mesh, run_path=run_path,
                      experiments_dir=info.experiments_dir)
    print(f"objective: {trainer.obj_name}")

    hooks = []
    if pretrained_path:
        from ..train import checkpoints as ckpt

        def load_pretrained(v):
            print(f"Loading model from {pretrained_path}")
            return ckpt.load_bytes(v, os.path.join(pretrained_path, "model.msgpack"))

        hooks.append(load_pretrained)

    variables_hook = None
    if cfg.dcca:
        dcca_path = cfg.extra.get(
            "dcca_path", os.path.join("../experiments/dcca", bundle.dataset, "dcca.npz"))
        if os.path.exists(dcca_path):
            print(f"grafting pretrained DCCA trunks from {dcca_path}")
            hooks.append(lambda v: registry.graft_dcca_params(
                v, dcca_path, bundle.model))
        else:
            print(f"WARNING: dcca=true but no artifacts at {dcca_path}; "
                  "trunks stay randomly initialized (frozen)")

    if hooks:
        def variables_hook(v):
            for h in hooks:
                v = h(v)
            return v

    callbacks = []

    # per-epoch metric tracking (main.py:40-43,166,212 wandb semantics):
    # metrics.jsonl in the run dir always; wandb transparently if available
    from ..utils import Tracker

    tracker = Tracker(project=cfg.wandb_experiment or experiment,
                      run_path=run_path, config=cfg.to_dict())

    def track(trainer_, state_, epoch, tr_det, va_det, **metrics):
        payload = {"train_loss": metrics.get("tr_loss"),
                   "val_loss": metrics.get("va_loss"),
                   "lr": metrics.get("lr")}
        payload.update({f"train_{k}": v for k, v in (tr_det or {}).items()})
        payload.update({f"val_{k}": v for k, v in (va_det or {}).items()})
        tracker.log(payload, step=epoch)

    callbacks.append(track)
    if not cfg.no_analytics:
        from ..eval.generation import generate, sample_from_conditional
        from ..vis import adjust_shape, save_image, save_samples
        import jax.numpy as jnp

        val_xs, _ = next(iter(val_loader))
        val_xs = [jnp.asarray(x[:8]) for x in val_xs]
        # circles radius analytics (jmvae_nf_circles.py:82-132): correlate
        # true radii with radii extracted from cross reconstructions
        val_extras = getattr(val_loader.dataset, "extras", {}) or {}
        has_radii = {"r_squares", "r_circles"} <= set(val_extras)

        def analytics(trainer_, state_, epoch, tr_det, va_det, **metrics):
            """Per-epoch image grids (main.py:195-209): conditional samples,
            reconstructions, prior generations."""
            if epoch % cfg.freq_analytics != 0 and epoch != 1:
                return
            akey = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 7000 + epoch)
            try:
                samples = sample_from_conditional(
                    bundle.model, state_.variables, val_xs, akey, n=8)
                for r in range(len(val_xs)):
                    for o in range(len(val_xs)):
                        recon = np.asarray(samples[r][o]).reshape(
                            -1, *samples[r][o].shape[2:])
                        a, b = adjust_shape(np.asarray(val_xs[r]), recon)
                        save_image(np.concatenate([a, b]),
                                   os.path.join(run_path,
                                                f"cond_samples_{r}x{o}_{epoch:03d}.png"))
                gen = generate(bundle.model, state_.variables, akey,
                               bundle.spec, N=32)
                if len(gen) >= 2:
                    save_samples([np.asarray(g) for g in gen[:2]],
                                 os.path.join(run_path, f"generate_{epoch:03d}.png"))
                if has_radii:
                    from ..eval.latent_analysis import analyse_rayons

                    ds = val_loader.dataset
                    n_an = min(64, len(ds))
                    rm = analyse_rayons(
                        bundle.model, state_.variables,
                        [m[:n_an] for m in ds.modalities],
                        ds.extras["r_squares"][:n_an],
                        ds.extras["r_circles"][:n_an],
                        akey, run_path, epoch)
                    print(f"[analytics] rayon metrics epoch {epoch}: {rm}")
            except Exception as e:  # analytics must never kill training
                print(f"[analytics] skipped at epoch {epoch}: {e}")

        callbacks.append(analytics)

    use_dp = bool(cfg.extra.get("device_pipeline", True)) and \
        cfg.batch_size % mesh.shape.get("data", 1) == 0
    state = trainer.fit(train_loader, val_loader, key=jax.random.PRNGKey(cfg.seed),
                        variables_hook=variables_hook, callbacks=callbacks,
                        use_device_pipeline=use_dp)

    tracker.close()
    with open(os.path.join(run_path, "losses.json"), "w") as f:
        json.dump(getattr(trainer, "_history", {}), f)
    print("done; best checkpoints in", run_path)
    return run_path


if __name__ == "__main__":
    main()
