"""Training driver — the functional equivalent of the reference's main.py
epoch loop (main.py:147-277): Adam(amsgrad) + ReduceLROnPlateau, warmup
phases with optimizer reset and param freezing, early stopping with
warmup shortening, best-model checkpointing, joint-encoder pool export.

TPU-first: one jitted train step per phase (warmup / post-warmup), batch
sharded over the mesh 'data' axis, lr and beta_kl fed as traced scalars so
schedules never trigger recompilation.
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
from collections import defaultdict
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import precision
from ..core.config import ExperimentConfig
from ..objectives import objectives as obj_mod
from ..parallel import mesh as mesh_lib
from . import checkpoints, freezing
from .schedule import BetaKlSchedule, ReduceLROnPlateau


@dataclasses.dataclass
class TrainerState:
    variables: Dict[str, Any]
    opt_state: Any
    epoch: int = 1


class Trainer:
    def __init__(self, model, spec, cfg: ExperimentConfig, mesh=None,
                 run_path: Optional[str] = None, multimodal: bool = True,
                 log_fn: Callable[[str], None] = print,
                 experiments_dir: Optional[str] = None):
        self.model = model
        self.spec = spec
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh(n_data=1)
        self.run_path = run_path
        self.experiments_dir = experiments_dir
        self.log = log_fn
        self.obj_name, self.obj_fn, self.custom_grad = obj_mod.resolve(
            cfg.obj, multimodal, cfg.looser
        )
        # mixed precision (core/precision.py): params/optimizer stay f32,
        # conv/matmul operands cast to this dtype inside the jitted steps
        self.compute_dtype = precision.parse(cfg.extra.get("compute_dtype"))
        # further opt-in: store conv activations in this dtype (config key
        # "activation_dtype"; None keeps the f32-activation contract). See
        # core/precision.py and docs/BENCH_NOTES.md round-4 roofline.
        self.activation_dtype = cfg.extra.get("activation_dtype") or None
        self._step_cache: Dict[Any, Callable] = {}
        self._eval_cache: Dict[Any, Callable] = {}

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    def init_variables(self, sample_xs, key) -> Dict[str, Any]:
        method = "init_all" if hasattr(self.model, "init_all") else None
        # jitted: an eager flax init dispatches every op individually over
        # the remote tunnel — minutes for the big models (BENCH_NOTES)
        init = jax.jit(lambda k, xs: self.model.init(
            {"params": k, "sample": k}, xs, K=1, method=method))
        variables = init(key, [jnp.asarray(x) for x in sample_xs])
        return mesh_lib.replicate(self.mesh, variables)

    def _make_tx(self, params, past_warmup: bool, amsgrad: bool):
        frozen = freezing.frozen_prefixes_for_phase(
            self.obj_name, past_warmup, self.cfg.fix_jencoder, self.cfg.fix_decoders
        )
        # lr is applied manually in the step (traced scalar); the inner
        # transform runs at lr=1 (main.py:114-117, 243)
        inner = optax.amsgrad(1.0) if amsgrad else optax.adam(1.0)
        clip = float(getattr(self.cfg, "clip_grad_norm", 0.0) or 0.0)
        if clip > 0.0:
            # Opt-in (0 = reference-exact, no clipping). Root-cause of the
            # late JNF MAF deaths (r5, docs/BENCH_NOTES.md NaN-robustness):
            # the flow-matching KLD has unbounded quadratic tails
            # ((z0-mu)^2 * exp(-lv) after exp(-s) amplification); a single
            # huge-but-FINITE gradient step — which nan_guard by design
            # does not skip — launches params into the overflow region and
            # every later forward is inf. Global-norm clipping bounds that
            # one step; healthy steps are untouched.
            inner = optax.chain(optax.clip_by_global_norm(clip), inner)
        return freezing.masked_optimizer(inner, params, frozen)

    def init_opt_state(self, variables, past_warmup: bool = False,
                       amsgrad: bool = True):
        self._tx = self._make_tx(variables["params"], past_warmup, amsgrad)
        return mesh_lib.replicate(self.mesh, self._tx.init(variables["params"]))

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _scalar_kwargs(self):
        return dict(
            K=self.cfg.K, warmup=self.cfg.warmup,
            beta_prior=self.cfg.beta_prior, beta=self.cfg.beta,
            # static: lets m_jmvae_nf detach the fully-frozen joint
            # encoder/decoder computation post-warmup (see objectives.py)
            frozen_joint=bool(self.cfg.fix_jencoder and self.cfg.fix_decoders),
        )

    def _build_train_step(self, past_warmup: bool):
        tx = self._tx
        model, spec, obj_fn = self.model, self.spec, self.obj_fn
        custom = self.custom_grad
        statics = self._scalar_kwargs()

        cdtype = self.compute_dtype
        adtype = self.activation_dtype

        def step(variables, opt_state, xs, key, lr, beta_kl, epoch):
            with precision.use(cdtype, adtype):
                return _step(variables, opt_state, xs, key, lr, beta_kl, epoch)

        guard = bool(getattr(self.cfg, "nan_guard", True))

        def _step(variables, opt_state, xs, key, lr, beta_kl, epoch):
            kwargs = dict(statics, past_warmup=past_warmup, beta_kl=beta_kl,
                          epoch=epoch, train=True)
            if custom:
                obj, details, new_state, grads = obj_fn(
                    model, variables, xs, key, spec, **kwargs
                )
                grads = jax.tree.map(lambda g: -g, grads)  # maximize -> minimize
            else:
                def loss_fn(p):
                    v = {**variables, "params": p}
                    obj, details, new_state = obj_fn(model, v, xs, key, spec, **kwargs)
                    return -obj, (details, new_state)

                (negobj, (details, new_state)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(variables["params"])
                obj = -negobj
            if guard:
                # A single non-finite batch (MAF exp overflow, etc.) must not
                # poison params, Adam moments, or BN stats: sanitize grads
                # BEFORE tx.update (Adam would keep NaN moments forever), then
                # select the old state wherever the step was bad. Finite steps
                # are bit-identical to the unguarded path.
                finite = jnp.isfinite(obj)
                finite = jax.tree_util.tree_reduce(
                    lambda a, g: jnp.logical_and(a, jnp.all(jnp.isfinite(g))),
                    grads, finite)
                grads = jax.tree.map(
                    lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
            updates, new_opt_state = tx.update(grads, opt_state, variables["params"])
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(variables["params"], updates)
            if guard:
                sel = lambda new, old: jnp.where(finite, new, old)
                params = jax.tree.map(sel, params, variables["params"])
                new_opt_state = jax.tree.map(sel, new_opt_state, opt_state)
                new_state = jax.tree.map(
                    sel, new_state, {k: variables[k] for k in new_state})
                # per-epoch mean of this detail = fraction of skipped steps;
                # surfaces silent freezes in the epoch log
                details = {**details,
                           "nan_skipped": 1.0 - finite.astype(jnp.float32)}
            variables = {**variables, "params": params, **new_state}
            return variables, new_opt_state, -obj, details

        return step

    def _build_eval_step(self, past_warmup: bool):
        model, spec, obj_fn = self.model, self.spec, self.obj_fn
        custom = self.custom_grad
        statics = self._scalar_kwargs()

        cdtype = self.compute_dtype
        adtype = self.activation_dtype

        def step(variables, xs, key, beta_kl, epoch):
            kwargs = dict(statics, past_warmup=past_warmup, beta_kl=beta_kl,
                          epoch=epoch, train=False)
            with precision.use(cdtype, adtype):
                out = obj_fn(model, variables, xs, key, spec, **kwargs)
            obj, details = out[0], out[1]
            return -obj, details

        return jax.jit(step)

    def train_step(self, past_warmup: bool):
        if past_warmup not in self._step_cache:
            self._step_cache[past_warmup] = jax.jit(
                self._build_train_step(past_warmup), donate_argnums=(0, 1))
        return self._step_cache[past_warmup]

    def device_train_step(self, past_warmup: bool, pipeline):
        """Train step taking int32 pair-row indices; the index-pair gather +
        uint8 decode + normalize run INSIDE the jitted step (the fused
        on-device input stage, data/device_pipeline.py). Host->device
        traffic per step is just the index batch."""
        key_ = ("device", past_warmup, id(pipeline))
        if key_ not in self._step_cache:
            inner = self._build_train_step(past_warmup)
            gather = pipeline.gather_fn()

            def step(variables, opt_state, data_state, pair_rows, key, lr,
                     beta_kl, epoch):
                xs = gather(pair_rows, data_state)
                return inner(variables, opt_state, xs, key, lr, beta_kl, epoch)

            self._step_cache[key_] = jax.jit(step, donate_argnums=(0, 1))
        return self._step_cache[key_]

    def device_counter_step(self, past_warmup: bool, pipeline):
        """Train step taking the WHOLE epoch's pre-staged index table plus a
        device-resident step counter: every dispatch runs the identical
        program on on-device arguments, so the host enqueues steps
        asynchronously with zero per-step transfers or recompiles (a python
        `rows[i]` slice would compile a distinct program per i)."""
        key_ = ("device_counter", past_warmup, id(pipeline))
        if key_ not in self._step_cache:
            inner = self._build_train_step(past_warmup)
            gather = pipeline.gather_fn()

            def step(variables, opt_state, data_state, rows_all, counter, key,
                     lr, beta_kl, epoch):
                rows = jax.lax.dynamic_index_in_dim(rows_all, counter, 0,
                                                    keepdims=False)
                xs = gather(rows, data_state)
                variables, opt_state, loss, details = inner(
                    variables, opt_state, xs, jax.random.fold_in(key, counter),
                    lr, beta_kl, epoch)
                return variables, opt_state, counter + 1, loss, details

            self._step_cache[key_] = jax.jit(step, donate_argnums=(0, 1))
        return self._step_cache[key_]

    def device_multi_step(self, past_warmup: bool, pipeline, n_steps: int):
        """lax.scan over n_steps train steps with pre-staged index batches:
        ONE dispatch per chunk instead of one per step — dispatch latency
        (which dominates on tethered/tunneled chips) is amortized away.
        Takes rows of shape (n_steps, B); returns summed loss and summed
        details."""
        key_ = ("device_scan", past_warmup, id(pipeline), n_steps)
        if key_ not in self._step_cache:
            inner = self._build_train_step(past_warmup)
            gather = pipeline.gather_fn()

            def chunk(variables, opt_state, data_state, rows, key, lr,
                      beta_kl, epoch):
                def body(carry, inp):
                    variables, opt_state = carry
                    rows_i, key_i = inp
                    xs = gather(rows_i, data_state)
                    variables, opt_state, loss, details = inner(
                        variables, opt_state, xs, key_i, lr, beta_kl, epoch)
                    return (variables, opt_state), (loss, details)

                keys = jax.random.split(key, rows.shape[0])
                (variables, opt_state), (losses, details) = jax.lax.scan(
                    body, (variables, opt_state), (rows, keys))
                details = jax.tree.map(jnp.sum, details)
                return variables, opt_state, jnp.sum(losses), details

            self._step_cache[key_] = jax.jit(chunk, donate_argnums=(0, 1))
        return self._step_cache[key_]

    def device_counter_multi_step(self, past_warmup: bool, pipeline,
                                  n_steps: int):
        """Counter-convention variant of device_multi_step: takes the WHOLE
        epoch index table + a counter and runs `n_steps` consecutive train
        steps under ONE lax.scan dispatch. The per-step PRNG key is
        fold_in(key, counter + i) — identical to device_counter_step — so a
        chunked epoch runs the SAME math on the same batches/keys; XLA may
        fuse the scan body differently from the standalone step and
        reorder float reductions, so equality is to fp-reassociation
        tolerance (measured ~1e-5 after 2 epochs; pinned by
        tests/test_train_e2e.py::test_steps_per_dispatch_equivalent).
        One dispatch per chunk amortizes tunnel/host dispatch latency,
        which dominates wall time for the small-step models (JNF/MSF:
        ~0.3-0.5 ms device compute vs 2-18 ms per-dispatch latency,
        docs/BENCH_NOTES.md round-4)."""
        key_ = ("device_counter_scan", past_warmup, id(pipeline), n_steps)
        if key_ not in self._step_cache:
            inner = self._build_train_step(past_warmup)
            gather = pipeline.gather_fn()

            def step(variables, opt_state, data_state, rows_all, counter, key,
                     lr, beta_kl, epoch):
                rows = jax.lax.dynamic_slice_in_dim(rows_all, counter,
                                                    n_steps, axis=0)

                def body(carry, rows_i):
                    variables, opt_state, c = carry
                    xs = gather(rows_i, data_state)
                    variables, opt_state, loss, details = inner(
                        variables, opt_state, xs, jax.random.fold_in(key, c),
                        lr, beta_kl, epoch)
                    return (variables, opt_state, c + 1), (loss, details)

                (variables, opt_state, counter), (losses, details) = \
                    jax.lax.scan(body, (variables, opt_state, counter), rows)
                details = jax.tree.map(jnp.sum, details)
                return variables, opt_state, counter, jnp.sum(losses), details

            self._step_cache[key_] = jax.jit(step, donate_argnums=(0, 1))
        return self._step_cache[key_]

    def run_epoch_device(self, state: TrainerState, pipeline, key, lr, beta_kl,
                         epoch: int = 1):
        """Device-pipeline epoch: the WHOLE epoch's shuffled index batches are
        staged on device in one transfer; each step slices its row batch
        on-device, so per-step dispatches stay asynchronous (a per-step
        host->device transfer would serialize the pipeline — measured 10x
        slower on tunneled chips). Steps are dispatched in scan chunks of
        `steps_per_dispatch` (config, default 16; 1 restores pure per-step
        dispatch) with a per-step tail — chunking runs identical math, see
        device_counter_multi_step."""
        past_warmup = epoch >= self.cfg.warmup
        step = self.device_counter_step(past_warmup, pipeline)
        rows_dev = jnp.asarray(np.stack(list(pipeline.epoch_index_batches())))
        if pipeline.rows_sharding is not None:
            # (steps, B): shard the batch axis over 'data'; the gather and
            # the whole train step then run data-parallel, grads all-reduced
            # by XLA
            rows_dev = jax.device_put(rows_dev, pipeline.rows_sharding)
        n_rows = rows_dev.shape[0]
        chunk = int(self.cfg.extra.get("steps_per_dispatch", 16) or 1)
        counter = jnp.int32(0)
        ekey = jax.random.fold_in(key, epoch)
        data_state = pipeline.data_state
        losses = []
        details_acc = None

        def _acc(loss, details):
            nonlocal details_acc
            losses.append(loss)
            # accumulate details ON DEVICE: a float() per key per step would
            # block the dispatch queue on a host round-trip (measured ~10x
            # epoch slowdown for detail-heavy losses over the tunnel)
            details_acc = details if details_acc is None else jax.tree.map(
                jnp.add, details_acc, details)

        done = 0
        if chunk > 1 and n_rows >= chunk:
            mstep = self.device_counter_multi_step(past_warmup, pipeline,
                                                   chunk)
            while done + chunk <= n_rows:
                (state.variables, state.opt_state, counter, loss,
                 details) = mstep(
                    state.variables, state.opt_state, data_state, rows_dev,
                    counter, ekey, jnp.float32(lr), jnp.float32(beta_kl),
                    jnp.float32(epoch))
                _acc(loss, details)
                done += chunk
        for _ in range(done, n_rows):
            (state.variables, state.opt_state, counter, loss, details) = step(
                state.variables, state.opt_state, data_state, rows_dev,
                counter, ekey,
                jnp.float32(lr), jnp.float32(beta_kl), jnp.float32(epoch),
            )
            _acc(loss, details)
        total = float(jnp.sum(jnp.stack(losses)))
        n = pipeline.num_examples
        agg = jax.device_get(details_acc) if details_acc else {}
        return total / n, {k2: float(v) / n for k2, v in agg.items()}

    def eval_step(self, past_warmup: bool):
        if past_warmup not in self._eval_cache:
            self._eval_cache[past_warmup] = self._build_eval_step(past_warmup)
        return self._eval_cache[past_warmup]

    def device_eval_counter_step(self, past_warmup: bool, pipeline):
        """Eval analogue of device_counter_step: the val images live on
        device once (uint8); per epoch only the index table ships, and every
        dispatch is the identical program on on-device arguments."""
        key_ = ("device_eval", past_warmup, id(pipeline))
        if key_ not in self._eval_cache:
            inner = self._build_eval_step(past_warmup)
            gather = pipeline.gather_fn()

            def step(variables, data_state, rows_all, counter, key, beta_kl,
                     epoch):
                rows = jax.lax.dynamic_index_in_dim(rows_all, counter, 0,
                                                    keepdims=False)
                xs = gather(rows, data_state)
                loss, details = inner(variables, xs,
                                      jax.random.fold_in(key, counter),
                                      beta_kl, epoch)
                return counter + 1, loss, details

            self._eval_cache[key_] = jax.jit(step)
        return self._eval_cache[key_]

    def device_eval_multi_step(self, past_warmup: bool, pipeline,
                               n_steps: int):
        """Eval analogue of device_counter_multi_step: n_steps val batches
        scored under ONE lax.scan dispatch (same fold_in(key, counter+i)
        keys as the per-batch path, summed loss/details)."""
        key_ = ("device_eval_scan", past_warmup, id(pipeline), n_steps)
        if key_ not in self._eval_cache:
            inner = self._build_eval_step(past_warmup)
            gather = pipeline.gather_fn()

            def step(variables, data_state, rows_all, counter, key, beta_kl,
                     epoch):
                rows = jax.lax.dynamic_slice_in_dim(rows_all, counter,
                                                    n_steps, axis=0)

                def body(c, rows_i):
                    xs = gather(rows_i, data_state)
                    loss, details = inner(variables, xs,
                                          jax.random.fold_in(key, c),
                                          beta_kl, epoch)
                    return c + 1, (loss, details)

                counter, (losses, details) = jax.lax.scan(body, counter, rows)
                return counter, jnp.sum(losses), jax.tree.map(jnp.sum,
                                                              details)

            self._eval_cache[key_] = jax.jit(step)
        return self._eval_cache[key_]

    def run_epoch_device_eval(self, state: TrainerState, pipeline, key,
                              beta_kl, epoch: int = 1):
        """Validation epoch over a device-resident pipeline (see
        run_epoch_device; same async-dispatch rules, no param updates;
        scan-chunked by `steps_per_dispatch` like the train epoch)."""
        past_warmup = epoch >= self.cfg.warmup
        step = self.device_eval_counter_step(past_warmup, pipeline)
        rows_dev = jnp.asarray(np.stack(list(pipeline.epoch_index_batches())))
        if pipeline.rows_sharding is not None:
            rows_dev = jax.device_put(rows_dev, pipeline.rows_sharding)
        n_rows = rows_dev.shape[0]
        chunk = int(self.cfg.extra.get("steps_per_dispatch", 16) or 1)
        counter = jnp.int32(0)
        data_state = pipeline.data_state
        losses, details_acc = [], None

        def _acc(loss, details):
            nonlocal details_acc
            losses.append(loss)
            details_acc = details if details_acc is None else jax.tree.map(
                jnp.add, details_acc, details)

        done = 0
        if chunk > 1 and n_rows >= chunk:
            mstep = self.device_eval_multi_step(past_warmup, pipeline, chunk)
            while done + chunk <= n_rows:
                counter, loss, details = mstep(
                    state.variables, data_state, rows_dev, counter, key,
                    jnp.float32(beta_kl), jnp.float32(epoch))
                _acc(loss, details)
                done += chunk
        for _ in range(done, n_rows):
            counter, loss, details = step(
                state.variables, data_state, rows_dev, counter, key,
                jnp.float32(beta_kl), jnp.float32(epoch))
            _acc(loss, details)
        # the pipeline drops the ragged tail batch; normalize by what we
        # actually scored so the loss stays an unbiased per-example mean
        n = rows_dev.shape[0] * pipeline.batch_size
        total = float(jnp.sum(jnp.stack(losses)))
        agg = jax.device_get(details_acc) if details_acc else {}
        return total / n, {k2: float(v) / n for k2, v in agg.items()}

    # ------------------------------------------------------------------
    # epoch loops
    # ------------------------------------------------------------------

    def run_epoch(self, state: TrainerState, loader, key, lr, beta_kl,
                  train: bool = True, epoch: int = 1):
        past_warmup = epoch >= self.cfg.warmup
        step = self.train_step(past_warmup) if train else self.eval_step(past_warmup)
        losses, details_by_shape = [], {}
        for i, (xs, _) in enumerate(loader):
            xs = mesh_lib.shard_batch(self.mesh, [jnp.asarray(x) for x in xs])
            k = jax.random.fold_in(jax.random.fold_in(key, epoch), i)
            if train:
                state.variables, state.opt_state, loss, details = step(
                    state.variables, state.opt_state, xs, k,
                    jnp.float32(lr), jnp.float32(beta_kl), jnp.float32(epoch),
                )
            else:
                loss, details = step(
                    state.variables, xs, k, jnp.float32(beta_kl), jnp.float32(epoch)
                )
            losses.append(loss)
            # device-side accumulation: per-batch float() conversions would
            # serialize the dispatch queue on host round-trips
            acc = details_by_shape.get("acc")
            details_by_shape["acc"] = details if acc is None else jax.tree.map(
                jnp.add, acc, details)
        total = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
        agg = jax.device_get(details_by_shape.get("acc")) or {}
        n = loader.num_examples
        return total / n, {k: float(v) / n for k, v in agg.items()}

    def make_device_pipeline(self, train_loader):
        """Wrap an ArrayLoader's dataset as a device-resident pipeline
        (data/device_pipeline.from_array_loader: LazyGather modalities ship
        deduplicated base arrays + real pairing tables)."""
        from ..data.device_pipeline import from_array_loader

        mesh = self.mesh if self.mesh.shape.get("data", 1) > 1 else None
        if mesh is not None:
            assert train_loader.batch_size % mesh.shape["data"] == 0, (
                "batch_size must divide the mesh 'data' axis for the "
                "device-pipeline path")
        return from_array_loader(train_loader, mesh=mesh)

    def fit(self, train_loader, val_loader, key=None,
            callbacks: Optional[List[Callable]] = None,
            min_epoch: int = 1,
            variables_hook: Optional[Callable] = None,
            use_device_pipeline: bool = False) -> TrainerState:
        """Full training run (main.py:234-277). variables_hook, if given,
        transforms the freshly-initialized variables (e.g. grafting
        pretrained DCCA trunks or warm-start weights)."""
        cfg = self.cfg
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        init_key, train_key = jax.random.split(key)
        sample_xs, _ = next(iter(train_loader))
        variables = self.init_variables(sample_xs, init_key)
        if variables_hook is not None:
            variables = mesh_lib.replicate(self.mesh, variables_hook(variables))

        if cfg.skip_warmup and self.run_path is not None:
            pool = self._joint_pool_path()
            try:
                variables = checkpoints.load_joint_vae(variables, pool)
                min_epoch = cfg.warmup
                self.log(f"Loaded joint encoder/decoders from {pool}")
            except FileNotFoundError:
                self.log(f"skip_warmup: no pool at {pool}; training from scratch")

        past0 = min_epoch >= cfg.warmup
        opt_state = self.init_opt_state(variables, past_warmup=past0, amsgrad=True)
        state = TrainerState(variables=variables, opt_state=opt_state, epoch=min_epoch)

        plateau = ReduceLROnPlateau(lr=cfg.learning_rate)
        beta_sched = BetaKlSchedule(cfg.beta_kl, cfg.decrease_beta_kl, cfg.warmup)
        best_loss = math.inf
        bad_epochs = 0
        warmup = cfg.warmup
        agg_hist = defaultdict(list)
        pipeline = self.make_device_pipeline(train_loader) if use_device_pipeline else None
        val_pipeline = None
        if use_device_pipeline and val_loader.num_examples >= val_loader.batch_size:
            val_pipeline = self.make_device_pipeline(val_loader)

        epoch = min_epoch
        while epoch <= cfg.epochs:
            if epoch == warmup and cfg.fix_jencoder and epoch != min_epoch:
                # optimizer reset at warmup end (main.py:241-245)
                self.log(f"====> Epoch {epoch}: optimizer reset (post-warmup)")
                state.opt_state = self.init_opt_state(
                    state.variables, past_warmup=True, amsgrad=False
                )
                self._step_cache.clear()
                plateau.reset(cfg.learning_rate)
                best_loss = math.inf

            t0 = time.time()

            def _train_epoch():
                if pipeline is not None:
                    return self.run_epoch_device(
                        state, pipeline, train_key, plateau.lr,
                        beta_sched.value, epoch=epoch)
                return self.run_epoch(
                    state, train_loader, train_key, plateau.lr,
                    beta_sched.value, train=True, epoch=epoch)

            profile_dir = os.environ.get("MMVAE_TPU_PROFILE")
            if profile_dir and epoch == min_epoch + 1:
                # first-class step tracing (SURVEY §5 aux-subsystems gap):
                # capture one post-compile epoch with jax.profiler
                with jax.profiler.trace(profile_dir):
                    tr_loss, tr_details = _train_epoch()
                self.log(f"profiler trace written to {profile_dir}")
            else:
                tr_loss, tr_details = _train_epoch()
            beta_sched.step(epoch)
            if val_pipeline is not None:
                va_loss, va_details = self.run_epoch_device_eval(
                    state, val_pipeline, jax.random.fold_in(train_key, 0x7FFFFFFF),
                    beta_sched.value, epoch=epoch)
            else:
                va_loss, va_details = self.run_epoch(
                    state, val_loader, jax.random.fold_in(train_key, 0x7FFFFFFF),
                    plateau.lr, beta_sched.value, train=False, epoch=epoch,
                )
            agg_hist["train_loss"].append(tr_loss)
            agg_hist["test_loss"].append(va_loss)
            self.log(
                f"====> Epoch {epoch:03d} train {tr_loss:.4f} val {va_loss:.4f} "
                f"({time.time() - t0:.1f}s, lr {plateau.lr:g})"
            )
            skipped = float(np.asarray(tr_details.get("nan_skipped", 0.0)))
            if skipped > 0:
                self.log(f"====> Epoch {epoch:03d} WARNING: nan_guard skipped "
                         f"{skipped:.1%} of train steps")
            for cb in callbacks or []:
                cb(self, state, epoch, tr_details, va_details,
                   tr_loss=tr_loss, va_loss=va_loss, lr=plateau.lr)

            if va_loss < best_loss:
                bad_epochs = 0
                if self.run_path is not None:
                    checkpoints.save_model(state.variables, self.run_path)
                    if cfg.save_joint and epoch <= warmup and self._has_joint():
                        checkpoints.save_joint_vae(state.variables, self._joint_pool_path())
                best_loss = va_loss
            else:
                bad_epochs += 1

            plateau.step(va_loss)
            if bad_epochs == 20:
                if epoch >= warmup:
                    break  # early stop (main.py:267-270)
                # end warmup early (main.py:271-277)
                warmup = epoch + 1
                self.cfg.warmup = warmup
                bad_epochs = 0
                best_loss = math.inf
                self.log(f"====> ending warmup early at epoch {epoch}")
            epoch += 1

        state.epoch = epoch
        self._history = dict(agg_hist)
        return state

    def _has_joint(self):
        return hasattr(self.model, "joint_encoder")

    def _joint_pool_path(self):
        """Shared joint-encoder pool at <experiments_dir>/joint_encoders/<exp>
        (main.py:79 — the same location skip_warmup loads and use_gen reads;
        shared across runs and days, NOT per-run). Falls back to a pool next
        to run_path when no experiments_dir was given (bare-run-path tests)."""
        import os

        exp = (self.cfg.experiment or "default").split("/")[-1]
        if self.experiments_dir:
            return os.path.join(self.experiments_dir, "joint_encoders", exp)
        base = os.path.dirname(self.run_path.rstrip("/")) if self.run_path else "."
        return os.path.join(base, "joint_encoders", exp)
