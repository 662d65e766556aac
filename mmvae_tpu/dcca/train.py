"""DCCA Solver — rebuild of dcca/trainings/main_*.py Solver (RMSprop on
-corr, early stop 10, then closed-form linear CCA on full-train deep
features, artifact export).

The reference trains in float64 (main_mnist_svhn.py:20); TPU eigh is
float32, so the CCA loss keeps the reference's ridge (1e-3) plus an eps
floor. Artifacts: an npz holding encoder params (msgpack bytes) + the
linear-CCA m/w/D arrays — the equivalent of model{1,2}.pt + l_cca_{w,m,D}.npy
(main_mnist_svhn.py:204-208).
"""

from __future__ import annotations

import os
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from .linear_cca import LinearCCA
from .nets import DeepCCA
from .objectives import cca_loss, cca_loss_chol, mcca_loss, mcca_loss_chol


class Solver:
    def __init__(self, encoders: Sequence, outdim_size: int,
                 learning_rate: float = 1e-3, reg_par: float = 1e-5,
                 use_all_singular_values: bool = False,
                 backend: str = "eigh"):
        """backend: 'eigh' = reference-exact loss (float64-CPU oracle);
        'chol' = Cholesky-whitening + custom singular-value VJP — the
        TPU-native path (no eigh gradient in the compiled program)."""
        self.model = DeepCCA(encoders=encoders)
        self.outdim = outdim_size
        self.use_all = use_all_singular_values
        self.backend = backend
        self.tx = optax.chain(
            optax.add_decayed_weights(reg_par),  # RMSprop weight_decay
            optax.rmsprop(learning_rate),
        )

    def init(self, sample_xs, key):
        # jitted: an eager flax init dispatches per-op over the remote tunnel
        init = jax.jit(lambda k, xs: self.model.init({"params": k}, xs))
        variables = init(key, [jnp.asarray(x[:2]) for x in sample_xs])
        return variables, self.tx.init(variables["params"])

    def _loss(self, outs):
        pair = cca_loss_chol if self.backend == "chol" else cca_loss
        multi = mcca_loss_chol if self.backend == "chol" else mcca_loss
        if len(outs) == 2:
            return pair(outs[0], outs[1], self.outdim, self.use_all)
        return multi(outs, self.outdim, self.use_all)

    def fit(self, train_loader, val_loader=None, epochs: int = 20,
            key=None, log=print, early_stop: int = 10):
        """Solver.fit (main_mnist_svhn.py:42-106): epoch loop + early stop on
        val loss, then linear CCA on full-train deep features.

        Device-resident like the main train loop: the dataset stages on
        device ONCE (deduplicated base arrays + pairing tables,
        device_pipeline.from_array_loader), every step is the identical
        compiled program on a counter-indexed slice of the epoch's
        pre-staged index batches, and losses accumulate on device with one
        sync per epoch — per-batch `jnp.asarray` uploads and per-step
        `float(loss)` syncs each serialize the dispatch queue through the
        remote tunnel (docs/BENCH_NOTES.md)."""
        from ..data.device_pipeline import from_array_loader

        key = key if key is not None else jax.random.PRNGKey(0)
        sample_xs, _ = next(iter(train_loader))
        variables, opt_state = self.init(sample_xs, key)
        # gradient steps use full batches only (the pipeline drops a ragged
        # tail): the CCA objective estimates a within-batch covariance, and
        # a small tail batch gives an ill-conditioned/singular estimate.
        # The LCCA fit below still sees every training example.
        pipeline = from_array_loader(train_loader)
        if len(pipeline) == 0:
            raise ValueError(
                f"DCCA train split ({pipeline.num_examples} examples) is "
                f"smaller than one batch ({pipeline.batch_size}); lower "
                "--batch-size")
        gather = pipeline.gather_fn()
        model, tx, _loss = self.model, self.tx, self._loss

        @jax.jit
        def cstep(variables, opt_state, data_state, rows_all, counter):
            rows = jax.lax.dynamic_index_in_dim(rows_all, counter, 0,
                                                keepdims=False)
            xs = gather(rows, data_state)

            def lf(p):
                return _loss(model.apply({**variables, "params": p}, xs))

            loss, grads = jax.value_and_grad(lf)(variables["params"])
            updates, opt_state = tx.update(grads, opt_state,
                                           variables["params"])
            params = optax.apply_updates(variables["params"], updates)
            return ({**variables, "params": params}, opt_state, counter + 1,
                    loss)

        val_pipe = None
        if val_loader is not None:
            vp = from_array_loader(val_loader, shuffle=False)
            v_batches = list(vp.epoch_index_batches())
            if not v_batches:
                # val split smaller than one batch: train without early stop
                print("DCCA: val split < one batch; no validation")
            else:
                val_pipe = vp
                vgather = val_pipe.gather_fn()

                @jax.jit
                def vstep(variables, data_state, rows_all, counter):
                    rows = jax.lax.dynamic_index_in_dim(rows_all, counter, 0,
                                                        keepdims=False)
                    return _loss(model.apply(variables,
                                             vgather(rows, data_state)))

                val_rows = jnp.asarray(np.stack(v_batches))

        best_val, bad, best_vars = np.inf, 0, variables
        for epoch in range(epochs):
            rows_dev = jnp.asarray(
                np.stack(list(pipeline.epoch_index_batches())))
            counter, losses = jnp.int32(0), []
            for _ in range(rows_dev.shape[0]):
                variables, opt_state, counter, loss = cstep(
                    variables, opt_state, pipeline.data_state, rows_dev,
                    counter)
                losses.append(loss)
            train_loss = float(jnp.mean(jnp.stack(losses)))
            msg = f"DCCA epoch {epoch + 1}/{epochs} train {train_loss:.4f}"
            if val_pipe is not None:
                vl = [vstep(variables, val_pipe.data_state, val_rows,
                            jnp.int32(i))
                      for i in range(val_rows.shape[0])]
                val_loss = float(jnp.mean(jnp.stack(vl)))
                msg += f" val {val_loss:.4f}"
                if val_loss < best_val:
                    best_val, bad, best_vars = val_loss, 0, variables
                else:
                    bad += 1
            log(msg)
            if bad >= early_stop:
                break
        # restore the early-stop winner only when validation actually ran
        # (val_pipe, not val_loader: a sub-batch val split trains through)
        self.variables = best_vars if val_pipe is not None else variables

        # linear CCA on full-train deep features (main_mnist_svhn.py:98-100);
        # sequential (unshuffled) rows padded to a full final batch, features
        # trimmed back to n — one host sync for the whole pass
        n = pipeline.num_examples
        b = pipeline.batch_size
        order = np.arange(-(-n // b) * b, dtype=np.int32) % n
        feat_rows = jnp.asarray(order.reshape(-1, b))

        @jax.jit
        def fstep(variables, data_state, rows_all, counter):
            rows = jax.lax.dynamic_index_in_dim(rows_all, counter, 0,
                                                keepdims=False)
            return model.apply(variables, gather(rows, data_state))

        chunks = [fstep(self.variables, pipeline.data_state, feat_rows,
                        jnp.int32(i))
                  for i in range(feat_rows.shape[0])]
        chunks = jax.device_get(chunks)
        feats = [np.concatenate([c[v] for c in chunks])[:n]
                 for v in range(len(chunks[0]))]
        self.lcca = LinearCCA()
        self.lcca.fit(feats[0], feats[1], self.outdim)
        return self

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(
            path,
            params=np.frombuffer(serialization.to_bytes(
                jax.device_get(self.variables)), dtype=np.uint8),
            m0=self.lcca.m[0], m1=self.lcca.m[1],
            w0=self.lcca.w[0], w1=self.lcca.w[1],
            D=self.lcca.D,
        )


def load_artifacts(path: str, template_variables):
    """-> (variables, (m_list, w_list)) for registry._dcca_pair."""
    npz = np.load(path)
    variables = serialization.from_bytes(
        template_variables, npz["params"].tobytes())
    m_list = [npz["m0"], npz["m1"]]
    w_list = [npz["w0"], npz["w1"]]
    return variables, (m_list, w_list)
