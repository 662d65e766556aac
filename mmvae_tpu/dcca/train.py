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
        variables = self.model.init({"params": key},
                                    [jnp.asarray(x) for x in sample_xs])
        return variables, self.tx.init(variables["params"])

    def _loss(self, outs):
        pair = cca_loss_chol if self.backend == "chol" else cca_loss
        multi = mcca_loss_chol if self.backend == "chol" else mcca_loss
        if len(outs) == 2:
            return pair(outs[0], outs[1], self.outdim, self.use_all)
        return multi(outs, self.outdim, self.use_all)

    def make_step(self):
        model, tx = self.model, self.tx

        @jax.jit
        def step(variables, opt_state, xs):
            def lf(p):
                outs = model.apply({**variables, "params": p}, xs)
                return self._loss(outs)

            loss, grads = jax.value_and_grad(lf)(variables["params"])
            updates, opt_state = tx.update(grads, opt_state, variables["params"])
            params = optax.apply_updates(variables["params"], updates)
            return {**variables, "params": params}, opt_state, loss

        return step

    def fit(self, train_loader, val_loader=None, epochs: int = 20,
            key=None, log=print, early_stop: int = 10):
        """Solver.fit (main_mnist_svhn.py:42-106): epoch loop + early stop on
        val loss, then linear CCA on full-train deep features."""
        key = key if key is not None else jax.random.PRNGKey(0)
        sample_xs, _ = next(iter(train_loader))
        variables, opt_state = self.init(sample_xs, key)
        step = self.make_step()

        @jax.jit
        def infer(variables, xs):
            return self.model.apply(variables, xs)

        best_val, bad, best_vars = np.inf, 0, variables
        for epoch in range(epochs):
            losses = []
            for xs, _ in train_loader:
                variables, opt_state, loss = step(
                    variables, opt_state, [jnp.asarray(x) for x in xs])
                losses.append(float(loss))
            msg = f"DCCA epoch {epoch + 1}/{epochs} train {np.mean(losses):.4f}"
            if val_loader is not None:
                vl = []
                for xs, _ in val_loader:
                    outs = infer(variables, [jnp.asarray(x) for x in xs])
                    vl.append(float(self._loss(outs)))
                val_loss = float(np.mean(vl))
                msg += f" val {val_loss:.4f}"
                if val_loss < best_val:
                    best_val, bad, best_vars = val_loss, 0, variables
                else:
                    bad += 1
            log(msg)
            if bad >= early_stop:
                break
        self.variables = best_vars if val_loader is not None else variables

        # linear CCA on full-train deep features (main_mnist_svhn.py:98-100)
        feats: List[List[np.ndarray]] = None
        for xs, _ in train_loader:
            outs = infer(self.variables, [jnp.asarray(x) for x in xs])
            if feats is None:
                feats = [[] for _ in outs]
            for i, o in enumerate(outs):
                feats[i].append(np.asarray(o))
        feats = [np.concatenate(f) for f in feats]
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
