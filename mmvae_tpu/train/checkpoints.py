"""Checkpoint save/load — flax msgpack serialization with the reference's
safety and layout semantics (utils.py:58-101):

- save_vars-style .old backup before overwrite
- model checkpoint + per-VAE + per-decoder + joint-encoder state
- a shared joint-encoder pool dir for skip_warmup reuse across runs
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict

import jax
from flax import serialization


def save_bytes(obj, filepath: str):
    """Safe save with .old backup (utils.py:58-66)."""
    if os.path.exists(filepath):
        shutil.copyfile(filepath, filepath + ".old")
    data = serialization.to_bytes(jax.tree.map(lambda x: jax.device_get(x), obj))
    with open(filepath, "wb") as f:
        f.write(data)


def load_bytes(template, filepath: str):
    with open(filepath, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_model(variables: Dict[str, Any], run_path: str, name: str = "model"):
    """model.msgpack plus per-submodule exports (utils.py:69-81)."""
    os.makedirs(run_path, exist_ok=True)
    save_bytes(variables, os.path.join(run_path, f"{name}.msgpack"))
    params = variables.get("params", {})
    for key in params:
        if key.startswith("vaes_"):
            save_bytes(params[key], os.path.join(run_path, f"{name}_{key}.msgpack"))
            if "decoder" in params[key]:
                save_bytes(
                    params[key]["decoder"],
                    os.path.join(run_path, f"{name}_{key}_decoder.msgpack"),
                )
    if "joint_encoder" in params:
        save_bytes(
            params["joint_encoder"],
            os.path.join(run_path, f"{name}_joint_encoder.msgpack"),
        )


def save_joint_vae(variables: Dict[str, Any], pool_path: str):
    """Publish joint encoder + decoders to the shared pool
    (utils.py:92-101, main.py:255-261)."""
    os.makedirs(os.path.join(pool_path, "old"), exist_ok=True)
    params = variables["params"]

    def publish(obj, fname):
        dst = os.path.join(pool_path, fname)
        if os.path.exists(dst):
            os.replace(dst, os.path.join(pool_path, "old", fname))
        save_bytes(obj, dst)

    publish(params["joint_encoder"], "model_joint_encoder.msgpack")
    for key in params:
        if key.startswith("vaes_") and "decoder" in params[key]:
            publish(params[key]["decoder"], f"model_{key}_decoder.msgpack")


def load_joint_vae(variables: Dict[str, Any], pool_path: str):
    """skip_warmup warm start (utils.py:84-90): load joint encoder and
    decoders from the pool into a fresh variables tree."""
    params = dict(variables["params"])
    # models without a joint encoder (MMVAE/MVAE families) have nothing to
    # warm-start from the pool — treat like a missing pool so skip_warmup
    # falls back to training from scratch (use_gen data append still applies)
    if "joint_encoder" not in params:
        raise FileNotFoundError(f"no joint encoder in model for pool {pool_path}")
    params["joint_encoder"] = load_bytes(
        params["joint_encoder"], os.path.join(pool_path, "model_joint_encoder.msgpack")
    )
    for key in list(params):
        if key.startswith("vaes_") and "decoder" in params[key]:
            sub = dict(params[key])
            sub["decoder"] = load_bytes(
                sub["decoder"], os.path.join(pool_path, f"model_{key}_decoder.msgpack")
            )
            params[key] = sub
    out = dict(variables)
    out["params"] = params
    return out
