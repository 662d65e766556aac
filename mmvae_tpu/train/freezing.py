"""Phase-based parameter freezing.

The reference freezes modules by toggling requires_grad_ inside the
objective (objectives.py:180-183) and rebuilding the optimizer at the
warmup boundary filtering frozen params (main.py:241-245). The functional
equivalent: a boolean mask over the param pytree fed to optax.masked —
masked params receive zero updates and hold no optimizer slots.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import optax


def path_mask(params, frozen_prefixes: Sequence[str]):
    """True = trainable. A param is frozen iff its '/'-joined path contains
    any of the given substrings (e.g. 'joint_encoder', 'decoder',
    'first_encoder')."""

    def trainable(path, _):
        s = "/".join(str(getattr(k, "key", k)) for k in path)
        return not any(f in s for f in frozen_prefixes)

    return jax.tree_util.tree_map_with_path(trainable, params)


# objectives that toggle requires_grad_ in the reference; all others train
# every parameter regardless of the fix_* flags (the toggles live inside
# m_jmvae_nf / m_telbo_nf / m_jmvae only — objectives.py:161-162, 180-183,
# 225-227)
FREEZING_OBJECTIVES = {"m_jmvae_nf", "m_telbo_nf", "m_jmvae"}


def frozen_prefixes_for_phase(obj_name: str, past_warmup: bool,
                              fix_jencoder: bool, fix_decoders: bool,
                              always_frozen=("first_encoder",)):
    """Which submodule paths are frozen in the current phase
    (objectives.py:180-183; TwoStepsEncoder trunk always frozen,
    encoders.py:198)."""
    frozen = list(always_frozen)
    if past_warmup and obj_name in FREEZING_OBJECTIVES:
        if obj_name == "m_jmvae":
            # m_jmvae unconditionally freezes the joint encoder past warmup
            frozen.append("joint_encoder")
        else:
            if fix_jencoder:
                frozen.append("joint_encoder")
            if fix_decoders:
                frozen.append("decoder")
    return tuple(frozen)


def masked_optimizer(tx: optax.GradientTransformation, params, frozen_prefixes):
    """Apply tx to trainable params and set_to_zero to frozen ones.

    NOTE: optax.masked alone is wrong here — masked-out leaves pass their raw
    gradient through as the update. multi_transform routes frozen leaves to
    set_to_zero, reproducing requires_grad=False semantics exactly."""
    mask = path_mask(params, frozen_prefixes)
    labels = jax.tree.map(lambda t: "train" if t else "freeze", mask)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )
