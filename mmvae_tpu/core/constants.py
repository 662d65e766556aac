"""Numerics spec shared across the framework.

The reference keeps these quirks scattered (bivae/utils.py:15-21 `Constants`,
joint_encoders.py:30/54 std parameterizations, laplace_vae.py:69 softmax-std
trick). We catalog them here because they are part of the public numeric
behavior we reproduce.
"""

import math

# Small epsilon added to every std parameterization (reference: utils.py:17).
ETA = 1e-6

LOG2 = math.log(2.0)
LOG2PI = math.log(2.0 * math.pi)

# Bernoulli probability clamp (torch clamps probs to open interval via logits;
# we clip explicitly).
BERNOULLI_EPS = 1e-7

# Heuristic memory budget used by the reference microbatch splitter
# (objectives.py:10-17). Kept for CPU-compat paths; on TPU we chunk over K
# with lax.map instead.
MICROBATCH_BUDGET = 1e8
