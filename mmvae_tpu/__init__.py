"""mmvae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multimodal-VAE framework.

A from-scratch rebuild of the capabilities of the `bivae` reference package
(multimodal variational autoencoders: MMVAE, MMVAE-NF, JMVAE(-NF)(-DCCA),
MVAE, MoE-PoE, TELBO) designed TPU-first:

- pure-functional distributions and objectives (no stateful hooks),
- `vmap` over the IWAE K axis instead of input replication,
- `lax.scan` / Pallas kernels for autoregressive flows,
- `jax.sharding.Mesh` + NamedSharding data/K parallelism,
- optax/orbax training with explicit phase-based parameter freezing.

Reference behavior is documented per-module with `file:line` citations into
the reference repo (see each docstring).
"""

__version__ = "0.1.0"
