from .vae import UnimodalVAE, gaussian_log_q_z0  # noqa: F401
from .mmvae import MMVAE  # noqa: F401
from .mmvae_nf import MMVAE_NF  # noqa: F401
from .jmvae_nf import JMVAE_NF  # noqa: F401
from .mvae import MVAE  # noqa: F401
from .moepoe import MOEPOE  # noqa: F401
from .poe import poe, poe_for_all_subsets, mixture_component_selection  # noqa: F401
