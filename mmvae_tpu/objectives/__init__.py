from .objectives import (  # noqa: F401
    ModelSpec, OBJECTIVES, CUSTOM_GRAD_OBJECTIVES, resolve, prior,
    recon_log_prob, recon_pointwise_loss,
)
from .objectives import *  # noqa: F401,F403
