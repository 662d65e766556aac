from .objectives import cca_loss, cca_corr, mcca_loss  # noqa: F401
from .linear_cca import LinearCCA  # noqa: F401
from .nets import LCCAWrappedEncoder, DeepCCA, identity_lcca  # noqa: F401
