from . import constants, distributions, math  # noqa: F401
from .distributions import LocScale  # noqa: F401
