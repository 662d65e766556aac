from .loop import Trainer, TrainerState  # noqa: F401
from .schedule import ReduceLROnPlateau, BetaKlSchedule  # noqa: F401
from . import checkpoints, freezing  # noqa: F401
