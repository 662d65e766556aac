from . import pairing, sources, synthetic  # noqa: F401
from .loaders import (  # noqa: F401
    ArrayLoader, PairedDataset, get_dataloaders, torch_split_indices, DATASETS,
)
