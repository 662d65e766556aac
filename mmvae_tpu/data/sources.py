"""Raw dataset readers (no torchvision in the TPU image).

Reads the same on-disk artifacts torchvision would produce/download:
- MNIST/FashionMNIST: IDX ubyte files (optionally .gz)
- SVHN: {train,test}_32x32.mat via scipy.io
- MedMNIST: the official .npz archives
Falls back to class-structured synthetic data (data/synthetic.py) when raw
files are absent, so every pipeline is runnable hermetically.
"""

from __future__ import annotations

import gzip
import os
from typing import Tuple

import numpy as np

from .synthetic import synthetic_labeled_images


def _open_maybe_gz(path: str):
    if os.path.exists(path):
        return open(path, "rb")
    if os.path.exists(path + ".gz"):
        return gzip.open(path + ".gz", "rb")
    raise FileNotFoundError(path)


def read_idx(path: str) -> np.ndarray:
    """MNIST IDX format reader."""
    with _open_maybe_gz(path) as f:
        data = f.read()
    magic = int.from_bytes(data[0:4], "big")
    ndim = magic & 0xFF
    dims = [int.from_bytes(data[4 + 4 * i: 8 + 4 * i], "big") for i in range(ndim)]
    return np.frombuffer(data, dtype=np.uint8, offset=4 + 4 * ndim).reshape(dims)


def _mnist_dir(data_path: str, fashion: bool) -> str:
    sub = "FashionMNIST" if fashion else "MNIST"
    for cand in [os.path.join(data_path, sub, "raw"), os.path.join(data_path, sub)]:
        if os.path.isdir(cand):
            return cand
    raise FileNotFoundError(f"no {sub} under {data_path}")


def load_mnist(data_path: str, train: bool, fashion: bool = False):
    """-> (images float32 (N,1,28,28) in [0,1], labels int64)."""
    d = _mnist_dir(data_path, fashion)
    split = "train" if train else "t10k"
    imgs = read_idx(os.path.join(d, f"{split}-images-idx3-ubyte"))
    labs = read_idx(os.path.join(d, f"{split}-labels-idx1-ubyte"))
    return (imgs[:, None].astype(np.float32) / 255.0, labs.astype(np.int64))


def load_svhn(data_path: str, train: bool):
    """-> (images float32 (N,3,32,32) in [0,1], labels int64 in [0,9])."""
    import scipy.io as sio

    split = "train" if train else "test"
    mat = sio.loadmat(os.path.join(data_path, f"{split}_32x32.mat"))
    x = mat["X"]  # (32,32,3,N)
    y = mat["y"].squeeze().astype(np.int64) % 10
    x = np.transpose(x, (3, 2, 0, 1)).astype(np.float32) / 255.0
    return x, y


def load_celeba(data_path: str, split: str):
    """Torchvision-layout CelebA reader (datasets.py:269-428).

    Layout under ``data_path/celeba/`` (the reference's modified
    torchvision CelebA, datasets.py:348-352,392-393):
    - ``list_eval_partition.txt``: ``<filename> <0|1|2>`` per line
      (train/val/test split map, datasets.py:340-346)
    - ``list_attr_celeba.txt``: count line, attr-name header line, then
      ``<filename> <40 x +-1>`` rows; values mapped to {0,1} via
      ``(attr + 1) // 2`` (datasets.py:361)
    - images: ``img_align_celeba/celeba_64x64/train/<stem>.png`` — the
      author's pre-resized 64x64 crops; NOTE the reference reads every
      split from the ``train`` subdirectory and swaps the extension to
      .png (datasets.py:392-393) — reproduced verbatim.

    -> (images float32 (N,3,64,64) in [0,1], attrs float32 (N,40) in {0,1}).
    """
    from PIL import Image

    root = os.path.join(data_path, "celeba")
    split_map = {"train": 0, "val": 1, "valid": 1, "test": 2}
    want = split_map[split]

    part_path = os.path.join(root, "list_eval_partition.txt")
    if not os.path.exists(part_path):
        raise FileNotFoundError(part_path)
    fnames = []
    with open(part_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 2 and int(parts[1]) == want:
                fnames.append(parts[0])

    attrs_by_name = {}
    with open(os.path.join(root, "list_attr_celeba.txt")) as f:
        lines = f.read().splitlines()
    # line 0: count, line 1: 40 attribute names, then data rows
    n_attrs = len(lines[1].split())
    for line in lines[2:]:
        parts = line.split()
        if len(parts) == n_attrs + 1:
            vals = np.array([int(v) for v in parts[1:]], dtype=np.int64)
            attrs_by_name[parts[0]] = (vals + 1) // 2

    imgs, attrs = [], []
    img_dir = os.path.join(root, "img_align_celeba", "celeba_64x64", "train")
    for name in fnames:
        png = os.path.splitext(name)[0] + ".png"
        with Image.open(os.path.join(img_dir, png)) as im:
            arr = np.asarray(im.convert("RGB"), dtype=np.uint8)
        imgs.append(np.transpose(arr, (2, 0, 1)))  # HWC -> CHW (ToTensor)
        attrs.append(attrs_by_name[name])
    x = np.stack(imgs).astype(np.float32) / 255.0
    return x, np.stack(attrs).astype(np.float32)


def load_medmnist(data_path: str, flag: str, split: str):
    """MedMNIST .npz reader (e.g. flag='pneumoniamnist')."""
    npz = np.load(os.path.join(data_path, f"{flag}.npz"))
    x = npz[f"{split}_images"]
    y = npz[f"{split}_labels"].squeeze().astype(np.int64)
    if x.ndim == 3:
        x = x[:, None]
    else:
        x = np.transpose(x, (0, 3, 1, 2))
    return x.astype(np.float32) / 255.0, y


def require_real() -> bool:
    """Strict mode: MMVAE_TPU_REQUIRE_REAL=1 forbids synthetic fallbacks —
    a missing/corrupt raw file becomes a hard error instead of silently
    swapping in stand-in data (scripts/real_data_repro.sh sets this)."""
    return os.environ.get("MMVAE_TPU_REQUIRE_REAL", "") not in ("", "0")


def load_or_synthesize(loader_fn, fallback_shape, n_fallback: int, seed: int,
                       proto_seed: int = None, difficulty: float = 0.0,
                       confound_max: float = None, fold: float = 0.0):
    """Try a raw loader; on FileNotFoundError return synthetic stand-ins.

    proto_seed (see synthetic_labeled_images): one value per synthetic
    MODALITY, shared by its train/test/val splits, so the splits draw
    from one class-prototype set while the per-sample noise still varies
    with `seed`. difficulty (0..1) controls class overlap / noise /
    intra-class variance of the stand-ins; confound_max (if set) overrides
    the difficulty-derived cross-class confound weight ceiling — values
    > 0.5 create genuinely ambiguous (Bayes-error) samples."""
    try:
        return loader_fn() + (True,)
    except (FileNotFoundError, OSError):
        if require_real():
            raise
        d = synthetic_labeled_images(n_fallback, fallback_shape, seed=seed,
                                     proto_seed=proto_seed,
                                     difficulty=difficulty,
                                     confound_max=confound_max, fold=fold)
        return d["images"], d["labels"], False
