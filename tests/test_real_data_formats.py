"""Byte-accurate raw-format verification for data/sources.py.

Every reader is pinned against hand-crafted fixture bytes that follow the
published format specs the reference's data contract assumes
(/root/reference/src/bivae/dataloaders.py:239-290 torchvision semantics,
bin/make-mnist-svhn-idx.py:26-47 SVHN label handling,
/root/reference/src/bivae/datasets.py:348-393 CelebA layout, MedMNIST npz
keys) — NOT merely against our own writer, so a writer/reader bug pair
cannot cancel out.
"""

import gzip
import os

import numpy as np
import pytest

from mmvae_tpu.data import make_real_layout, sources


# ---------------------------------------------------------------------------
# IDX (MNIST / FashionMNIST)
# ---------------------------------------------------------------------------

def _handcrafted_idx_images(path):
    """2 images of 3x2, byte-level per the IDX spec: magic 0x00000803,
    big-endian uint32 dims, row-major uint8 payload."""
    payload = bytes(range(12))  # pixels 0..11
    raw = (b"\x00\x00\x08\x03"            # magic: ubyte, 3 dims
           + (2).to_bytes(4, "big")       # N
           + (3).to_bytes(4, "big")       # rows
           + (2).to_bytes(4, "big")       # cols
           + payload)
    with open(path, "wb") as f:
        f.write(raw)
    return np.frombuffer(payload, np.uint8).reshape(2, 3, 2)


def test_read_idx_handcrafted_bytes(tmp_path):
    p = str(tmp_path / "imgs-idx3-ubyte")
    want = _handcrafted_idx_images(p)
    got = sources.read_idx(p)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_read_idx_gzip_variant(tmp_path):
    p = str(tmp_path / "imgs-idx3-ubyte")
    want = _handcrafted_idx_images(p)
    with open(p, "rb") as f:
        raw = f.read()
    os.remove(p)
    with gzip.open(p + ".gz", "wb") as f:
        f.write(raw)
    np.testing.assert_array_equal(sources.read_idx(p), want)


def test_read_idx_labels_magic(tmp_path):
    p = str(tmp_path / "labs-idx1-ubyte")
    with open(p, "wb") as f:
        f.write(b"\x00\x00\x08\x01" + (4).to_bytes(4, "big") + bytes([7, 0, 9, 3]))
    np.testing.assert_array_equal(sources.read_idx(p), [7, 0, 9, 3])


def test_load_mnist_semantics(tmp_path):
    """load_mnist must match torchvision MNIST+ToTensor: float32 in [0,1]
    (pixel/255), shape (N,1,28,28), int64 labels, t10k test naming."""
    d = tmp_path / "MNIST" / "raw"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for split, n in [("train", 5), ("t10k", 3)]:
        imgs = rng.integers(0, 256, size=(n, 28, 28), dtype=np.uint8)
        labs = rng.integers(0, 10, size=n, dtype=np.uint8)
        make_real_layout.write_idx(str(d / f"{split}-images-idx3-ubyte"), imgs)
        make_real_layout.write_idx(str(d / f"{split}-labels-idx1-ubyte"), labs)
        x, y = sources.load_mnist(str(tmp_path), split == "train")
        assert x.shape == (n, 1, 28, 28) and x.dtype == np.float32
        assert y.dtype == np.int64
        np.testing.assert_allclose(x[:, 0], imgs.astype(np.float32) / 255.0)
        np.testing.assert_array_equal(y, labs)


# ---------------------------------------------------------------------------
# SVHN .mat
# ---------------------------------------------------------------------------

def test_load_svhn_transpose_and_label_remap(tmp_path):
    """Pin the (H,W,C,N)->(N,C,H,W) transpose with asymmetric values and
    the torchvision label semantics: stored 1..10 with 10 == digit 0
    (bin/make-mnist-svhn-idx.py:31-33 applies % 10)."""
    import scipy.io as sio

    n = 4
    x = np.zeros((32, 32, 3, n), dtype=np.uint8)
    # distinct value per (h,w,c,n) corner so any transpose mistake shows
    marks = {(0, 0, 0, 0): 10, (0, 1, 0, 0): 20, (1, 0, 0, 0): 30,
             (0, 0, 1, 0): 40, (0, 0, 0, 1): 50, (31, 31, 2, 3): 60}
    for (h, w, c, i), v in marks.items():
        x[h, w, c, i] = v
    y = np.array([[10], [1], [9], [10]], dtype=np.uint8)  # 10 == "0"
    sio.savemat(str(tmp_path / "train_32x32.mat"), {"X": x, "y": y})

    got_x, got_y = sources.load_svhn(str(tmp_path), train=True)
    assert got_x.shape == (n, 3, 32, 32) and got_x.dtype == np.float32
    for (h, w, c, i), v in marks.items():
        assert got_x[i, c, h, w] == pytest.approx(v / 255.0), (h, w, c, i)
    np.testing.assert_array_equal(got_y, [0, 1, 9, 0])
    assert got_y.dtype == np.int64


# ---------------------------------------------------------------------------
# MedMNIST npz
# ---------------------------------------------------------------------------

def test_load_medmnist_gray_and_rgb(tmp_path):
    rng = np.random.default_rng(1)
    gray = rng.integers(0, 256, size=(6, 28, 28), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(4, 28, 28, 3), dtype=np.uint8)
    np.savez(str(tmp_path / "pneumoniamnist.npz"),
             train_images=gray, train_labels=rng.integers(0, 2, (6, 1)).astype(np.uint8),
             val_images=gray[:2], val_labels=np.zeros((2, 1), np.uint8),
             test_images=gray[:3], test_labels=np.ones((3, 1), np.uint8))
    np.savez(str(tmp_path / "bloodmnist.npz"),
             train_images=rgb, train_labels=np.arange(4).reshape(-1, 1).astype(np.uint8),
             val_images=rgb[:1], val_labels=np.zeros((1, 1), np.uint8),
             test_images=rgb[:2], test_labels=np.zeros((2, 1), np.uint8))

    x, y = sources.load_medmnist(str(tmp_path), "pneumoniamnist", "train")
    assert x.shape == (6, 1, 28, 28)
    np.testing.assert_allclose(x[:, 0], gray.astype(np.float32) / 255.0)
    assert y.shape == (6,) and y.dtype == np.int64  # (N,1) squeezed

    x, y = sources.load_medmnist(str(tmp_path), "bloodmnist", "train")
    assert x.shape == (4, 3, 28, 28)  # HWC -> CHW
    np.testing.assert_allclose(x, np.transpose(rgb, (0, 3, 1, 2)) / 255.0)
    np.testing.assert_array_equal(y, [0, 1, 2, 3])

    x, y = sources.load_medmnist(str(tmp_path), "bloodmnist", "test")
    assert x.shape == (2, 3, 28, 28)


# ---------------------------------------------------------------------------
# CelebA torchvision layout
# ---------------------------------------------------------------------------

def test_load_celeba_layout(tmp_path):
    """Pin partition masking, the +-1 -> {0,1} attr mapping
    (datasets.py:361), the .jpg -> .png stem swap and the every-split-
    reads-train-subdir quirk (datasets.py:392-393), and lossless PNG
    pixel round-trip in CHW float [0,1]."""
    from PIL import Image

    root = tmp_path / "celeba"
    img_dir = root / "img_align_celeba" / "celeba_64x64" / "train"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(2)
    n = 5
    imgs = rng.integers(0, 256, size=(n, 64, 64, 3), dtype=np.uint8)
    attrs_pm1 = rng.choice([-1, 1], size=(n, 40))
    names = [f"{i + 1:06d}.jpg" for i in range(n)]
    part = [0, 0, 1, 2, 2]
    with open(root / "list_eval_partition.txt", "w") as f:
        for nm, p in zip(names, part):
            f.write(f"{nm} {p}\n")
    with open(root / "list_attr_celeba.txt", "w") as f:
        f.write(f"{n}\n" + " ".join(f"A{i}" for i in range(40)) + "\n")
        for nm, row in zip(names, attrs_pm1):
            f.write(nm + " " + " ".join(map(str, row)) + "\n")
    for nm, img in zip(names, imgs):
        Image.fromarray(img).save(img_dir / (nm.split(".")[0] + ".png"))

    for split, rows in [("train", [0, 1]), ("val", [2]), ("valid", [2]),
                        ("test", [3, 4])]:
        x, a = sources.load_celeba(str(tmp_path), split)
        assert x.shape == (len(rows), 3, 64, 64) and x.dtype == np.float32
        np.testing.assert_allclose(
            x, np.transpose(imgs[rows], (0, 3, 1, 2)).astype(np.float32) / 255.0)
        np.testing.assert_array_equal(a, (attrs_pm1[rows] + 1) // 2)


# ---------------------------------------------------------------------------
# Full layout -> loaders, strict no-fallback mode
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def layout(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("realdata"))
    make_real_layout.build_layout(out, n=256)
    return out


def test_require_real_raises_on_missing(tmp_path, monkeypatch):
    monkeypatch.setenv("MMVAE_TPU_REQUIRE_REAL", "1")
    with pytest.raises((FileNotFoundError, OSError)):
        sources.load_or_synthesize(
            lambda: sources.load_mnist(str(tmp_path), True), (1, 28, 28), 8, 0)


@pytest.mark.parametrize("name", ["mnist_svhn", "mnist_fashion", "medmnist",
                                  "chest_svhn", "celeba", "mnist_contour",
                                  "mnist_svhn_fashion", "binary_mnist_svhn"])
def test_loaders_off_real_layout_no_fallback(layout, name, monkeypatch):
    """Every raw-file-backed dataset builds off the real-format layout with
    synthetic fallback forbidden, pairs class-matched labels, and yields
    reference-shaped batches."""
    from mmvae_tpu.data import get_dataloaders

    monkeypatch.setenv("MMVAE_TPU_REQUIRE_REAL", "1")
    train, test, val = get_dataloaders(name, data_path=layout, batch_size=16)
    xs, labs = next(iter(train))
    assert all(len(x) == 16 for x in xs)
    for x in xs:
        x = np.asarray(x)
        assert x.dtype == np.float32
        assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0
    if name in ("mnist_svhn", "mnist_svhn_fashion", "binary_mnist_svhn"):
        # class-matched pairing: labels agree across modalities
        for lab in labs[1:]:
            np.testing.assert_array_equal(np.asarray(labs[0]), np.asarray(lab))
    assert len(val.dataset) > 0 and len(test.dataset) > 0
