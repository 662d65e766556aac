"""Data layer: pairing determinism, split reproducibility, builder
semantics, native gather correctness, transforms."""

import numpy as np
import pytest

from mmvae_tpu.data import get_dataloaders, pairing, synthetic, torch_split_indices
from mmvae_tpu.data.transforms import binarize, canny_contour
from mmvae_tpu.native import fast_gather, gather_u8_to_f32


def test_rand_match_on_idx_class_matched():
    rng = np.random.default_rng(0)
    l1 = rng.integers(0, 5, 500)
    l2 = rng.integers(0, 5, 600)
    i1, i2 = pairing.rand_match_on_idx([l1, l2], max_d=50, dm=3, seed=0)
    assert len(i1) == len(i2)
    # pairing must be class-matched (make-mnist-svhn-idx.py semantics)
    np.testing.assert_array_equal(l1[i1], l2[i2])
    # deterministic
    j1, j2 = pairing.rand_match_on_idx([l1, l2], max_d=50, dm=3, seed=0)
    np.testing.assert_array_equal(i1, j1)


def test_rand_match_trimodal():
    rng = np.random.default_rng(1)
    ls = [rng.integers(0, 3, n) for n in (200, 300, 250)]
    idx = pairing.rand_match_on_idx(ls, max_d=40, dm=2, seed=1)
    assert len(idx) == 3
    np.testing.assert_array_equal(ls[0][idx[0]], ls[1][idx[1]])
    np.testing.assert_array_equal(ls[0][idx[0]], ls[2][idx[2]])


def test_correspondence_pairing():
    rng = np.random.default_rng(2)
    l1 = rng.integers(0, 3, 400)
    l2 = rng.integers(0, 10, 500)
    i1, i2 = pairing.rand_match_on_correspondence(
        l1, l2, pairing.MNIST_FASHION_CORRESPONDENCE, max_d=30, dm=2, seed=0)
    corr = pairing.MNIST_FASHION_CORRESPONDENCE
    for a, b in zip(l1[i1], l2[i2]):
        assert b in corr[a]


def test_medmnist_remap():
    labels = np.array([0, 1, 2, 6, 1, 6, 3])
    keep, new = pairing.remap_medmnist_blood_labels(labels)
    np.testing.assert_array_equal(labels[keep], [1, 6, 1, 6])
    np.testing.assert_array_equal(new, [0, 1, 0, 1])


def test_torch_split_deterministic():
    a = torch_split_indices(100, [70, 30], seed=42)
    b = torch_split_indices(100, [70, 30], seed=42)
    np.testing.assert_array_equal(a[0], b[0])
    assert len(set(a[0]) | set(a[1])) == 100


def test_circles_squares_builder():
    d = synthetic.make_circles_squares(dataset_size=20, n_repeat=2, seed=0)
    assert d["squares_train"].shape[1:] == (1, 32, 32)
    # label 1 = full shapes: full discs have larger lit area than rings
    full = d["circles_train"][d["labels_train"] == 1]
    empty = d["circles_train"][d["labels_train"] == 0]
    assert full.mean() > empty.mean()
    # radii recorded per pair
    assert len(d["r_circles_train"]) == len(d["circles_train"])


def test_loaders_shapes_and_determinism():
    t1, te1, v1 = get_dataloaders("circles_squares", batch_size=16,
                                  dataset_size=20, n_repeat=2)
    t2, te2, v2 = get_dataloaders("circles_squares", batch_size=16,
                                  dataset_size=20, n_repeat=2)
    np.testing.assert_array_equal(v1.dataset.modalities[0], v2.dataset.modalities[0])
    xs, labs = next(iter(te1))
    assert xs[0].shape[1:] == xs[1].shape[1:] == (1, 32, 32)


def test_mnist_svhn_synthetic_pipeline():
    train, test, val = get_dataloaders("mnist_svhn", batch_size=32, synthetic_n=256)
    xs, labs = next(iter(train))
    assert xs[0].shape == (32, 1, 28, 28) and xs[1].shape == (32, 3, 32, 32)
    # paired labels must agree (class-matched pairing)
    np.testing.assert_array_equal(labs[0], labs[1])


def test_native_gather_matches_numpy():
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(100, 7)).astype(np.float32)
    idx = rng.integers(0, 100, 333)
    np.testing.assert_array_equal(fast_gather(arr, idx), arr[idx])
    u8 = (rng.uniform(size=(50, 4, 5)) * 255).astype(np.uint8)
    got = gather_u8_to_f32(u8, idx % 50)
    np.testing.assert_allclose(got, u8[idx % 50].astype(np.float32) / 255.0,
                               rtol=1e-6)


def test_transforms():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(3, 1, 28, 28)).astype(np.float32)
    b = binarize(img)
    assert set(np.unique(b)) <= {0.0, 1.0}
    c = canny_contour(img)
    assert c.shape == img.shape and set(np.unique(c)) <= {0.0, 1.0}


def test_synthetic_splits_share_class_prototypes():
    """Train and test splits of a synthetic modality must draw from the SAME
    class prototypes (proto_seed) — otherwise the test set is a different
    distribution than the model trained on and coherence metrics collapse to
    chance (caught live: flagship validate scored acc ~= 0.1)."""
    # celeba modality 1 is the 40-attr vector — i.i.d. Bernoulli noise with
    # one informative bit, identical across splits by construction, so the
    # prototype-distance check only applies to its image modality
    for name, mods in [("mnist_svhn", (0, 1)), ("mnist_oasis", (0, 1)),
                       ("celeba", (0,))]:
        train, test, _ = get_dataloaders(name, batch_size=16, synthetic_n=256)
        for m in mods:
            tr_im = np.asarray(train.dataset.modalities[m], np.float32)
            te_im = np.asarray(test.dataset.modalities[m], np.float32)
            tr_lab = np.asarray(train.dataset.labels[m])
            te_lab = np.asarray(test.dataset.labels[m])
            classes = [c for c in np.unique(tr_lab)[:3] if (te_lab == c).any()]
            assert classes
            for c in classes:
                mu_tr = tr_im[tr_lab == c].mean(0).ravel()
                mu_te = te_im[te_lab == c].mean(0).ravel()
                d_same = np.linalg.norm(mu_tr - mu_te)
                d_diff = min(
                    np.linalg.norm(tr_im[tr_lab == o].mean(0).ravel() - mu_te)
                    for o in classes if o != c
                ) if len(classes) > 1 else np.inf
                assert d_same < 0.5 * d_diff, (
                    f"{name} modality {m} class {c}: train/test prototype "
                    f"distance {d_same:.3f} vs cross-class {d_diff:.3f}")


def test_chest_svhn_restricts_svhn_to_binary_digits():
    """make-chest-svhn.py:11-19: pairing iterates the pneumonia labels'
    unique set {0,1}, so the paired SVHN subset contains ONLY digits 0/1
    with their TRUE digit labels (the 10-class classifier scores them) —
    not a >4 binarization."""
    train, test, val = get_dataloaders("chest_svhn", batch_size=32,
                                       synthetic_n=512)
    ds = train.dataset
    c_lab, s_lab = ds.labels
    assert set(np.unique(c_lab)) <= {0, 1}
    assert set(np.unique(s_lab)) <= {0, 1}
    np.testing.assert_array_equal(c_lab, s_lab)  # class-matched pairs


def test_confound_max_knob():
    """Hard-grid calibration knob (docs/QUALITY.md "confound_max
    calibration"): confound_max > 0.5 creates samples dominated by the
    WRONG class's prototype; confound_max=None keeps the difficulty-derived
    default; difficulty=0 data stays bit-identical to the legacy path."""
    from mmvae_tpu.data.synthetic import synthetic_labeled_images

    easy = synthetic_labeled_images(64, (1, 8, 8), seed=3, difficulty=0.0)
    easy2 = synthetic_labeled_images(64, (1, 8, 8), seed=3, difficulty=0.0,
                                     confound_max=None)
    np.testing.assert_array_equal(easy["images"], easy2["images"])

    hard_default = synthetic_labeled_images(256, (1, 8, 8), seed=3,
                                            difficulty=0.55)
    hard_07 = synthetic_labeled_images(256, (1, 8, 8), seed=3,
                                       difficulty=0.55, confound_max=0.7)
    # the override must change the data (0.7 != 0.9*0.55)
    assert np.abs(hard_default["images"] - hard_07["images"]).max() > 1e-3
    # labels/noise streams are shared: same labels either way
    np.testing.assert_array_equal(hard_default["labels"], hard_07["labels"])

    # n_classes=1 edge: no "other" class to confound with — must not raise
    one = synthetic_labeled_images(16, (1, 8, 8), n_classes=1, seed=0,
                                   difficulty=0.8)
    assert one["images"].shape == (16, 1, 8, 8)

    # loader pass-through: mnist_svhn forwards confound_max to the
    # stand-in generator (configs forward extra keys by signature)
    tr_a, _, _ = get_dataloaders("mnist_svhn", batch_size=16,
                                 synthetic_n=128, difficulty=0.55)
    tr_b, _, _ = get_dataloaders("mnist_svhn", batch_size=16,
                                 synthetic_n=128, difficulty=0.55,
                                 confound_max=0.7)
    a = np.asarray(tr_a.dataset.modalities[0][:8])
    b = np.asarray(tr_b.dataset.modalities[0][:8])
    assert np.abs(a - b).max() > 1e-3


def test_fold_knob():
    """Non-convex sin-fold knob (r5, VERDICT r4 missing#1; rebuilds the
    regime of /root/reference/tests/ablation_n_made.py:8-13): fold=0 is
    bit-identical to omitting the argument (legacy data unchanged), and
    fold>0 reuses the same label/style/noise streams so the ONLY change
    between the r4 falling and r5 rising n_made curves is manifold
    convexity (the intervention claim in docs/QUALITY.md round-5)."""
    from mmvae_tpu.data.synthetic import synthetic_labeled_images

    kw = dict(seed=3, difficulty=0.55, confound_max=0.7)
    legacy = synthetic_labeled_images(128, (1, 8, 8), **kw)
    fold0 = synthetic_labeled_images(128, (1, 8, 8), fold=0.0, **kw)
    np.testing.assert_array_equal(legacy["images"], fold0["images"])
    np.testing.assert_array_equal(legacy["labels"], fold0["labels"])

    folded = synthetic_labeled_images(128, (1, 8, 8), fold=2.0, **kw)
    # fold applies elementwise to the mixture, drawing nothing from any
    # rng stream: labels identical, images changed, range still (0,1)
    np.testing.assert_array_equal(legacy["labels"], folded["labels"])
    assert np.abs(legacy["images"] - folded["images"]).max() > 1e-3
    assert folded["images"].min() > 0.0 and folded["images"].max() < 1.0

    # the noise stream is shared: inverting the sigmoid and removing the
    # shared noise must reproduce the folded mixture exactly (sin of the
    # unfolded mixture, x1.5), i.e. fold changed no random draws
    def logit(p):
        return np.log(p) - np.log1p(-p)

    pre_legacy = logit(legacy["images"].astype(np.float64))
    pre_folded = logit(folded["images"].astype(np.float64))
    noise = pre_legacy - _unfolded_mixture(kw)
    np.testing.assert_allclose(
        pre_folded - noise,
        1.5 * np.sin(2.0 * _unfolded_mixture(kw)),
        atol=1e-3)

    # loader pass-through (configs forward extra keys by signature)
    tr_a, _, _ = get_dataloaders("mnist_svhn", batch_size=16,
                                 synthetic_n=128, difficulty=0.55)
    tr_b, _, _ = get_dataloaders("mnist_svhn", batch_size=16,
                                 synthetic_n=128, difficulty=0.55,
                                 fold=2.0)
    a = np.asarray(tr_a.dataset.modalities[0][:8])
    b = np.asarray(tr_b.dataset.modalities[0][:8])
    assert np.abs(a - b).max() > 1e-3


def _unfolded_mixture(kw):
    """The pre-noise class/style/confound mixture for test_fold_knob:
    regenerate with noise_std=0 (same streams; the noise draw happens
    after the fold point so zeroing its scale leaves the mixture)."""
    from mmvae_tpu.data.synthetic import synthetic_labeled_images

    def logit(p):
        return np.log(p) - np.log1p(-p)

    clean = synthetic_labeled_images(128, (1, 8, 8), noise_std=0.0, **kw)
    return logit(clean["images"].astype(np.float64))
