"""Calibrate the hard-synthetic `confound_max` knob (VERDICT r3 next#1).

Cross-coherence (acc_0_1: encode modality 0, decode modality 1, classify)
is ceilinged by how often modality 0's class is recoverable from a single
sample: a sample whose cross-class confound weight w > 0.5 is dominated by
the WRONG prototype and no model can recover the label. With
w ~ U(0, cmax) that irrecoverable fraction is max(0, (cmax-0.5)/cmax) —
identically ZERO for cmax <= 0.5, which is why the r3 calibration at
difficulty=0.55 (cmax = 0.9*0.55 = 0.495) still saturated at 0.9997.

This probe measures the ceiling empirically: for each cmax it regenerates
the flagship-sized hard stand-ins (synthetic_n=20000, same seeds/protos as
the mnist_svhn loader), trains the reference-architecture eval classifiers
(analysis/classifier_mnist.py / classifier_SVHN.py equivalents,
eval/classifiers.py), and reports train-split and test-split accuracy per
modality plus the analytic ceiling. Pick the cmax whose classifier
accuracy lands where the reference's real-data regime needs it:
MNIST->SVHN coherence ~0.79-0.83 (tests/ablation_n_made.py:8-13) with the
generating model a few points below the classifier ceiling.

Run on TPU (classifier training is device-resident + jitted):
    python -u scripts/calibrate_confound.py [cmax ...] [fold=F]

fold=F (r5) applies the non-convex sin-fold (data/synthetic.py) so the
probe calibrates the hard2 stand-in used by the n_made-curve rerun.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

from mmvae_tpu.core.runtime import enable_compilation_cache
from mmvae_tpu.data.synthetic import synthetic_labeled_images
from mmvae_tpu.eval import classifiers as C

enable_compilation_cache()

DIFFICULTY = 0.55  # proto_scale / noise_std / intra_class_k as in the hard configs
N = 20000          # flagship synthetic_n
FOLD = 0.0         # overridden by a fold=F argv token


def gen(cmax, seed, proto_seed, n, shape):
    return synthetic_labeled_images(
        n, shape, seed=seed, proto_seed=proto_seed,
        difficulty=DIFFICULTY, confound_max=cmax, fold=FOLD)


def accuracy(apply_fn, imgs, labels, bs=500):
    import jax.numpy as jnp
    hits = 0
    for i in range(0, len(imgs), bs):
        logits = apply_fn(jnp.asarray(imgs[i:i + bs]))
        hits += int((np.asarray(logits).argmax(-1) == labels[i:i + bs]).sum())
    return hits / len(imgs)


def main():
    global FOLD
    args = []
    for a in sys.argv[1:]:
        if a.startswith("fold="):
            FOLD = float(a.split("=", 1)[1])
        else:
            args.append(float(a))
    grid = args or [0.495, 0.60, 0.70, 0.80, 0.90]
    print(f"difficulty={DIFFICULTY} fold={FOLD}")
    key = jax.random.PRNGKey(0)
    print(f"{'cmax':>6} {'ceiling':>8} {'mnist_tr':>9} {'mnist_te':>9} "
          f"{'svhn_tr':>8} {'svhn_te':>8} {'sec':>6}")
    for cmax in grid:
        t0 = time.time()
        row = [cmax, 1.0 - max(0.0, (cmax - 0.5) / cmax) if cmax else 1.0]
        accs = []
        # same (seed, proto_seed, shape) tuples as loaders.mnist_svhn
        for m, (arch, shape, s_tr, s_te, ps) in enumerate([
            (C.MnistClassifier(), (1, 28, 28), 1, 2, 1),
            (C.SVHNClassifier(), (3, 32, 32), 3, 4, 3),
        ]):
            tr = gen(cmax, s_tr, ps, N, shape)
            te = gen(cmax, s_te, ps, N // 4, shape)
            variables = C.train_classifier(
                arch, tr["images"], tr["labels"], jax.random.fold_in(key, m),
                epochs=3)
            apply_fn = C.make_apply(arch, variables)
            accs += [accuracy(apply_fn, tr["images"][:5000], tr["labels"][:5000]),
                     accuracy(apply_fn, te["images"], te["labels"])]
        print(f"{row[0]:6.3f} {row[1]:8.4f} {accs[0]:9.4f} {accs[1]:9.4f} "
              f"{accs[2]:8.4f} {accs[3]:8.4f} {time.time()-t0:6.1f}")


if __name__ == "__main__":
    main()
