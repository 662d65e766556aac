"""Quality assessment harness — rebuild of analysis/Quality_assess.py:21-170:
reference-activation caching + FID/PRD combo over generated batches, with
either the Inception FID network or any custom encoder."""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Sequence

import numpy as np

from . import prd
from .fid import activation_statistics, calculate_frechet_distance


class QualityAssess:
    """Caches reference activations once, then scores generated data with
    FID and PRD (Quality_assess.py pattern)."""

    def __init__(self, encoder_fn: Callable[[np.ndarray], np.ndarray],
                 cache_path: Optional[str] = None):
        self.encoder_fn = encoder_fn
        self.cache_path = cache_path
        self.ref_acts: Optional[np.ndarray] = None

    def fit_reference(self, batches: Sequence[np.ndarray]):
        """Compute (or load cached) activations of the real data."""
        if self.cache_path and os.path.exists(self.cache_path):
            self.ref_acts = np.load(self.cache_path)
            return self
        acts = [np.asarray(self.encoder_fn(b)) for b in batches]
        self.ref_acts = np.concatenate(acts)
        if self.cache_path:
            os.makedirs(os.path.dirname(self.cache_path) or ".", exist_ok=True)
            np.save(self.cache_path, self.ref_acts)
        return self

    def score(self, gen_batches: Sequence[np.ndarray],
              num_clusters: int = 20, num_runs: int = 10) -> Dict[str, float]:
        assert self.ref_acts is not None, "fit_reference first"
        gen_acts = np.concatenate([np.asarray(self.encoder_fn(b))
                                   for b in gen_batches])
        n = min(len(gen_acts), len(self.ref_acts))
        ref = self.ref_acts[:n]
        gen = gen_acts[:n]
        mu1, s1 = activation_statistics(ref)
        mu2, s2 = activation_statistics(gen)
        metrics = {"fid": calculate_frechet_distance(mu1, s1, mu2, s2)}
        precision, recall = prd.compute_prd_from_embedding(
            gen, ref, num_clusters=num_clusters, num_runs=num_runs)
        f8, f18 = prd.prd_to_max_f_beta_pair(precision, recall)
        metrics["prd_f8"] = float(f8)
        metrics["prd_f1_8"] = float(f18)
        return metrics
