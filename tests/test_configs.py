"""Every shipped config must build through the registry and resolve its
objective — the drop-in config-corpus guarantee (SURVEY §2.9; the corpus
mirrors src/configs_experiments/** including the flow_tuning nmade grid,
ms_small, and chest_svhn)."""

import glob
import os

import pytest

from mmvae_tpu.core.config import ExperimentConfig
from mmvae_tpu.models import registry
from mmvae_tpu.objectives import objectives as obj_mod

CONFIGS = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), "..", "configs", "**", "*.json"),
    recursive=True))


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: os.path.relpath(
    p, os.path.join(os.path.dirname(__file__), "..", "configs")))
def test_config_builds(path):
    cfg = ExperimentConfig.from_json(path)
    bundle = registry.build(cfg)
    assert len(bundle.shape_mods) == len(bundle.classifier_keys) or \
        bundle.classifier_keys == ()
    name, fn, custom = obj_mod.resolve(cfg.obj, multimodal=True,
                                       looser=cfg.looser)
    assert callable(fn)
    # the nmade ablation grid must thread n_made_blocks into the flows
    if "nmade" in path and not cfg.no_nf:
        n = cfg.n_made_blocks
        assert n in (1, 2, 3, 5)
        flow = bundle.model.vaes[0].flow
        assert flow is not None and flow.n_made_blocks == n
