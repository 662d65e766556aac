"""Experiment tracking — wandb-compatible no-op logger.

The reference logs everything to wandb (main.py:40-43). The TPU image has
no wandb and zero egress, so the default sink writes JSONL metrics + stdout;
if wandb IS importable and WANDB_MODE allows it, it is used transparently.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class Tracker:
    def __init__(self, project: str = "", run_path: Optional[str] = None,
                 config: Optional[Dict] = None):
        self.run_path = run_path
        self._file = None
        self._wandb = None
        try:
            import wandb  # noqa

            if os.environ.get("WANDB_MODE", "disabled") != "disabled":
                self._wandb = wandb
                wandb.init(project=project, config=config or {})
        except Exception:
            self._wandb = None
        if run_path is not None:
            os.makedirs(run_path, exist_ok=True)
            self._file = open(os.path.join(run_path, "metrics.jsonl"), "a")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        payload = {k: _to_py(v) for k, v in metrics.items()}
        if step is not None:
            payload["epoch"] = step
        payload["_t"] = time.time()
        if self._file is not None:
            self._file.write(json.dumps(payload) + "\n")
            self._file.flush()
        if self._wandb is not None:
            self._wandb.log(payload)

    def log_image(self, name: str, path: str):
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(path)})

    def close(self):
        if self._file is not None:
            self._file.close()


def _to_py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)
