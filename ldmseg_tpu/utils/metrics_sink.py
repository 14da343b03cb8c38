"""Metric sinks: JSONL file + optional wandb.

Reference observability (SURVEY §5): stdout tee per process, optional
wandb scalars/panels (main_ldm.py:121-128, trainers_ldm_cond.py:961-963,
:1481-1512). The TPU build logs structured JSONL always (greppable,
driver-friendly) and mirrors to wandb when available and enabled.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsSink:
    def __init__(self, path: Optional[str] = None, use_wandb: bool = False,
                 wandb_kwargs: Optional[dict] = None):
        self.path = path
        self.file = None
        if path is not None:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self.file = open(path, "a")
        self.wandb = None
        if use_wandb:
            try:
                import wandb
                self.wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                print("wandb not installed; JSONL sink only")

    def log(self, step: int, **scalars):
        scalars = {k: v for k, v in scalars.items() if v is not None}
        rec = {"step": int(step), "time": time.time(), **{
            k: float(v) for k, v in scalars.items()}}
        if self.file is not None:
            self.file.write(json.dumps(rec) + "\n")
            self.file.flush()
        if self.wandb is not None:
            self.wandb.log(scalars, step=step)

    def log_image(self, step: int, name: str, image, caption=None):
        """Mirror a visualization panel to wandb (reference logs sampled
        rgb/gt/pred grids, trainers_ldm_cond.py:1481-1512). ``image``: an
        HWC uint8/float array or a saved panel path. The JSONL sink
        records the pointer so panels are discoverable offline too."""
        ref = image if isinstance(image, str) else f"<array {name}>"
        if self.file is not None:
            self.file.write(json.dumps({
                "step": int(step), "time": time.time(),
                "image": {"name": name, "ref": ref}}) + "\n")
            self.file.flush()
        if self.wandb is not None:
            self.wandb.log(
                {name: self.wandb.Image(image, caption=caption)},
                step=step)

    def close(self):
        if self.file is not None:
            self.file.close()
        if self.wandb is not None:
            self.wandb.finish()
