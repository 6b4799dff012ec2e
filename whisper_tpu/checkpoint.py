"""Checkpoint save/restore.

Three formats:
  * openai/whisper `.pt` — read-only ingestion (models/params.py), so users
    of the reference can bring their checkpoints as-is;
  * `.npz` — simple single-file host format (save_model/load_model);
  * orbax directories — production format: sharding-aware, async-capable,
    suitable for multi-chip fine-tuning state (params + optimizer), the
    checkpoint/resume subsystem the inference-only reference lacks
    (its "checkpoints" are download cache + compiled .mlmodelc artifacts,
    SURVEY.md §5).
"""

import json
import os
from typing import Dict, Optional

from .models.dims import ModelDimensions


def save_checkpoint(path: str, params: Dict, dims: ModelDimensions, step: int = 0):
    """Write an orbax checkpoint directory with dims metadata."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "dims.json"), "w") as f:
        json.dump({**dims.__dict__, "step": step}, f)

    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(os.path.join(path, f"state_{step}"), params, force=True)
    checkpointer.wait_until_finished()


def load_checkpoint(path: str, step: Optional[int] = None):
    """Read an orbax checkpoint directory -> (params, dims, step)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "dims.json")) as f:
        meta = json.load(f)
    saved_step = meta.pop("step", 0)
    dims = ModelDimensions(**meta)
    step = saved_step if step is None else step

    checkpointer = ocp.StandardCheckpointer()
    params = checkpointer.restore(os.path.join(path, f"state_{step}"))
    return params, dims, step
