"""Self-describing pytree checkpoints (best/last semantics).

Parity with the reference's composite ``Segmentator.state_dict`` torch.save
payloads (ref:generalframework/models/segmentators.py:81-95,
ref:trainer.py:208-220): a checkpoint embeds the arch/optim/scheduler config
dicts plus all state, so ``summary.py`` can rebuild models from checkpoints
alone. Format: pickle of a numpy-ified pytree (torch.save is pickle too);
device arrays are pulled to host numpy on save.
"""
from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict, Union

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def save_checkpoint(path: Union[str, Path], payload: Dict[str, Any]) -> None:
    """Atomic write (tmp + rename): a kill mid-write must never leave a
    truncated checkpoint behind (the restart-on-24h-limit workflow the
    reference documents depends on these files, ref:utils/run_help.md:5)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(payload), f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)


def load_checkpoint(path: Union[str, Path]) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)
