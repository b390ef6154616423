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
from collections import defaultdict
from pathlib import Path
from typing import Any, Dict, Union

import jax
import numpy as np


def _to_numpy(tree):
    """Fetch every device-array leaf to host numpy.

    Leaves are packed into ONE device-side concatenation per dtype and
    fetched in a single transfer each: per-leaf fetches pay a full
    host↔device round-trip per buffer (~200 leaves × RTT ≈ 40 s per
    checkpoint through the axon tunnel — measured; the packed fetch is
    <1 s). The concat compiles once per payload signature and is reused
    every epoch.
    """
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    groups = defaultdict(list)
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array) and leaf.size > 0:
            groups[jnp.dtype(leaf.dtype).name].append(i)
    fetched = {}
    for idxs in groups.values():
        flat = jnp.concatenate([leaves[i].reshape(-1) for i in idxs]) \
            if len(idxs) > 1 else leaves[idxs[0]].reshape(-1)
        host = np.asarray(flat)                       # one transfer
        off = 0
        for i in idxs:
            n = leaves[i].size
            fetched[i] = host[off:off + n].reshape(leaves[i].shape)
            off += n
    out = [fetched[i] if i in fetched
           else (np.asarray(l) if hasattr(l, "shape") else l)
           for i, l in enumerate(leaves)]
    return jax.tree_util.tree_unflatten(treedef, out)


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
