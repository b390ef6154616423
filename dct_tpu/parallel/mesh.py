"""Device mesh + sharding placement for multi-chip training.

The reference's only parallelism is single-process ``nn.DataParallel``
(ref:generalframework/models/segmentators.py:34-36). The TPU-native design
uses one ``jax.sharding.Mesh`` with two axes:

* ``model`` — the K co-trained models: the stacked param/batch-stats pytrees
  have a leading K axis, sharded so each model's replica group owns its own
  weights (co-training's K independent nets are embarrassingly parallel except
  for the JSD/adversarial coupling, which XLA turns into ICI collectives).
* ``data``  — classic DP: batch dims sharded, params replicated within a
  model group; gradient psum is inserted by the GSPMD partitioner.

No explicit collectives appear in user code: placement is everything — the
jitted epoch functions (dct_tpu.train.steps) are sharding-agnostic and follow
their inputs (computation-follows-data).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, n_model: int = 1) -> Mesh:
    """Mesh of shape (model, data) over the first ``n_devices`` devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n <= len(devices), (n, len(devices))
    assert n % n_model == 0, f"{n} devices not divisible into {n_model} model groups"
    arr = np.array(devices[:n]).reshape(n_model, n // n_model)
    return Mesh(arr, ("model", "data"))


def choose_parallel_mesh(K: int, n_devices: Optional[int] = None) -> Optional[Mesh]:
    """Auto-chooser: pick a (model, data) mesh for K co-trained models.

    model axis = gcd(K, n) so every group owns K/gcd models and the rest of
    the chips do DP; n_model == 1 falls back to pure GSPMD DP (the vmapped
    step partitioned by batch), n_model > 1 routes through the shard_map
    path. Returns None on a single device (no mesh needed).
    """
    import math
    n = n_devices or len(jax.devices())
    if n <= 1:
        return None
    return make_mesh(n, n_model=math.gcd(K, n))


def data_parallel_mesh(n_devices: Optional[int] = None) -> Optional[Mesh]:
    """Data-only (model=1) mesh for the single-model trainers (supervised /
    MT / VAT / city). Returns None on a single device."""
    n = n_devices or len(jax.devices())
    return make_mesh(n, n_model=1) if n > 1 else None


def place_replicated(mesh: Mesh, tree):
    """Replicate a pytree over the whole mesh."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def place_stacked_state(mesh: Mesh, state: Dict, K: int):
    """Shard the leading K axis of stacked model state over ``model``;
    leaves without a K leading dim (e.g. optax step counts) replicate."""
    def spec_for(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == K \
                and mesh.shape["model"] > 1:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, spec_for(x)), state)


def dp_shard_idx(mesh: Mesh, idx, batch_axis: int = -1):
    """Shard ONE per-epoch index array's batch axis over ``data``; all other
    axes replicated. This is the single placement every non-co-training
    trainer needs for GSPMD DP (the reference's nn.DataParallel semantics,
    ref:generalframework/models/segmentators.py:34-36, which wraps the model
    used by every trainer): the jitted epochs are sharding-agnostic, so a
    data-sharded batch-index array is enough for the partitioner to shard
    the gather, the forward and the loss, and to psum the gradients."""
    arr = np.asarray(idx)
    spec = [None] * arr.ndim
    spec[batch_axis] = "data"
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def place_batches(mesh: Mesh, idx_lab, idx_unlab, pairs):
    """Shard per-iteration index arrays: labeled (T,K,B) over (model, data)
    on its last two axes; unlabeled (T,Bu) over data; pairs replicated."""
    lab_sh = NamedSharding(mesh, P(None, "model", "data"))
    unlab_sh = NamedSharding(mesh, P(None, "data"))
    rep = NamedSharding(mesh, P())
    return (jax.device_put(idx_lab, lab_sh),
            jax.device_put(idx_unlab, unlab_sh),
            jax.device_put(pairs, rep))
