"""flatten_tx: the flat-fused optimizer must be BIT-identical to per-leaf.

Every optimizer in dct_tpu.optim is elementwise in (grad, param, moments), so
running it over one concatenated vector per dtype cannot change any output
element — this pins that claim exactly (assert_array_equal, no tolerance),
over multi-step trajectories including L2-into-moments and the AdaBound
transition, on a stacked (K-leading-axis) ENet-shaped tree.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dct_tpu.optim import apply_direction, build_optimizer, flatten_tx


def _tree(key, k_axis=None, dtype=jnp.float32):
    """Small mixed-shape param tree (conv kernels, BN scales, biases)."""
    ks = jax.random.split(key, 6)
    shp = lambda s: s if k_axis is None else (k_axis,) + s
    return {
        "enc": {"conv_w": jax.random.normal(ks[0], shp((3, 3, 4, 8)), dtype),
                "conv_b": jax.random.normal(ks[1], shp((8,)), dtype),
                "bn_scale": jax.random.normal(ks[2], shp((8,)), dtype)},
        "dec": {"deconv_w": jax.random.normal(ks[3], shp((2, 2, 8, 4)), dtype),
                "head": jax.random.normal(ks[4], shp((1, 1, 4, 2)), dtype)},
        "scalarish": jax.random.normal(ks[5], shp((1,)), dtype),
    }


OPTIMS = [
    {"name": "Adam", "lr": 1e-3, "weight_decay": 1e-4},
    {"name": "AdamW", "lr": 1e-3, "weight_decay": 1e-2},
    {"name": "SGD", "lr": 1e-2, "weight_decay": 1e-4, "momentum": 0.9},
    {"name": "RMSprop", "lr": 1e-3, "weight_decay": 0.0},
    {"name": "AdaBound", "lr": 1e-3, "weight_decay": 1e-4, "final_lr": 0.1},
    {"name": "AdaBoundW", "lr": 1e-3, "weight_decay": 1e-2, "final_lr": 0.1},
]


@pytest.mark.parametrize("cfg", OPTIMS, ids=lambda c: c["name"])
def test_flat_matches_per_leaf_trajectory(cfg):
    key = jax.random.PRNGKey(0)
    params_a = _tree(key, k_axis=2)  # stacked K=2 tree, as the trainers use
    params_b = jax.tree_util.tree_map(jnp.copy, params_a)

    tx_leaf = build_optimizer({**cfg, "fused": False})
    tx_flat = build_optimizer({**cfg, "fused": True})
    st_leaf = tx_leaf.init(params_a)
    st_flat = tx_flat.init(params_b)

    for step in range(5):
        g = _tree(jax.random.fold_in(key, 100 + step), k_axis=2)
        d_leaf, st_leaf = tx_leaf.update(g, st_leaf, params_a)
        d_flat, st_flat = tx_flat.update(g, st_flat, params_b)
        for pa, pb in zip(jax.tree_util.tree_leaves(d_leaf),
                          jax.tree_util.tree_leaves(d_flat)):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
        params_a = apply_direction(params_a, d_leaf, 1e-3)
        params_b = apply_direction(params_b, d_flat, 1e-3)

    for pa, pb in zip(jax.tree_util.tree_leaves(params_a),
                      jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_flat_mixed_dtype_buckets():
    """Leaves of different dtypes are bucketed separately and round-trip."""
    params = {"w32": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "wb16": jnp.ones((4,), jnp.bfloat16),
              "v32": jnp.full((3,), 2.0, jnp.float32)}
    tx = flatten_tx(build_optimizer({"name": "SGD", "lr": 1.0, "fused": False}))
    st = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    d, _ = tx.update(g, st, params)
    assert d["w32"].shape == (2, 3) and d["w32"].dtype == jnp.float32
    assert d["wb16"].shape == (4,) and d["wb16"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(d["v32"]), np.ones((3,), np.float32))


def test_flat_under_jit_and_grad_dtype():
    """flatten_tx works inside jit (static shapes re-derived per trace)."""
    params = _tree(jax.random.PRNGKey(1))
    tx = build_optimizer({"name": "Adam", "lr": 1e-3, "fused": True})
    st = tx.init(params)

    @jax.jit
    def step(p, s, g):
        d, s2 = tx.update(g, s, p)
        return apply_direction(p, d, 1e-3), s2

    g = _tree(jax.random.PRNGKey(2))
    p2, st2 = step(params, st, g)
    assert jax.tree_util.tree_structure(p2) == jax.tree_util.tree_structure(params)
    # second call hits the jit cache with the updated state
    p3, _ = step(p2, st2, g)
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(p3)[0])).all()


def test_fused_trainer_save_resume(tmp_path):
    """A Trainer built with Optim.fused=True survives a save→resume cycle:
    the flat opt_state round-trips through the packed checkpoint and the
    resumed run continues the CSV (same contract as the per-leaf resume
    test in test_trainers.py)."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from helpers import make_synthetic_acdc
    from dct_tpu.data import MedicalImageDataset
    from dct_tpu.losses import get_loss_fn
    from dct_tpu.models import Segmentator
    from dct_tpu.train import Trainer

    root = make_synthetic_acdc(tmp_path / "acdc", size=32)
    tr_ds = MedicalImageDataset(root, "train", transform=(32, 32), quite=True)
    va_ds = MedicalImageDataset(root, "val", transform=(32, 32), quite=True)
    datasets = {"train": tr_ds, "val": va_ds}

    adam_fused = {"name": "Adam", "lr": 1e-3, "weight_decay": 1e-4,
                  "fused": True}
    step = {"name": "StepLR", "step_size": 90, "gamma": 0.1}
    arch = {"name": "enet", "num_classes": 4}
    run = tmp_path / "run"

    seg = Segmentator(arch, adam_fused, step, jax.random.PRNGKey(0),
                      input_shape=(1, 32, 32, 1))
    Trainer(seg, datasets, get_loss_fn("cross_entropy"), max_epoch=1,
            save_dir=run, batch_size=4, axises=[1, 2, 3]).start_training()

    seg2 = Segmentator(arch, adam_fused, step, jax.random.PRNGKey(1),
                       input_shape=(1, 32, 32, 1))
    tr2 = Trainer(seg2, datasets, get_loss_fn("cross_entropy"), max_epoch=2,
                  save_dir=run, batch_size=4, axises=[1, 2, 3],
                  checkpoint=str(run / "last.ckpt"))
    assert tr2.start_epoch == 1
    df = tr2.start_training()
    assert list(df["epoch"]) == [0, 1]
