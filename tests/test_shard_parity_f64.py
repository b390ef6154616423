"""Float64 variant of the shard_map/vmap co-training parity test.

test_shard_cotrain.py tolerates 2e-2 on params after 2 iterations, explained
as fp32 non-associativity between the vmap path's grouped-conv lowering and
the shard path's plain convs. This test pins that explanation: with float64
params (and therefore float64 convs), the same two paths must agree to ~1e-6
after the same two optimizer steps. Runs in a subprocess because
JAX_ENABLE_X64 must be set before jax initializes.
"""
import os
import subprocess
import sys

import pytest


def test_f64_parity_subprocess():
    env = {**os.environ, "JAX_ENABLE_X64": "1", "RUN_X64_INNER": "1",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    res = subprocess.run(
        [sys.executable, "-m", "pytest", __file__ + "::test_inner_f64",
         "-q", "-p", "no:cacheprovider"],
        env=env, capture_output=True, text=True, timeout=1500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stdout + res.stderr


@pytest.mark.skipif(os.environ.get("RUN_X64_INNER") != "1",
                    reason="inner x64 test; run via test_f64_parity_subprocess")
def test_inner_f64():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dct_tpu.losses import get_loss_fn
    from dct_tpu.models import Segmentator, stack_states
    from dct_tpu.parallel.mesh import make_mesh
    from dct_tpu.parallel.shard_cotrain import make_shard_cotrain_epoch
    from dct_tpu.train.steps import make_cotrain_epoch

    assert jax.config.jax_enable_x64

    H, B, Bu, T, K = 16, 2, 2, 2, 2
    SGD = {"name": "SGD", "lr": 1e-2, "weight_decay": 0.0}
    STEP = {"name": "StepLR", "step_size": 90, "gamma": 0.1}

    # compute_dtype float64: Segmentator.apply_train otherwise casts params
    # and inputs to its compute dtype (default f32), defeating the x64 run
    segs = [Segmentator({"name": "enet", "num_classes": 4,
                         "compute_dtype": "float64"}, SGD, STEP,
                        jax.random.PRNGKey(i), input_shape=(1, H, H, 1))
            for i in range(K)]
    seg = segs[0]

    def to64(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    # batch_stats stay f32: apply_train casts updated running stats back to
    # f32 so scan carries are dtype-stable (segmentator.py:99-104)
    st = stack_states([{"params": to64(s.state["params"]),
                        "batch_stats": s.state["batch_stats"]}
                       for s in segs])
    state_a = {"params": st["params"], "batch_stats": st["batch_stats"],
               "opt_state": seg.tx.init(st["params"])}
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)
    state_c = jax.tree_util.tree_map(jnp.copy, state_a)

    rs = np.random.RandomState(0)
    N = 32
    img = jnp.asarray(rs.randint(0, 255, (N, H, H), dtype=np.uint8))
    gt = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))
    idx_lab = rs.randint(0, N, (T, K, B)).astype(np.int32)
    idx_unlab = rs.randint(0, N, (T, Bu)).astype(np.int32)
    pairs = np.tile(np.array([0, 1], np.int32), (T, 1))
    key = jax.random.PRNGKey(7)

    vmap_fn = make_cotrain_epoch(seg, K, 4, get_loss_fn("cross_entropy"),
                                 True, True, False, False, 0.03)
    new_a, m_a = vmap_fn(state_a, img, gt, idx_lab, idx_unlab, pairs, key,
                         1e-3, 0.5, 0.05)

    mesh = make_mesh(2, n_model=2)
    shard_fn = make_shard_cotrain_epoch(seg, mesh, K, 4,
                                        get_loss_fn("cross_entropy"),
                                        True, True, False, 0.03,
                                        state_template=state_b)
    new_b, m_b = shard_fn(state_b, img, gt, idx_lab, idx_unlab, pairs, key,
                          1e-3, 0.5, 0.05)
    # fused two-group forward under the mesh (the default) vs the sequential
    # shard path: composed BN running-stat update must match to f64 noise
    shard_seq = make_shard_cotrain_epoch(seg, mesh, K, 4,
                                         get_loss_fn("cross_entropy"),
                                         True, True, False, 0.03,
                                         state_template=state_c,
                                         fuse_forward=False)
    new_c, _ = shard_seq(state_c, img, gt, idx_lab, idx_unlab, pairs, key,
                         1e-3, 0.5, 0.05)
    worst_fuse = max(float(np.abs(np.asarray(pb) - np.asarray(pc)).max())
                     for pb, pc in zip(jax.tree_util.tree_leaves(new_b["params"]),
                                       jax.tree_util.tree_leaves(new_c["params"])))
    assert worst_fuse < 1e-6, worst_fuse
    worst_bs = max(float(np.abs(np.asarray(pb) - np.asarray(pc)).max())
                   for pb, pc in zip(
                       jax.tree_util.tree_leaves(new_b["batch_stats"]),
                       jax.tree_util.tree_leaves(new_c["batch_stats"])))
    # batch_stats are stored f32 (scan-carry dtype stability) → f32 rounding
    assert worst_bs < 1e-5, worst_bs
    print(f"shard fused-vs-seq parity: params {worst_fuse:.2e}, "
          f"batch_stats {worst_bs:.2e}")

    # logits are cast back to f32 at the apply boundary, so reported losses
    # carry f32 reduction noise; the conv/optimizer math underneath is f64
    np.testing.assert_allclose(np.asarray(m_a["sup_loss"]),
                               np.asarray(m_b["sup_loss"]), atol=5e-6)
    np.testing.assert_allclose(np.asarray(m_a["jsd_loss"]),
                               np.asarray(m_b["jsd_loss"])[:, 0], atol=5e-6)
    worst = 0.0
    for pa, pb in zip(jax.tree_util.tree_leaves(new_a["params"]),
                      jax.tree_util.tree_leaves(new_b["params"])):
        worst = max(worst, float(np.abs(np.asarray(pa) - np.asarray(pb)).max()))
    assert worst < 1e-6, worst
    print(f"f64 param parity after {T} steps: max|Δ| = {worst:.2e}")


def test_f64_fuse_forward_subprocess():
    env = {**os.environ, "JAX_ENABLE_X64": "1", "RUN_X64_INNER": "1"}
    res = subprocess.run(
        [sys.executable, "-m", "pytest",
         __file__ + "::test_inner_f64_fuse_forward",
         "-q", "-p", "no:cacheprovider", "-s"],
        env=env, capture_output=True, text=True, timeout=1500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stdout + res.stderr


@pytest.mark.skipif(os.environ.get("RUN_X64_INNER") != "1",
                    reason="inner x64 test; run via the subprocess test")
def test_inner_f64_fuse_forward():
    """f64 exactness pin for the fused two-group co-train forward
    (train/steps.py fuse_forward): the merged labeled+unlabeled apply with
    per-group BN stats and the composed running-stat update
    (r2 = m·ra_lab + ra_unlab − m·r0) must match the sequential path to
    float64 noise over a multi-step epoch with jsd+adv on. The fp32
    envelope lives in test_step_semantics.py::test_fuse_forward_matches_unfused."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dct_tpu.losses import get_loss_fn
    from dct_tpu.models import Segmentator, stack_states
    from dct_tpu.train.steps import make_cotrain_epoch

    assert jax.config.jax_enable_x64
    H, B, T, K = 16, 2, 3, 2
    SGD = {"name": "SGD", "lr": 1e-2, "weight_decay": 0.0}
    STEP = {"name": "StepLR", "step_size": 90, "gamma": 0.1}
    segs = [Segmentator({"name": "enet", "num_classes": 4,
                         "compute_dtype": "float64"}, SGD, STEP,
                        jax.random.PRNGKey(i), input_shape=(1, H, H, 1))
            for i in range(K)]
    seg = segs[0]

    def to64(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    st = stack_states([{"params": to64(s.state["params"]),
                        "batch_stats": s.state["batch_stats"]}
                       for s in segs])

    def fresh():
        cp = jax.tree_util.tree_map(jnp.copy, st)
        return {"params": cp["params"], "batch_stats": cp["batch_stats"],
                "opt_state": seg.tx.init(cp["params"])}

    rs = np.random.RandomState(0)
    N = 32
    img = jnp.asarray(rs.randint(0, 255, (N, H, H), dtype=np.uint8))
    gt = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))
    idx_lab = rs.randint(0, N, (T, K, B)).astype(np.int32)
    idx_unlab = rs.randint(0, N, (T, B)).astype(np.int32)
    pairs = np.tile(np.array([0, 1], np.int32), (T, 1))
    args = (img, gt, idx_lab, idx_unlab, pairs, jax.random.PRNGKey(7),
            1e-3, 0.5, 0.05)

    ce = get_loss_fn("cross_entropy")
    fused = make_cotrain_epoch(seg, K, 4, ce, True, True, True, True, 0.03,
                               fuse_forward=True)
    seq = make_cotrain_epoch(seg, K, 4, ce, True, True, True, True, 0.03,
                             fuse_forward=False)
    new_f, m_f = fused(fresh(), *args)
    new_s, m_s = seq(fresh(), *args)

    for name in ("sup_loss", "jsd_loss", "adv_loss"):
        # losses are cast to f32 at the apply boundary → f32 noise
        np.testing.assert_allclose(np.asarray(m_f[name]),
                                   np.asarray(m_s[name]), atol=5e-6)
    worst = {"params": 0.0, "batch_stats": 0.0}
    for which in worst:
        for pa, pb in zip(jax.tree_util.tree_leaves(new_f[which]),
                          jax.tree_util.tree_leaves(new_s[which])):
            worst[which] = max(worst[which], float(
                np.abs(np.asarray(pa) - np.asarray(pb)).max()))
    # batch_stats are stored f32 (scan-carry dtype stability), so the
    # composed update carries f32 rounding; params are pure f64
    assert worst["params"] < 1e-9, worst
    assert worst["batch_stats"] < 1e-5, worst
    print(f"f64 fuse_forward parity after {T} steps: {worst}")


def test_f64_bn_divergence_subprocess():
    env = {**os.environ, "JAX_ENABLE_X64": "1", "RUN_X64_INNER": "1",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    res = subprocess.run(
        [sys.executable, "-m", "pytest",
         __file__ + "::test_inner_f64_bn_divergence",
         "-q", "-p", "no:cacheprovider", "-s"],
        env=env, capture_output=True, text=True, timeout=1500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stdout + res.stderr


@pytest.mark.skipif(os.environ.get("RUN_X64_INNER") != "1",
                    reason="inner x64 test; run via the subprocess test")
def test_inner_f64_bn_divergence():
    """Quantify the documented shard-path BN divergence at data>1
    (VERDICT r2 weak #7; shard_cotrain.py BN note).

    Inside shard_map each model's BatchNorm reduces over its LOCAL data
    shard, while the vmap/GSPMD path reduces over the global batch — the
    same replica-local BN the reference's nn.DataParallel wrapper does
    (ref:generalframework/models/segmentators.py:34-36: DataParallel
    replicates the module; BN runs per-device). With equal shard sizes the
    shard-mean average equals the global mean EXACTLY at the first BN
    layer; running variance drops the between-shard mean variance (law of
    total variance), so stats and params drift — this test pins the drift
    to a small bound over T steps in f64, where fp noise (~1e-15) cannot
    explain it.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dct_tpu.losses import get_loss_fn
    from dct_tpu.models import Segmentator, stack_states
    from dct_tpu.parallel.mesh import make_mesh
    from dct_tpu.parallel.shard_cotrain import make_shard_cotrain_epoch
    from dct_tpu.train.steps import make_cotrain_epoch

    assert jax.config.jax_enable_x64
    H, B, Bu, T, K = 16, 4, 4, 4, 2
    SGD = {"name": "SGD", "lr": 1e-2, "weight_decay": 0.0}
    STEP = {"name": "StepLR", "step_size": 90, "gamma": 0.1}
    segs = [Segmentator({"name": "enet", "num_classes": 4,
                         "compute_dtype": "float64"}, SGD, STEP,
                        jax.random.PRNGKey(i), input_shape=(1, H, H, 1))
            for i in range(K)]
    seg = segs[0]

    def to64(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    st = stack_states([{"params": to64(s.state["params"]),
                        "batch_stats": s.state["batch_stats"]}
                       for s in segs])
    state_a = {"params": st["params"], "batch_stats": st["batch_stats"],
               "opt_state": seg.tx.init(st["params"])}
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)

    rs = np.random.RandomState(0)
    N = 32
    img = jnp.asarray(rs.randint(0, 255, (N, H, H), dtype=np.uint8))
    gt = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))
    idx_lab = rs.randint(0, N, (T, K, B)).astype(np.int32)
    idx_unlab = rs.randint(0, N, (T, Bu)).astype(np.int32)
    pairs = np.tile(np.array([0, 1], np.int32), (T, 1))
    key = jax.random.PRNGKey(7)

    vmap_fn = make_cotrain_epoch(seg, K, 4, get_loss_fn("cross_entropy"),
                                 True, True, False, False, 0.03)
    new_a, _ = vmap_fn(state_a, img, gt, idx_lab, idx_unlab, pairs, key,
                       1e-3, 0.5, 0.05)

    mesh = make_mesh(4, n_model=2)   # (model=2, data=2): per-shard BN at B/2
    shard_fn = make_shard_cotrain_epoch(seg, mesh, K, 4,
                                        get_loss_fn("cross_entropy"),
                                        True, True, False, 0.03,
                                        state_template=state_b)
    new_b, _ = shard_fn(state_b, img, gt, idx_lab, idx_unlab, pairs, key,
                        1e-3, 0.5, 0.05)

    drift_mean = drift_var = 0.0
    leaves_a = jax.tree_util.tree_flatten_with_path(new_a["batch_stats"])[0]
    leaves_b = jax.tree_util.tree_leaves(new_b["batch_stats"])
    for (path, va), vb in zip(leaves_a, leaves_b):
        name = jax.tree_util.keystr(path)
        va, vb = np.asarray(va), np.asarray(vb)
        if "var" in name:
            # vars are positive-scale: measure relative to the leaf's scale
            drift_var = max(drift_var, float(
                np.abs(va - vb).max() / max(1e-12, np.abs(va).max())))
        else:
            # means live on the (normalized) activation scale: absolute
            drift_mean = max(drift_mean, float(np.abs(va - vb).max()))
    drift_p = max(float(np.abs(np.asarray(pa) - np.asarray(pb)).max())
                  for pa, pb in zip(jax.tree_util.tree_leaves(new_a["params"]),
                                    jax.tree_util.tree_leaves(new_b["params"])))
    print(f"BN divergence after {T} steps (2 samples/shard, f64): "
          f"running-mean abs {drift_mean:.2e}, running-var rel {drift_var:.2e}, "
          f"params abs {drift_p:.2e}")
    # The divergence is REAL (f64 noise is ~1e-13; measured drift is orders
    # of magnitude above it) — per-shard BN is a semantics difference, the
    # same one the reference's nn.DataParallel has, not an implementation
    # bug (data=1 exactness is pinned by test_inner_f64).
    assert drift_var > 1e-6 and drift_p > 1e-9
    # ... and BOUNDED at the documented magnitudes (measured 2026-08-19 at
    # this adversarially small operating point — 2 random-noise 16² samples
    # per shard, SGD lr=1e-2: mean 0.30, var 34% rel, params 7.6e-2; real
    # configs shard at >=4 samples/shard where batch stats are tighter).
    assert drift_mean < 1.0, drift_mean
    assert drift_var < 0.6, drift_var
    assert drift_p < 0.3, drift_p
