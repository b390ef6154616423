"""Model-parallel (shard_map) co-training: parity with the vmapped step.

On a (model=2, data=1) mesh the shard_map step must reproduce the
single-device vmapped step EXACTLY (same BN threading, same FGSM semantics);
on (model=2, data=4) it must run and produce finite losses (BN reduces over
local shards there, so only sanity is checked).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dct_tpu.losses import get_loss_fn
from dct_tpu.models import Segmentator, stack_states
from dct_tpu.parallel.mesh import make_mesh
from dct_tpu.parallel.shard_cotrain import make_shard_cotrain_epoch
from dct_tpu.train.steps import make_cotrain_epoch

ADAM = {"name": "Adam", "lr": 1e-3, "weight_decay": 1e-4}
# parity test uses SGD: Adam's first step is ±lr·sign(g), which amplifies
# benign float-noise into 2·lr parameter differences between implementations
SGD = {"name": "SGD", "lr": 0.01, "momentum": 0.9}
STEP = {"name": "StepLR", "step_size": 90, "gamma": 0.1}
K, B, Bu, H, T = 2, 4, 4, 32, 2


def build_state(optim=SGD):
    segs = [Segmentator({"name": "enet", "num_classes": 4}, optim, STEP,
                        jax.random.PRNGKey(i), input_shape=(1, H, H, 1))
            for i in range(K)]
    seg = segs[0]
    st = stack_states([{"params": s.state["params"],
                        "batch_stats": s.state["batch_stats"]} for s in segs])
    return seg, {"params": st["params"], "batch_stats": st["batch_stats"],
                 "opt_state": seg.tx.init(st["params"])}


def make_inputs(seed=0):
    rs = np.random.RandomState(seed)
    N = 64
    img = jnp.asarray(rs.randint(0, 255, (N, H, H), dtype=np.uint8))
    gt = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))
    idx_lab = rs.randint(0, N, (T, K, B)).astype(np.int32)
    idx_unlab = rs.randint(0, N, (T, Bu)).astype(np.int32)
    pairs = np.tile(np.array([0, 1], np.int32), (T, 1))
    return img, gt, idx_lab, idx_unlab, pairs


@pytest.mark.parametrize("augment", [False, True])
def test_parity_with_vmap_step(augment):
    mesh = make_mesh(2, n_model=2)   # (model=2, data=1)
    seg, state_a = build_state()
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)
    img, gt, idx_lab, idx_unlab, pairs = make_inputs()
    key = jax.random.PRNGKey(7)

    vmap_fn = make_cotrain_epoch(seg, K, 4, get_loss_fn("cross_entropy"),
                                 True, True, augment, augment, 0.03)
    new_a, m_a = vmap_fn(state_a, img, gt, idx_lab, idx_unlab, pairs, key,
                         1e-3, 0.5, 0.05)

    shard_fn = make_shard_cotrain_epoch(seg, mesh, K, 4,
                                        get_loss_fn("cross_entropy"),
                                        True, True, augment, 0.03,
                                        state_template=state_b)
    new_b, m_b = shard_fn(state_b, img, gt, idx_lab, idx_unlab, pairs, key,
                          1e-3, 0.5, 0.05)

    # Tolerances: iteration 0 (identical inputs, fresh states) must agree to
    # float noise; iteration 1 inherits fp32 non-associativity between the
    # vmap path's grouped-conv lowering and the shard path's plain convs
    # (measured: a SINGLE vmapped ENet forward differs from a direct apply by
    # ~1e-4 in logits), amplified once through an SGD step. The same two
    # steps agree to 1e-14 in float64 (tests/test_shard_parity_f64.py), so
    # everything beyond that here is accumulation noise, not semantics —
    # the f64 test is what caught (and now pins) the JSD all_gather
    # double-count fixed in shard_cotrain.py.
    sup_a = np.asarray(m_a["sup_loss"])            # (T, K)
    sup_b = np.asarray(m_b["sup_loss"])            # (T, K)
    assert np.allclose(sup_a[0], sup_b[0], atol=2e-5), (sup_a[0], sup_b[0])
    assert np.allclose(sup_a, sup_b, atol=2e-3), (sup_a, sup_b)
    jsd_a = np.asarray(m_a["jsd_loss"])
    jsd_b = np.asarray(m_b["jsd_loss"])[:, 0]
    assert np.allclose(jsd_a[0], jsd_b[0], atol=2e-5)
    assert np.allclose(jsd_a, jsd_b, atol=2e-3)
    adv_b = np.asarray(m_b["adv_loss"]).sum(1)     # model-axis sum = total
    assert np.allclose(np.asarray(m_a["adv_loss"])[0], adv_b[0], atol=2e-5)
    # FGSM's sign(g) is discontinuous: ~1e-4 fp32 logit noise flips
    # individual sign bits, so the adv term diverges DISCRETELY after the
    # first iteration (the f64 test is the exactness pin; measured fp32
    # worst case ~1.5e-3)
    assert np.allclose(np.asarray(m_a["adv_loss"]), adv_b, atol=5e-3)

    # parameters after T SGD steps stay within the fp32 noise envelope
    # (sign-bit flips in the FGSM images perturb gradients discretely too)
    for pa, pb in zip(jax.tree_util.tree_leaves(new_a["params"]),
                      jax.tree_util.tree_leaves(new_b["params"])):
        assert np.allclose(np.asarray(pa), np.asarray(pb), atol=5e-3), \
            np.abs(np.asarray(pa) - np.asarray(pb)).max()


def test_k4_two_groups_parity():
    """K=4 models on a (model=2, data=1) mesh: each group vmaps K_local=2
    models; must match the pure-vmap 4-model step (fresh states, iter 0)."""
    K4 = 4
    segs = [Segmentator({"name": "enet", "num_classes": 4}, SGD, STEP,
                        jax.random.PRNGKey(i), input_shape=(1, H, H, 1))
            for i in range(K4)]
    seg = segs[0]
    st = stack_states([{"params": s.state["params"],
                        "batch_stats": s.state["batch_stats"]} for s in segs])
    state_a = {"params": st["params"], "batch_stats": st["batch_stats"],
               "opt_state": seg.tx.init(st["params"])}
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)

    rs = np.random.RandomState(3)
    N = 64
    img = jnp.asarray(rs.randint(0, 255, (N, H, H), dtype=np.uint8))
    gt = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))
    idx_lab = rs.randint(0, N, (T, K4, B)).astype(np.int32)
    idx_unlab = rs.randint(0, N, (T, Bu)).astype(np.int32)
    # [1,2] is cross-group (groups {0,1},{2,3}); [0,1] is genuinely in-group
    # (a_own==b_own FGSM path: gen/adv BN updates on two slots of one shard)
    pairs = np.array([[1, 2], [0, 1]], np.int32)
    key = jax.random.PRNGKey(11)

    vmap_fn = make_cotrain_epoch(seg, K4, 4, get_loss_fn("cross_entropy"),
                                 True, True, True, True, 0.03)
    _, m_a = vmap_fn(state_a, img, gt, idx_lab, idx_unlab, pairs, key,
                     1e-3, 0.5, 0.05)

    mesh = make_mesh(2, n_model=2)
    shard_fn = make_shard_cotrain_epoch(seg, mesh, K4, 4,
                                        get_loss_fn("cross_entropy"),
                                        True, True, True, 0.03,
                                        state_template=state_b)
    _, m_b = shard_fn(state_b, img, gt, idx_lab, idx_unlab, pairs, key,
                      1e-3, 0.5, 0.05)

    sup_a, sup_b = np.asarray(m_a["sup_loss"]), np.asarray(m_b["sup_loss"])
    assert sup_b.shape == (T, K4)
    assert np.allclose(sup_a[0], sup_b[0], atol=2e-5), (sup_a[0], sup_b[0])
    assert np.allclose(sup_a, sup_b, atol=5e-3)
    assert np.allclose(np.asarray(m_a["jsd_loss"])[0],
                       np.asarray(m_b["jsd_loss"])[0, 0], atol=2e-5)
    assert np.allclose(np.asarray(m_a["adv_loss"])[0],
                       np.asarray(m_b["adv_loss"]).sum(1)[0], atol=2e-5)


def test_model_and_data_axes():
    mesh = make_mesh(8, n_model=2)   # (model=2, data=4)
    seg, state = build_state(ADAM)
    img, gt, idx_lab, idx_unlab, pairs = make_inputs(1)
    shard_fn = make_shard_cotrain_epoch(seg, mesh, K, 4,
                                        get_loss_fn("cross_entropy"),
                                        True, True, True, 0.03,
                                        state_template=state)
    new_state, m = shard_fn(state, img, gt, idx_lab, idx_unlab, pairs,
                            jax.random.PRNGKey(0), 1e-3, 0.5, 0.05)
    assert np.all(np.isfinite(np.asarray(m["sup_loss"])))
    assert np.all(np.isfinite(np.asarray(m["jsd_loss"])))
    assert np.all(np.isfinite(np.asarray(m["adv_loss"])))
    # state was donated; compare against a fresh build instead
    _, fresh = build_state()
    after = jax.tree_util.tree_leaves(new_state["params"])
    fresh_l = jax.tree_util.tree_leaves(fresh["params"])
    assert any(not np.allclose(np.asarray(a), np.asarray(f))
               for a, f in zip(after, fresh_l))


def test_split_fuse_aug_bit_identical():
    """The DP-safe "split" fusion (one K-vmapped warp, K and B axes kept
    separate) must produce BIT-identical augmented batches to both the
    "merged" one-call warp and the per-stream path — same thetas from the
    same fold_in keys, same nearest gather. (Whole-epoch agreement of
    split-under-a-DP-mesh vs merged-single-device is covered end-to-end by
    test_cotrainer_dp_mesh_parity; a standalone epoch-level comparison only
    measures XLA fusion noise, ~3e-6 on losses.)"""
    from dct_tpu.data.augment import sample_aug_thetas, warp_gathered_u8
    from dct_tpu.data.pipeline import gather_augment_u8

    img, gt, idx_lab_T, _, _ = make_inputs()
    idx_lab = idx_lab_T[0]                                   # (K, B)
    k = jax.random.PRNGKey(7)

    # split: one (K,B) gather + one K-vmapped warp (steps.py "split" branch)
    thetas = jnp.stack([sample_aug_thetas(jax.random.fold_in(k, i), B, H, H)
                        for i in range(K)])
    si, sg = jax.jit(jax.vmap(warp_gathered_u8))(
        jnp.take(img, idx_lab, axis=0), jnp.take(gt, idx_lab, axis=0), thetas)

    # merged: one K*B gather + one warp (steps.py "merged" branch)
    idx_all = idx_lab.reshape(-1)
    mi, mg = jax.jit(warp_gathered_u8)(
        jnp.take(img, idx_all, axis=0), jnp.take(gt, idx_all, axis=0),
        thetas.reshape(-1, 2, 3))

    # per-stream (fuse_aug=False branch)
    per = [jax.jit(gather_augment_u8)(img, gt, idx_lab[i],
                                      jax.random.fold_in(k, i))
           for i in range(K)]

    np.testing.assert_array_equal(np.asarray(si).reshape(mi.shape),
                                  np.asarray(mi))
    np.testing.assert_array_equal(np.asarray(sg).reshape(mg.shape),
                                  np.asarray(mg))
    for i in range(K):
        np.testing.assert_array_equal(np.asarray(si[i]), np.asarray(per[i][0]))
        np.testing.assert_array_equal(np.asarray(sg[i]), np.asarray(per[i][1]))


def _build_cotrainer(tmp_path, name, mesh, max_epoch=1):
    import sys
    sys.path.insert(0, "tests")
    from helpers import make_synthetic_acdc

    from dct_tpu.data import MedicalImageDataset
    from dct_tpu.losses import get_loss_fn as glf
    from dct_tpu.train import CoTrainer

    root = make_synthetic_acdc(tmp_path / "acdc", size=32)
    tr = MedicalImageDataset(root, "train", transform=(32, 32), quite=True)
    va = MedicalImageDataset(root, "val", transform=(32, 32), quite=True)
    lab = [tr.filter_by_patterns([f"patient{p:03d}" for p in ids])
           for ids in ([1, 2, 3], [3, 4, 5])]
    unlab = tr.filter_by_patterns([f"patient{p:03d}" for p in range(6, 11)])
    segs = [Segmentator({"name": "enet", "num_classes": 4}, ADAM, STEP,
                        jax.random.PRNGKey(i), input_shape=(1, 32, 32, 1))
            for i in range(2)]
    return CoTrainer(segs, lab, unlab, va,
                     {"sup": glf("cross_entropy"), "jsd": glf("jsd"),
                      "adv": glf("jsd")},
                     max_epoch=max_epoch, save_dir=tmp_path / name,
                     axises=[1, 2, 3], batch_size=4, iters_per_epoch=3,
                     mesh=mesh)


def test_cotrainer_dp_mesh_parity(tmp_path):
    """A (model=1, data=8) mesh is pure GSPMD DP — same math partitioned, so
    one epoch must match the single-device run to float noise."""
    ct_ref = _build_cotrainer(tmp_path, "single", mesh=None)
    df_ref = ct_ref.start_training(train_jsd=True, train_adv=True,
                                   augment_labeled_data=True)
    ct_dp = _build_cotrainer(tmp_path, "dp", mesh=make_mesh(4, n_model=1))
    df_dp = ct_dp.start_training(train_jsd=True, train_adv=True,
                                 augment_labeled_data=True)
    # GSPMD reduces in a different order (tree psum vs single-device sum);
    # the fp noise is amplified once through Adam's rsqrt step — measured
    # disagreement is ~2e-3 on losses after one epoch
    for col in ("sup_loss_0", "sup_loss_1", "jsd_loss", "adv_loss",
                "val_batch_dice_0_1", "val_batch_dice_1_2"):
        assert np.allclose(df_ref[col], df_dp[col], atol=1e-2), \
            (col, df_ref[col].values, df_dp[col].values)


def test_choose_parallel_mesh():
    from dct_tpu.parallel import choose_parallel_mesh
    m = choose_parallel_mesh(2, 8)
    assert dict(m.shape) == {"model": 2, "data": 4}
    m = choose_parallel_mesh(3, 8)      # gcd(3,8)=1 → pure DP
    assert dict(m.shape) == {"model": 1, "data": 8}
    assert choose_parallel_mesh(2, 1) is None


def test_cotrainer_with_mesh(tmp_path):
    """CoTrainer(mesh=...) routes through the shard_map epoch end-to-end."""
    import sys
    sys.path.insert(0, "tests")
    from helpers import make_synthetic_acdc

    from dct_tpu.data import MedicalImageDataset
    from dct_tpu.train import CoTrainer

    root = make_synthetic_acdc(tmp_path / "acdc", size=32)
    tr = MedicalImageDataset(root, "train", transform=(32, 32), quite=True)
    va = MedicalImageDataset(root, "val", transform=(32, 32), quite=True)
    lab = [tr.filter_by_patterns([f"patient{p:03d}" for p in ids])
           for ids in ([1, 2, 3], [3, 4, 5])]
    unlab = tr.filter_by_patterns([f"patient{p:03d}" for p in range(6, 11)])
    segs = [Segmentator({"name": "enet", "num_classes": 4}, ADAM, STEP,
                        jax.random.PRNGKey(i), input_shape=(1, 32, 32, 1))
            for i in range(2)]
    from dct_tpu.losses import get_loss_fn as glf
    ct = CoTrainer(segs, lab, unlab, va,
                   {"sup": glf("cross_entropy"), "jsd": glf("jsd"),
                    "adv": glf("jsd")},
                   max_epoch=1, save_dir=tmp_path / "run", axises=[1, 2, 3],
                   batch_size=4, iters_per_epoch=3,
                   mesh=make_mesh(8, n_model=2))
    df = ct.start_training(train_jsd=True, train_adv=True,
                           augment_labeled_data=True)
    assert len(df) == 1
    assert np.isfinite(df["jsd_loss"]).all()
    assert np.isfinite(df["adv_loss"]).all()
    assert (tmp_path / "run" / "best_0.ckpt").exists()


class TestSpatialEval:
    """Overlap-tile spatial partitioning (parallel/spatial.py)."""

    def test_exact_when_halo_covers_receptive_field(self):
        from flax import linen as nn

        from dct_tpu.parallel.spatial import make_spatial_eval

        class TinyFCN(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(8, (3, 3), padding="SAME")(x)
                x = nn.relu(x)
                return nn.Conv(4, (3, 3), padding="SAME")(x)
            # receptive field 5x5 → half-RF 2 < halo 8 → exact

        model = TinyFCN()
        img = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 128, 1))
        params = model.init(jax.random.PRNGKey(1), img)

        def apply_fn(p, bs, x):
            del bs
            return model.apply(p, x)

        mesh = make_mesh(8, n_model=1)
        step = make_spatial_eval(apply_fn, mesh, halo=8)
        tiled = np.asarray(step(params, {}, img))
        full = np.asarray(apply_fn(params, {}, img))
        assert tiled.shape == full.shape
        assert np.allclose(tiled, full, atol=1e-5), np.abs(tiled - full).max()

    def test_enet_tiles_smoke(self):
        from dct_tpu.parallel.spatial import make_spatial_eval

        seg, state = build_state()
        mesh = make_mesh(4, n_model=1)
        img = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 128, 1))
        params = jax.tree_util.tree_map(lambda x: x[0], state["params"])
        bs = jax.tree_util.tree_map(lambda x: x[0], state["batch_stats"])
        step = make_spatial_eval(seg.apply_eval, mesh, halo=16)
        tiled = np.asarray(step(params, bs, img))          # tile 32+2*16 div 8
        full = np.asarray(seg.apply_eval(params, bs, img))
        assert tiled.shape == full.shape == (1, 32, 128, 4)
        assert np.isfinite(tiled).all()
        # ENet's dilated receptive field exceeds the halo; centers still agree
        agree = (tiled.argmax(-1) == full.argmax(-1)).mean()
        assert agree > 0.9, agree
