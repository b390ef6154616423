"""Pin the co-train step's gradient-coupling semantics (SURVEY §7.3):

* JSD couples ALL models (no detach on either side, ref:cotraining:225-247);
* the FGSM diversity term updates only the pair's first model — the attacked
  model's generation pass and its clean predictions are detached
  (ref:AEGenerator.py:31, ref:cotraining:392).
"""
import jax
import jax.numpy as jnp
import numpy as np

from dct_tpu.losses import get_loss_fn, jsd_2d, kl_div_2d
from dct_tpu.models import Segmentator, stack_states

ADAM = {"name": "Adam", "lr": 1e-3}
STEP = {"name": "StepLR", "step_size": 90, "gamma": 0.1}
K, B, H = 2, 2, 32


def build():
    segs = [Segmentator({"name": "enet", "num_classes": 4}, ADAM, STEP,
                        jax.random.PRNGKey(i), input_shape=(1, H, H, 1))
            for i in range(K)]
    st = stack_states([{"params": s.state["params"],
                        "batch_stats": s.state["batch_stats"]} for s in segs])
    return segs[0], st


def grad_norms_per_model(grads):
    return [float(sum(jnp.sum(x[i] ** 2) for x in
                      jax.tree_util.tree_leaves(grads))) for i in range(K)]


def test_jsd_couples_all_models(rng):
    seg, st = build()
    unlab = jax.random.uniform(rng, (B, H, H, 1))
    vapply = jax.vmap(seg.apply_train, in_axes=(0, 0, None))

    def jsd_loss(params):
        logits, _ = vapply(params, st["batch_stats"], unlab)
        return jnp.mean(jsd_2d(jax.nn.softmax(logits, -1)))

    norms = grad_norms_per_model(jax.grad(jsd_loss)(st["params"]))
    assert all(n > 0 for n in norms), norms


def test_adv_updates_only_model_a(rng):
    """KL(a(adv) ‖ stop_grad(b(clean))) must carry zero gradient to model b."""
    from dct_tpu.adversarial import fgsm

    seg, st = build()
    img = jax.random.uniform(rng, (B, H, H, 1))
    gt = jax.random.randint(rng, (B, H, H), 0, 4)
    ce = get_loss_fn("cross_entropy")

    def adv_loss(params):
        params_b = jax.tree_util.tree_map(lambda x: x[1], params)
        bs_b = jax.tree_util.tree_map(lambda x: x[1], st["batch_stats"])
        adv_img, _, real_probs, _ = fgsm(seg.apply_train, params_b, bs_b,
                                         img, gt, ce, 0.03)
        params_a = jax.tree_util.tree_map(lambda x: x[0], params)
        bs_a = jax.tree_util.tree_map(lambda x: x[0], st["batch_stats"])
        adv_logits, _ = seg.apply_train(params_a, bs_a, adv_img)
        return jnp.mean(kl_div_2d(jax.nn.softmax(adv_logits, -1), real_probs))

    norms = grad_norms_per_model(jax.grad(adv_loss)(st["params"]))
    assert norms[0] > 0, norms          # model a learns
    assert norms[1] == 0.0, norms       # attacked model gets NO gradient


def test_fuse_forward_matches_unfused(rng):
    """The fused two-group labeled+unlabeled forward (steps.py fuse_forward)
    must reproduce the sequential path exactly: per-group BN batch stats via
    the vmapped group axis, running stats composed as
    r2 = m·ra_lab + ra_unlab − m·r0. Compared over a 3-iteration epoch with
    jsd+adv on (SGD: Adam's sign-like first step amplifies float noise).

    ONE iteration in fp32: multi-step fp32 drift is unboundable here (FGSM's
    discontinuous sign(g) turns ~1e-7 conv-lowering reassociation noise into
    run-dependent discrete flips — measured batch-stat drift varied 5.5e-3 to
    3.1e-2 across identical runs); the 3-step trajectory exactness pin is
    tests/test_shard_parity_f64.py::test_inner_f64_fuse_forward (1e-9)."""
    from dct_tpu.models import stack_states
    from dct_tpu.train.steps import make_cotrain_epoch

    SGD = {"name": "SGD", "lr": 0.01, "momentum": 0.9}
    Kk, Bb, T, N = 2, 3, 1, 24
    segs = [Segmentator({"name": "enet", "num_classes": 4}, SGD, STEP,
                        jax.random.PRNGKey(i), input_shape=(1, H, H, 1))
            for i in range(Kk)]
    seg = segs[0]
    st = stack_states([{"params": s.state["params"],
                        "batch_stats": s.state["batch_stats"]} for s in segs])

    def fresh_state():
        cp = jax.tree_util.tree_map(jnp.copy, st)
        return {"params": cp["params"], "batch_stats": cp["batch_stats"],
                "opt_state": seg.tx.init(cp["params"])}

    rs = np.random.RandomState(3)
    img = jnp.asarray(rs.randint(0, 255, (N, H, H), dtype=np.uint8))
    gt = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))
    idx_lab = rs.randint(0, N, (T, Kk, Bb)).astype(np.int32)
    idx_unlab = rs.randint(0, N, (T, Bb)).astype(np.int32)   # Bu == B
    pairs = np.tile(np.array([0, 1], np.int32), (T, 1))
    key = jax.random.PRNGKey(11)
    args = (img, gt, idx_lab, idx_unlab, pairs, key, 1e-2, 0.5, 0.05)

    ce = get_loss_fn("cross_entropy")
    fused = make_cotrain_epoch(seg, Kk, 4, ce, True, True, True, True, 0.03,
                               fuse_forward=True)
    seq = make_cotrain_epoch(seg, Kk, 4, ce, True, True, True, True, 0.03,
                             fuse_forward=False)
    new_f, m_f = fused(fresh_state(), *args)
    new_s, m_s = seq(fresh_state(), *args)

    # one iteration from identical fresh states: agreement to fp32 noise
    for name in ("sup_loss", "jsd_loss", "adv_loss"):
        a, b = np.asarray(m_f[name]), np.asarray(m_s[name])
        assert np.allclose(a, b, atol=5e-5), (name, a, b)
    for which, tol in (("params", 1e-4), ("batch_stats", 1e-3)):
        for pa, pb in zip(jax.tree_util.tree_leaves(new_f[which]),
                          jax.tree_util.tree_leaves(new_s[which])):
            d = np.abs(np.asarray(pa) - np.asarray(pb)).max()
            assert d < tol, (which, d)


def test_adv_dtype_pins_fgsm_segment_to_f32(rng):
    """``adv_dtype="float32"`` on a bf16 model must run the FGSM segment
    (generation forward, input grad, adversarial forward) in fp32.

    Observable: at iteration 0 the adv term depends only on the initial
    params and the input batch (BN train-mode normalization uses batch
    stats, so the main pass does not feed it), so a bf16 model with
    adv_dtype=float32 must reproduce a full-fp32 model's adv_loss to fp32
    reassociation noise — while the plain-bf16 adv term only agrees at
    bf16 precision. Motivation: the bf16-512² tunnel-compiler adv-NaN
    (BASELINE.md 512² ladder); this knob pins the fragile segment."""
    from dct_tpu.train.steps import make_cotrain_epoch

    def build_dt(dt):
        segs = [Segmentator({"name": "enet", "num_classes": 4,
                             "compute_dtype": dt}, ADAM, STEP,
                            jax.random.PRNGKey(i), input_shape=(1, H, H, 1))
                for i in range(K)]
        st = stack_states([{"params": s.state["params"],
                            "batch_stats": s.state["batch_stats"]}
                           for s in segs])
        return segs[0], {"params": st["params"],
                         "batch_stats": st["batch_stats"],
                         "opt_state": segs[0].tx.init(st["params"])}

    rs = np.random.RandomState(7)
    N, T, Bb = 16, 1, 2
    img = jnp.asarray(rs.randint(0, 255, (N, H, H), dtype=np.uint8))
    gt = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))
    idx_lab = rs.randint(0, N, (T, K, Bb)).astype(np.int32)
    idx_unlab = rs.randint(0, N, (T, Bb)).astype(np.int32)
    pairs = np.tile(np.array([0, 1], np.int32), (T, 1))
    args = (img, gt, idx_lab, idx_unlab, pairs, jax.random.PRNGKey(0),
            1e-3, 0.5, 0.05)
    ce = get_loss_fn("cross_entropy")

    def adv0(dt, adv_dtype):
        seg, state = build_dt(dt)
        fn = make_cotrain_epoch(seg, K, 4, ce, True, True, False, False,
                                0.03, adv_dtype=adv_dtype)
        _, m = fn(state, *args)
        assert np.isfinite(np.asarray(m["sup_loss"])).all()
        return float(np.asarray(m["adv_loss"])[0])

    adv_f32 = adv0("float32", None)
    adv_mixed = adv0("bfloat16", "float32")
    adv_bf16 = adv0("bfloat16", None)
    assert np.isfinite([adv_f32, adv_mixed, adv_bf16]).all()
    # the pinned segment reproduces full-fp32 to reassociation noise
    np.testing.assert_allclose(adv_mixed, adv_f32, rtol=1e-5, atol=1e-6)
    # sanity: the knob is a no-op when it matches the compute dtype
    assert adv0("float32", "float32") == adv_f32


def test_fuse_forward_falls_back_when_batches_differ(rng):
    """B != Bu must silently take the sequential path (shape-gated)."""
    from dct_tpu.models import stack_states
    from dct_tpu.train.steps import make_cotrain_epoch

    segs = [Segmentator({"name": "enet", "num_classes": 4}, ADAM, STEP,
                        jax.random.PRNGKey(i), input_shape=(1, H, H, 1))
            for i in range(K)]
    seg = segs[0]
    st = stack_states([{"params": s.state["params"],
                        "batch_stats": s.state["batch_stats"]} for s in segs])
    state = {"params": st["params"], "batch_stats": st["batch_stats"],
             "opt_state": seg.tx.init(st["params"])}
    rs = np.random.RandomState(5)
    N, T, Bu = 16, 2, 3          # labeled B=2 (K,B), unlabeled Bu=3
    img = jnp.asarray(rs.randint(0, 255, (N, H, H), dtype=np.uint8))
    gt = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))
    idx_lab = rs.randint(0, N, (T, K, B)).astype(np.int32)
    idx_unlab = rs.randint(0, N, (T, Bu)).astype(np.int32)
    pairs = np.tile(np.array([0, 1], np.int32), (T, 1))
    fn = make_cotrain_epoch(seg, K, 4, get_loss_fn("cross_entropy"),
                            True, True, False, False, 0.03)
    _, metrics = fn(state, img, gt, idx_lab, idx_unlab, pairs,
                    jax.random.PRNGKey(0), 1e-3, 0.5, 0.05)
    assert np.isfinite(np.asarray(metrics["sup_loss"])).all()


def test_supervised_grads_are_private(rng):
    """Each model's CE term must only move its own parameters."""
    seg, st = build()
    img = jax.random.uniform(rng, (K, B, H, H, 1))
    gt = jax.random.randint(rng, (K, B, H, H), 0, 4)
    ce = get_loss_fn("cross_entropy")
    vapply = jax.vmap(seg.apply_train, in_axes=(0, 0, 0))

    def sup0_only(params):
        logits, _ = vapply(params, st["batch_stats"], img)
        return ce(logits[0], gt[0])

    norms = grad_norms_per_model(jax.grad(sup0_only)(st["params"]))
    assert norms[0] > 0 and norms[1] == 0.0, norms


def test_static_pair_matches_dynamic(rng):
    """K=2 specializes the adversarial pair to static (0, 1) indices
    (steps.py: sorted 2-of-2 draw is always (0,1), ref::235-242) so the
    per-leaf take_model/put_model lower to free slices. Static and traced
    indexing are the same math, but static slices legally change XLA
    fusion/reassociation, so the trajectories agree to fp32 reassociation
    noise (~2e-7 on losses), not bit-exactly. The comparison runs under SGD:
    Adam's grad normalization g/(√v+ε) amplifies near-zero reassociation
    noise to O(1) relative direction flips (measured up to 7.6e-3 abs on
    near-zero leaves after 2 steps), which says nothing about the indexing
    semantics being tested; SGD keeps the param delta at lr·grad-noise."""
    from dct_tpu.models import stack_states
    from dct_tpu.train.steps import make_cotrain_epoch

    Kk, Bb, T, N = 2, 3, 2, 24
    SGD = {"name": "SGD", "lr": 1e-2, "weight_decay": 0.0}
    segs = [Segmentator({"name": "enet", "num_classes": 4}, SGD, STEP,
                        jax.random.PRNGKey(i), input_shape=(1, H, H, 1))
            for i in range(Kk)]
    seg = segs[0]
    st = stack_states([{"params": s.state["params"],
                        "batch_stats": s.state["batch_stats"]} for s in segs])

    def fresh_state():
        cp = jax.tree_util.tree_map(jnp.copy, st)
        return {"params": cp["params"], "batch_stats": cp["batch_stats"],
                "opt_state": seg.tx.init(cp["params"])}

    rs = np.random.RandomState(5)
    img = jnp.asarray(rs.randint(0, 255, (N, H, H), dtype=np.uint8))
    gt = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))
    idx_lab = rs.randint(0, N, (T, Kk, Bb)).astype(np.int32)
    idx_unlab = rs.randint(0, N, (T, Bb)).astype(np.int32)
    pairs = np.tile(np.array([0, 1], np.int32), (T, 1))
    args = (img, gt, idx_lab, idx_unlab, pairs, jax.random.PRNGKey(11),
            1e-2, 0.5, 0.05)

    ce = get_loss_fn("cross_entropy")
    static = make_cotrain_epoch(seg, Kk, 4, ce, True, True, True, True, 0.03)
    dynamic = make_cotrain_epoch(seg, Kk, 4, ce, True, True, True, True, 0.03,
                                 _dynamic_pair=True)
    new_s, m_s = static(fresh_state(), *args)
    new_d, m_d = dynamic(fresh_state(), *args)

    for name in ("sup_loss", "jsd_loss", "adv_loss"):
        np.testing.assert_allclose(np.asarray(m_s[name]),
                                   np.asarray(m_d[name]),
                                   rtol=1e-5, atol=1e-7, err_msg=name)
    for which in ("params", "batch_stats"):
        for pa, pb in zip(jax.tree_util.tree_leaves(new_s[which]),
                          jax.tree_util.tree_leaves(new_d[which])):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       rtol=1e-4, atol=1e-5, err_msg=which)
