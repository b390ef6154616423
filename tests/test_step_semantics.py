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
