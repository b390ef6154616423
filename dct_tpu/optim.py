"""Optimizer builders (torch-semantics, optax core).

The reference builds optimizers by name from ``torch.optim`` plus a vendored
AdaBound (ref:generalframework/models/segmentators.py:37-41,
ref:generalframework/optim/adabound.py). Contract here: ``build_optimizer``
returns an **lr-less** ``optax.GradientTransformation`` producing a descent
*direction*; the train step applies ``params -= lr(epoch) * direction`` with
the lr supplied as a traced scalar each step — so LR schedules live outside
the compiled graph and resume for free.

torch-parity notes:
* ``Adam(weight_decay=w)`` is L2-regularization *into the moments* (not AdamW):
  ``add_decayed_weights`` is chained BEFORE ``scale_by_adam``.
* ``AdamW`` decays after the moments, scaled by lr: handled by a flag the
  step applies (decay folded into the direction here, matching optax.adamw).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax


def _maybe_l2(weight_decay: float) -> optax.GradientTransformation:
    if weight_decay:
        return optax.add_decayed_weights(weight_decay)
    return optax.identity()


class AdaBoundState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any
    max_nu: Any


def scale_by_adabound(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                      final_lr_ratio: float = 100.0, gamma: float = 1e-3,
                      amsbound: bool = False) -> optax.GradientTransformation:
    """AdaBound (dynamic-bound Adam→SGD, ref:generalframework/optim/adabound.py:6-117)
    as an lr-relative direction: bounds are expressed as multiples of the
    base lr (``final_lr_ratio`` = final_lr / base_lr, reference default
    0.1/0.001 = 100). Golden-parity vs the vendored torch AdaBound is pinned
    by tests/test_torch_parity.py (incl. the Adam→SGD transition region and
    the amsbound variant)."""

    def init(params):
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        max_nu = jax.tree_util.tree_map(jnp.zeros_like, params) if amsbound else None
        return AdaBoundState(jnp.zeros([], jnp.int32), mu, nu, max_nu)

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        max_nu = (jax.tree_util.tree_map(jnp.maximum, state.max_nu, nu)
                  if amsbound else None)
        t = count.astype(jnp.float32)
        bc1 = 1 - b1 ** t
        bc2 = 1 - b2 ** t
        # bounds relative to base lr (torch: final_lr scaled by lr ratio)
        lower = final_lr_ratio * (1 - 1 / (gamma * t + 1))
        upper = final_lr_ratio * (1 + 1 / (gamma * t))

        def direction(m, v):
            # per-element lr/base_lr = clamp(sqrt(bc2)/bc1 / (sqrt(v)+eps), ...)
            # — eps OUTSIDE the bias correction, exactly as the torch code
            # (adabound.py:100-113: denom = sqrt(exp_avg_sq)+eps, then
            # step_size = lr*sqrt(bc2)/bc1 clamped to the bound window).
            step = jnp.clip((jnp.sqrt(bc2) / bc1) / (jnp.sqrt(v) + eps), lower, upper)
            return step * m
        dirs = jax.tree_util.tree_map(direction, mu, max_nu if amsbound else nu)
        return dirs, AdaBoundState(count, mu, nu, max_nu)

    return optax.GradientTransformation(init, update)


def flatten_tx(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Run ``inner`` over ONE raveled+concatenated vector per dtype instead of
    per-leaf.

    Every optimizer built here (Adam/AdamW/SGD/RMSprop/AdaBound ±L2) is purely
    ELEMENTWISE in (grad, param, moments), so the flat update is bit-identical
    to the per-leaf update (no reductions cross leaf boundaries; pinned by
    tests/test_optim_flat.py). The point is op count: an ENet stack is ~200
    param leaves, and per-leaf Adam emits ~10 tiny elementwise ops per leaf
    per step — ~2000 ops of a few KB each, on a platform where small-buffer
    latency (not FLOPs) floors the step (BASELINE.md conv-efficiency study).
    Flattened, the optimizer is ~10 ops over one ~MB buffer plus one concat
    and one split per step.

    Leaves are grouped by dtype in ``tree_flatten`` order; moment state lives
    flat (2 vectors instead of ~400 leaves), which also makes checkpoint
    packing trivial. Shapes/treedef are re-derived from ``updates`` at each
    update call, so the state carries only the inner state (a resume restores
    it against the same param tree).
    """

    def _buckets(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        order: Dict[Any, list] = {}
        for i, leaf in enumerate(leaves):
            order.setdefault(jnp.asarray(leaf).dtype, []).append(i)
        return leaves, treedef, order

    def _flatten(leaves, order):
        return {dt: jnp.concatenate([jnp.ravel(leaves[i]) for i in idxs])
                for dt, idxs in order.items()}

    def _unflatten(flat, leaves, treedef, order):
        out = [None] * len(leaves)
        for dt, idxs in order.items():
            off = 0
            for i in idxs:
                n = leaves[i].size
                out[i] = jax.lax.dynamic_slice_in_dim(
                    flat[dt], off, n).reshape(leaves[i].shape)
                off += n
        return jax.tree_util.tree_unflatten(treedef, out)

    def init(params):
        leaves, _, order = _buckets(params)
        return inner.init(_flatten(leaves, order))

    def update(updates, state, params=None):
        leaves, treedef, order = _buckets(updates)
        flat_u = _flatten(leaves, order)
        flat_p = None
        if params is not None:
            p_leaves, _, p_order = _buckets(params)
            flat_p = _flatten(p_leaves, p_order)
        flat_dir, new_state = inner.update(flat_u, state, flat_p)
        return _unflatten(flat_dir, leaves, treedef, order), new_state

    return optax.GradientTransformation(init, update)


def build_optimizer(optim_dict: Dict[str, Any]) -> optax.GradientTransformation:
    """Config dict {'name': 'Adam', 'lr': ..., ...} → lr-less direction tx.

    ``fused: true`` wraps the transformation in :func:`flatten_tx` —
    bit-identical update, ~200× fewer optimizer ops per step. Note the
    opt_state pytree differs from the per-leaf form, so a checkpoint written
    with one setting does not resume under the other."""
    fused = bool(optim_dict.get("fused", False))
    tx = _build_optimizer_impl(optim_dict)
    return flatten_tx(tx) if fused else tx


def _build_optimizer_impl(optim_dict: Dict[str, Any]) -> optax.GradientTransformation:
    name = optim_dict["name"]
    wd = float(optim_dict.get("weight_decay", 0.0))
    if name == "Adam":
        betas = optim_dict.get("betas", (0.9, 0.999))
        eps = float(optim_dict.get("eps", 1e-8))
        return optax.chain(_maybe_l2(wd),
                           optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    if name == "AdamW":
        betas = optim_dict.get("betas", (0.9, 0.999))
        eps = float(optim_dict.get("eps", 1e-8))
        return optax.chain(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
                           optax.add_decayed_weights(wd) if wd else optax.identity())
    if name == "SGD":
        momentum = float(optim_dict.get("momentum", 0.0))
        nesterov = bool(optim_dict.get("nesterov", False))
        chain = [_maybe_l2(wd)]
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=nesterov))
        return optax.chain(*chain)
    if name == "RMSprop":
        alpha = float(optim_dict.get("alpha", 0.99))
        eps = float(optim_dict.get("eps", 1e-8))
        return optax.chain(_maybe_l2(wd), optax.scale_by_rms(decay=alpha, eps=eps))
    if name in ("AdaBound", "AdaBoundW"):
        base_lr = float(optim_dict["lr"])
        final_lr = float(optim_dict.get("final_lr", 0.1))
        core = scale_by_adabound(
            b1=optim_dict.get("betas", (0.9, 0.999))[0],
            b2=optim_dict.get("betas", (0.9, 0.999))[1],
            eps=float(optim_dict.get("eps", 1e-8)),
            final_lr_ratio=final_lr / base_lr,
            gamma=float(optim_dict.get("gamma", 1e-3)),
            amsbound=bool(optim_dict.get("amsbound", False)),
        )
        if name == "AdaBound":
            # torch AdaBound: L2 folded into the gradient before the moments
            # (ref:adabound.py:92-93).
            return optax.chain(_maybe_l2(wd), core)
        # AdaBoundW: decoupled decay AFTER the bounded step, NOT scaled by lr
        # (ref:adabound.py:226-229: p -= step; p -= wd*p). Our step applies
        # lr(epoch)·direction, so express the decay as wd/base_lr relative to
        # the direction — exact at constant lr; under an lr schedule the decay
        # scales with lr/base_lr where torch's stays constant (documented
        # divergence, matches AdamW-style practice).
        return optax.chain(
            core,
            optax.add_decayed_weights(wd / base_lr) if wd else optax.identity())
    raise KeyError(f"unknown optimizer {name!r}")


def apply_direction(params, direction, lr):
    """params ← params − lr·direction (lr is a traced scalar)."""
    return jax.tree_util.tree_map(
        lambda p, d: p - lr * d.astype(p.dtype), params, direction)
