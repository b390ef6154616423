"""Segmentator: net + optimizer + LR schedule bundled from config dicts.

TPU rebuild of ref:generalframework/models/segmentators.py:17-116 (and its
byte-duplicate ``Model``, ref:models/general.py). The torch version is a
stateful object mutated by ``update()``; here the *state* is an explicit
pytree (``SegState``) threaded through pure jitted steps, and the Segmentator
object holds only static things: the module definition, the lr-less optax
transform, the lr(epoch) schedule, and the three self-describing config dicts
that make checkpoints reconstructible (ref:segmentators.py:81-95).

K co-trained models with a shared architecture are expressed as ONE stacked
``SegState`` (leaves get a leading K axis via ``stack_states``) and vmapped
apply — the TPU-native replacement for the reference's list-of-Segmentators
Python loop (ref:cotraining_totalloss.py:208-218).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax.core import FrozenDict

from .. import optim as optim_lib
from ..schedules import get_lr_schedule
from . import get_arch  # circular-safe: registry defined before this import


class SegState(dict):
    """Pytree of per-model state: {'params', 'batch_stats', 'opt_state'}."""


def stack_states(states):
    """K SegState pytrees → one with a leading K axis on every leaf."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *states)


def unstack_states(stacked, k: int):
    """Inverse of stack_states (host-side; used for checkpointing)."""
    return [jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(k)]


class Segmentator:
    def __init__(self, arch_dict: Dict[str, Any], optim_dict: Dict[str, Any],
                 scheduler_dict: Dict[str, Any], rng: jax.Array,
                 input_shape: Tuple[int, ...] = (1, 256, 256, 1),
                 dtype=jnp.float32) -> None:
        self.arch_dict = dict(arch_dict)
        self.optim_dict = dict(optim_dict)
        self.scheduler_dict = dict(scheduler_dict)
        self.arch_name = arch_dict["name"]
        self.arch_params = {k: v for k, v in arch_dict.items() if k != "name"}
        # compute_dtype: mixed-precision knob (config: Arch.compute_dtype).
        # Params/optimizer stay fp32; forward activations run in this dtype
        # (bfloat16 feeds the MXU at 2x rate); logits are cast back to fp32
        # before any loss.
        self.compute_dtype = jnp.dtype(self.arch_params.pop("compute_dtype",
                                                            "float32"))
        self.model = get_arch(self.arch_name, self.arch_params)
        self.dtype = dtype
        # uniform BN momentum of this arch (None → unknown; disables the
        # fused two-group co-train forward, see train/steps.py)
        from . import BN_MOMENTUM
        self.bn_momentum = BN_MOMENTUM.get(self.arch_name)

        dummy = jnp.zeros(input_shape, dtype)
        init_rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
        variables = self.model.init(init_rngs, dummy, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict({}))

        self.tx = optim_lib.build_optimizer(optim_dict)
        opt_state = self.tx.init(params)
        self.lr_fn = get_lr_schedule(scheduler_dict, float(optim_dict["lr"]))
        self.epoch = 0

        self.state: Dict[str, Any] = {"params": params,
                                      "batch_stats": batch_stats,
                                      "opt_state": opt_state}

    # ------------------------------------------------------------------
    # pure apply fns (safe to close over in jitted steps)
    # ------------------------------------------------------------------
    def _cast_in(self, params, x):
        if self.compute_dtype == jnp.float32:
            return params, x
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(self.compute_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
        return cast(params), x.astype(self.compute_dtype)

    def apply_train(self, params, batch_stats, x,
                    dropout_rng: Optional[jax.Array] = None):
        """Forward in train mode; returns (logits fp32, new_batch_stats).
        BN uses batch statistics and updates the running ones — matching the
        reference's train-mode forwards (ref:segmentators.py:65-70)."""
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        cparams, cx = self._cast_in(params, x)
        out, mut = self.model.apply(
            {"params": cparams, "batch_stats": batch_stats}, cx, train=True,
            mutable=["batch_stats"], rngs=rngs)
        new_bs = mut["batch_stats"]
        if self.compute_dtype != jnp.float32:
            # keep running stats fp32 so scan carries stay dtype-stable
            new_bs = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, new_bs)
        return out.astype(jnp.float32), new_bs

    def apply_eval(self, params, batch_stats, x):
        """Forward in eval mode (running BN stats, no dropout)."""
        cparams, cx = self._cast_in(params, x)
        out = self.model.apply(
            {"params": cparams, "batch_stats": batch_stats}, cx, train=False)
        return out.astype(jnp.float32)

    # ------------------------------------------------------------------
    # convenience (host-facing; compiles on first use)
    # ------------------------------------------------------------------
    def predict(self, img: jnp.ndarray, logit: bool = True) -> jnp.ndarray:
        """Eval-mode prediction (ref:segmentators.py:46-50)."""
        out = self.apply_eval(self.state["params"], self.state["batch_stats"], img)
        return out if logit else jax.nn.softmax(out, axis=-1)

    def lr(self, epoch: Optional[int] = None) -> float:
        return self.lr_fn(self.epoch if epoch is None else epoch)

    def scheduler_step(self) -> None:
        self.epoch += 1

    # ------------------------------------------------------------------
    # self-describing checkpoint payload (ref:segmentators.py:81-95)
    # ------------------------------------------------------------------
    @property
    def state_dict(self) -> Dict[str, Any]:
        return {"arch_dict": self.arch_dict,
                "optim_dict": self.optim_dict,
                "scheduler_dict": self.scheduler_dict,
                "net_state_dict": self.state["params"],
                "batch_stats": self.state["batch_stats"],
                "optim_state_dict": self.state["opt_state"],
                "scheduler_state_dict": {"epoch": self.epoch}}

    def load_state_dict(self, sd: Dict[str, Any]) -> None:
        self.state["params"] = sd["net_state_dict"]
        self.state["batch_stats"] = sd["batch_stats"]
        self.state["opt_state"] = sd["optim_state_dict"]
        self.epoch = int(sd["scheduler_state_dict"]["epoch"])

    @classmethod
    def from_state_dict(cls, sd: Dict[str, Any], rng: Optional[jax.Array] = None,
                        input_shape=(1, 256, 256, 1)) -> "Segmentator":
        """Rebuild a Segmentator from a checkpoint alone (ref:Summary.py:70-78)."""
        seg = cls(sd["arch_dict"], sd["optim_dict"], sd["scheduler_dict"],
                  rng if rng is not None else jax.random.PRNGKey(0),
                  input_shape=input_shape)
        seg.load_state_dict(sd)
        return seg
