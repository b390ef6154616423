"""Golden parity tests: dct_tpu losses/metrics vs the torch ops the reference
uses, on identical random tensors (torch CPU is available in this image)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dct_tpu import losses  # noqa: E402
from dct_tpu.utils.general import class2one_hot, dice_coef, probs2one_hot  # noqa: E402


def rand(shape, seed=0):
    rs = np.random.RandomState(seed)
    return rs.randn(*shape).astype(np.float32)


class TestCrossEntropyParity:
    def test_unweighted(self):
        # reference: NLL(log_softmax(logits)) (ref:loss/loss.py:24-25)
        x = rand((2, 3, 5, 5))  # NCHW for torch
        t = np.random.RandomState(1).randint(0, 3, (2, 5, 5))
        torch_val = torch.nn.functional.cross_entropy(
            torch.tensor(x), torch.tensor(t)).item()
        ours = losses.cross_entropy2d(jnp.asarray(x.transpose(0, 2, 3, 1)),
                                      jnp.asarray(t))
        assert np.allclose(float(ours), torch_val, atol=1e-5)

    def test_weighted(self):
        x = rand((2, 4, 6, 6), 2)
        t = np.random.RandomState(3).randint(0, 4, (2, 6, 6))
        w = [0.5, 1.0, 2.0, 1.5]
        torch_val = torch.nn.functional.cross_entropy(
            torch.tensor(x), torch.tensor(t), weight=torch.tensor(w)).item()
        ours = losses.cross_entropy2d(jnp.asarray(x.transpose(0, 2, 3, 1)),
                                      jnp.asarray(t), weight=w)
        assert np.allclose(float(ours), torch_val, atol=1e-5)

    def test_ignore_index(self):
        x = rand((1, 3, 4, 4), 4)
        t = np.random.RandomState(5).randint(0, 3, (1, 4, 4))
        t[0, 0, :2] = 255
        torch_val = torch.nn.functional.cross_entropy(
            torch.tensor(x), torch.tensor(t), ignore_index=255).item()
        ours = losses.cross_entropy2d(jnp.asarray(x.transpose(0, 2, 3, 1)),
                                      jnp.asarray(t), ignore_index=255)
        assert np.allclose(float(ours), torch_val, atol=1e-5)


class TestKLJSDParity:
    def _ref_kl2d(self, p_prob, y_prob, eps=1e-10):
        # exact transcription of ref:loss/loss.py:110-134 in torch
        logp = (p_prob + eps).log()
        logy = (y_prob + eps).log()
        ylogy = (y_prob * logy).sum(dim=1)
        ylogp = (y_prob * logp).sum(dim=1)
        return ylogy - ylogp

    def test_kl2d(self):
        p = torch.softmax(torch.tensor(rand((2, 4, 3, 3), 6)), dim=1)
        y = torch.softmax(torch.tensor(rand((2, 4, 3, 3), 7)), dim=1)
        ref = self._ref_kl2d(p, y).numpy()
        ours = losses.kl_div_2d(jnp.asarray(p.numpy().transpose(0, 2, 3, 1)),
                                jnp.asarray(y.numpy().transpose(0, 2, 3, 1)))
        assert np.allclose(np.asarray(ours), ref, atol=1e-5)

    def test_jsd2d(self):
        # exact transcription of ref:loss/loss.py:183-196
        probs = [torch.softmax(torch.tensor(rand((2, 4, 3, 3), s)), dim=1)
                 for s in (8, 9)]
        mean_p = sum(probs) / 2
        ent = lambda q: -(q * (q + 1e-16).log()).sum(1)
        ref = (ent(mean_p) - sum(ent(q) for q in probs) / 2).numpy()
        ours = losses.jsd_2d(jnp.stack(
            [jnp.asarray(q.numpy().transpose(0, 2, 3, 1)) for q in probs]))
        assert np.allclose(np.asarray(ours), ref, atol=1e-5)


class TestDiceParity:
    def test_soft_dice_coefficient(self):
        # ref:loss/dice.py:9-46
        x = rand((2, 3, 4, 4), 10)
        t = np.random.RandomState(11).randint(0, 3, (2, 4, 4))
        t_oh = torch.nn.functional.one_hot(torch.tensor(t), 3).permute(
            0, 3, 1, 2).float()
        probs = torch.softmax(torch.tensor(x), 1)
        num = (probs * t_oh).sum((2, 3))
        den = (probs * probs).sum((2, 3)) + (t_oh * t_oh).sum((2, 3))
        ref = ((2 * num + 1.0) / (den + 1.0)).numpy()
        ours = losses.dice_coefficient(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            class2one_hot(jnp.asarray(t), 3))
        assert np.allclose(np.asarray(ours), ref, atol=1e-5)

    def test_hard_dice_meter_math(self):
        # ref:metrics/dice_meter.py:12-33 meta_dice "bcwh->bc"
        x = rand((2, 4, 5, 5), 12)
        t = np.random.RandomState(13).randint(0, 4, (2, 5, 5))
        probs_t = torch.softmax(torch.tensor(x), 1)
        pred_oh = torch.nn.functional.one_hot(probs_t.argmax(1), 4).permute(
            0, 3, 1, 2).float()
        gt_oh = torch.nn.functional.one_hot(torch.tensor(t), 4).permute(
            0, 3, 1, 2).float()
        inter = torch.einsum("bcwh->bc", pred_oh * gt_oh)
        sums = torch.einsum("bcwh->bc", gt_oh) + torch.einsum("bcwh->bc", pred_oh)
        ref = ((2 * inter + 1e-8) / (sums + 1e-8)).numpy()
        probs_j = jax.nn.softmax(jnp.asarray(x.transpose(0, 2, 3, 1)), -1)
        ours = dice_coef(class2one_hot(jnp.asarray(t), 4), probs2one_hot(probs_j))
        assert np.allclose(np.asarray(ours), ref, atol=1e-5)


class TestOptimizerParity:
    def test_adam_with_l2(self):
        """One torch Adam(weight_decay) step vs our chained optax direction."""
        import optax

        from dct_tpu.optim import apply_direction, build_optimizer

        w0 = rand((4, 3), 20)
        g = rand((4, 3), 21)
        # torch
        wt = torch.tensor(w0.copy(), requires_grad=True)
        opt = torch.optim.Adam([wt], lr=1e-3, weight_decay=1e-2)
        wt.grad = torch.tensor(g.copy())
        opt.step()
        # ours
        tx = build_optimizer({"name": "Adam", "lr": 1e-3, "weight_decay": 1e-2})
        state = tx.init(jnp.asarray(w0))
        direction, _ = tx.update(jnp.asarray(g), state, jnp.asarray(w0))
        ours = apply_direction(jnp.asarray(w0), direction, 1e-3)
        assert np.allclose(np.asarray(ours), wt.detach().numpy(), atol=1e-6)

    @staticmethod
    def _load_ref_adabound():
        """Import the reference's vendored AdaBound module directly from file
        (ref:generalframework/optim/adabound.py) without triggering the
        generalframework package __init__."""
        import importlib.util
        import warnings
        from pathlib import Path

        path = Path("/root/reference/generalframework/optim/adabound.py")
        if not path.exists():
            pytest.skip("reference checkout unavailable")
        spec = importlib.util.spec_from_file_location("ref_adabound", path)
        mod = importlib.util.module_from_spec(spec)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # old add_(Number, Tensor) overload
            spec.loader.exec_module(mod)
        return mod

    def _run_adabound_pair(self, *, lr, final_lr, gamma, weight_decay, amsbound,
                           variant, n_steps, grad_scale=1.0):
        """Run torch (vendored) and ours for n_steps on identical grads; return
        both trajectories of the flattened weight."""
        import warnings

        from dct_tpu.optim import apply_direction, build_optimizer

        mod = self._load_ref_adabound()
        cls = mod.AdaBoundW if variant == "AdaBoundW" else mod.AdaBound
        w0 = rand((6, 4), 30)
        grads = [rand((6, 4), 31 + i) * grad_scale for i in range(n_steps)]

        wt = torch.tensor(w0.copy(), requires_grad=True)
        opt = cls([wt], lr=lr, final_lr=final_lr, gamma=gamma,
                  weight_decay=weight_decay, amsbound=amsbound)
        torch_traj = []
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            for g in grads:
                wt.grad = torch.tensor(g.copy())
                opt.step()
                torch_traj.append(wt.detach().numpy().copy())

        tx = build_optimizer({"name": variant, "lr": lr, "final_lr": final_lr,
                              "gamma": gamma, "weight_decay": weight_decay,
                              "amsbound": amsbound})
        w = jnp.asarray(w0)
        state = tx.init(w)
        ours_traj = []
        for g in grads:
            d, state = tx.update(jnp.asarray(g), state, w)
            w = apply_direction(w, d, lr)
            ours_traj.append(np.asarray(w).copy())
        return torch_traj, ours_traj

    def test_adabound_vs_reference(self):
        """scale_by_adabound vs ref:generalframework/optim/adabound.py:6-117
        over 12 steps with L2 weight decay."""
        torch_traj, ours_traj = self._run_adabound_pair(
            lr=1e-3, final_lr=0.1, gamma=1e-3, weight_decay=1e-2,
            amsbound=False, variant="AdaBound", n_steps=12)
        for t, o in zip(torch_traj, ours_traj):
            assert np.allclose(o, t, atol=1e-6)

    def test_adabound_transition_region(self):
        """Large gamma + tiny grads force both clamp bounds to bind (the
        Adam→SGD transition, ref:adabound.py:108-113): tiny grads → huge raw
        Adam step → upper clamp; large v elements → lower clamp."""
        torch_traj, ours_traj = self._run_adabound_pair(
            lr=1e-2, final_lr=0.1, gamma=0.3, weight_decay=0.0,
            amsbound=False, variant="AdaBound", n_steps=15, grad_scale=1e-4)
        for t, o in zip(torch_traj, ours_traj):
            assert np.allclose(o, t, atol=1e-6)
        # sanity: the bound window actually tightened during the run
        assert not np.allclose(torch_traj[0], torch_traj[-1])

    def test_adabound_amsbound(self):
        torch_traj, ours_traj = self._run_adabound_pair(
            lr=1e-3, final_lr=0.1, gamma=1e-3, weight_decay=0.0,
            amsbound=True, variant="AdaBound", n_steps=10)
        for t, o in zip(torch_traj, ours_traj):
            assert np.allclose(o, t, atol=1e-6)

    def test_adaboundw_decoupled_decay(self):
        """AdaBoundW: decay applied to p AFTER the bounded step, unscaled by lr
        (ref:adabound.py:226-229) — exact at constant lr."""
        torch_traj, ours_traj = self._run_adabound_pair(
            lr=1e-3, final_lr=0.1, gamma=1e-3, weight_decay=1e-2,
            amsbound=False, variant="AdaBoundW", n_steps=10)
        for t, o in zip(torch_traj, ours_traj):
            assert np.allclose(o, t, atol=1e-6)

    def test_sgd_momentum(self):
        from dct_tpu.optim import apply_direction, build_optimizer

        w0 = rand((5,), 22)
        g1 = rand((5,), 23)
        g2 = rand((5,), 24)
        wt = torch.tensor(w0.copy(), requires_grad=True)
        opt = torch.optim.SGD([wt], lr=0.1, momentum=0.9)
        for g in (g1, g2):
            wt.grad = torch.tensor(g.copy())
            opt.step()
        tx = build_optimizer({"name": "SGD", "lr": 0.1, "momentum": 0.9})
        w = jnp.asarray(w0)
        state = tx.init(w)
        for g in (g1, g2):
            d, state = tx.update(jnp.asarray(g), state, w)
            w = apply_direction(w, d, 0.1)
        assert np.allclose(np.asarray(w), wt.detach().numpy(), atol=1e-6)
