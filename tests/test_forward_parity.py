"""Forward-level golden parity vs the reference torch nets.

Builds the *actual reference* torch modules (imported from /root/reference
with a torchvision stub — the reference only needs torchvision for archs not
under test here), converts their randomly-initialized weights with
utils.torch_convert, and asserts logit agreement with the dct_tpu flax
models on fixed inputs:

* Enet   — ref:generalframework/arch/enet.py:234-243
* UNet / UNet_bn — ref:generalframework/arch/network.py:196-290

plus parameter agreement after one SGD step on a CE loss (pins gradient
semantics: BN batch-stats normalization, PReLU grads, deconv transpose).
"""
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dct_tpu.models import get_arch
from dct_tpu.utils.torch_convert import convert_enet, convert_unet, merge_pytree

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_arch():
    """Import the reference arch package with a torchvision stub."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        m = types.ModuleType("torchvision.models")
        for name in ("vgg16", "vgg11", "resnet18", "resnet101", "vgg16_bn"):
            setattr(m, name, lambda *a, **k: None)
        tv.models = m
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = m
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import generalframework.arch.enet as ref_enet
    import generalframework.arch.network as ref_network
    return ref_enet, ref_network


def _count_leaves(tree):
    return len(jax.tree_util.tree_leaves(tree))


def _merge_all(variables, conv):
    """Strict merge: every converted tensor must land on a same-shape leaf
    and cover the whole flax tree."""
    params, n_p, s_p = merge_pytree(variables["params"], conv["params"])
    assert s_p == 0, f"shape-mismatched param leaves: {s_p}"
    assert n_p == _count_leaves(variables["params"]), (
        f"loaded {n_p} of {_count_leaves(variables['params'])} param leaves")
    out = {"params": params}
    if "batch_stats" in variables:   # plain UNet has no BN collection
        bstats, n_b, s_b = merge_pytree(variables["batch_stats"],
                                        conv["batch_stats"])
        assert s_b == 0, f"shape-mismatched bn leaves: {s_b}"
        assert n_b == _count_leaves(variables["batch_stats"])
        out["batch_stats"] = bstats
    else:
        assert not conv["batch_stats"], "converter produced unexpected BN stats"
    return out


def _torch_logits(net, x_t):
    import torch
    net.eval()
    with torch.no_grad():
        return net(x_t).numpy().transpose(0, 2, 3, 1)   # NCHW → NHWC


def test_enet_logit_parity(ref_arch):
    import torch
    ref_enet, _ = ref_arch
    torch.manual_seed(0)
    net = ref_enet.Enet(num_classes=4)
    conv = convert_enet(net.state_dict())

    model = get_arch("enet", {"num_classes": 4})
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 1)),
                           train=False)
    variables = _merge_all(variables, conv)

    rs = np.random.RandomState(1)
    x = rs.randn(2, 1, 64, 64).astype(np.float32)
    ref = _torch_logits(net, torch.from_numpy(x))
    got = np.asarray(model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 train=False))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("bn", [False, True])
def test_unet_logit_parity(ref_arch, bn):
    import torch
    _, ref_network = ref_arch
    torch.manual_seed(0)
    net = (ref_network.UNet_bn if bn else ref_network.UNet)(num_classes=4)
    conv = convert_unet(net.state_dict(), bn=bn)

    model = get_arch("unet_bn" if bn else "unet", {"num_classes": 4})
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 1)),
                           train=False)
    variables = _merge_all(variables, conv)

    rs = np.random.RandomState(2)
    x = rs.randn(1, 1, 256, 256).astype(np.float32)
    ref = _torch_logits(net, torch.from_numpy(x))
    got = np.asarray(model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 train=False))
    assert got.shape == ref.shape
    # 31M params / 23 conv layers deep: fp32 accumulation-order noise only
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_deeplabv2_logit_parity(ref_arch):
    """Validates torch_convert's deeplabv2 path (the COCO-init converter,
    ref:trainer_city.py:56-66) against the actual reference module
    (ref:generalframework/arch/deeplab/deeplabv2.py): random torch weights →
    flax, OS8 logits must agree."""
    import torch
    from generalframework.arch.deeplab.deeplabv2 import DeepLabV2 as RefV2

    from dct_tpu.utils.torch_convert import convert_deeplabv2

    torch.manual_seed(5)
    net = RefV2(num_classes=7)
    conv = convert_deeplabv2(net.state_dict())

    model = get_arch("deeplabv2", {"num_classes": 7})
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 65, 65, 3)),
                           train=False)
    variables = _merge_all(variables, conv)

    rs = np.random.RandomState(6)
    x = rs.randn(1, 3, 65, 65).astype(np.float32)
    ref = _torch_logits(net, torch.from_numpy(x))
    got = np.asarray(model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 train=False))
    assert got.shape == ref.shape    # (1, 9, 9, 7): OS8 ceil of 65
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_enet_sgd_step_parity(ref_arch):
    """One plain-SGD step on a CE loss: parameter agreement pins the whole
    backward pass (train-mode BN, PReLU, pool/unpool routing, deconvs).
    BN running *variances* are excluded: torch uses Bessel-corrected batch
    var for the running update, flax uses the biased var (documented
    divergence; normalization itself is biased in both)."""
    import torch
    import torch.nn.functional as F
    ref_enet, _ = ref_arch
    torch.manual_seed(3)
    net = ref_enet.Enet(num_classes=4)
    conv = convert_enet(net.state_dict())

    model = get_arch("enet", {"num_classes": 4})
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 64, 64, 1)),
                           train=False)
    variables = _merge_all(variables, conv)

    rs = np.random.RandomState(4)
    x = rs.randn(4, 1, 64, 64).astype(np.float32)
    y = rs.randint(0, 4, (4, 64, 64)).astype(np.int64)
    lr = 0.1

    # torch step (reference CE = NLL(log_softmax), ref:loss/loss.py:12-25)
    net.train()
    opt = torch.optim.SGD(net.parameters(), lr=lr)
    out = net(torch.from_numpy(x))
    loss_t = F.nll_loss(F.log_softmax(out, 1), torch.from_numpy(y))
    opt.zero_grad()
    loss_t.backward()
    opt.step()
    ref_after = convert_enet(net.state_dict())

    # jax step
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    yj = jax.nn.one_hot(jnp.asarray(y), 4)

    def loss_fn(params):
        logits, upd = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xj, train=True, mutable=["batch_stats"])
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.sum(yj * logp, axis=-1)), upd

    (loss_j, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t.item()), rtol=1e-5)
    new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g,
                                        variables["params"], grads)

    flat_ref = jax.tree_util.tree_flatten_with_path(ref_after["params"])[0]
    flat_got = dict(jax.tree_util.tree_flatten_with_path(new_params)[0])
    assert len(flat_ref) == len(flat_got)
    for path, ref_leaf in flat_ref:
        got_leaf = np.asarray(flat_got[path])
        np.testing.assert_allclose(
            got_leaf, ref_leaf, atol=2e-5, rtol=1e-3,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")

    # running means match (running vars differ by Bessel, see docstring)
    upd_means = {k: v["mean"] for k, v in _flat_bn(upd["batch_stats"]).items()}
    ref_means = {k: v["mean"] for k, v in _flat_bn(ref_after["batch_stats"]).items()}
    assert set(upd_means) == set(ref_means)
    for k in ref_means:
        np.testing.assert_allclose(np.asarray(upd_means[k]), ref_means[k],
                                   atol=1e-5, rtol=1e-4, err_msg=k)


def _flat_bn(tree, prefix=""):
    """Flatten {.../{mean,var}} BN subtrees keyed by their path string."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict) and "mean" in v and "var" in v:
            out[prefix + k] = v
        elif isinstance(v, dict):
            out.update(_flat_bn(v, prefix + k + "/"))
    return out
