"""torch → flax DeepLabV2 weight conversion round-trip."""
import jax
import numpy as np

from dct_tpu.models import Segmentator
from dct_tpu.utils.torch_convert import (convert_deeplabv2,
                                         init_from_torch_deeplab, merge_pytree)

ADAM = {"name": "Adam", "lr": 1e-3}
STEP = {"name": "StepLR", "step_size": 90, "gamma": 0.1}


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


def _torch_key(coll, path):
    """Inverse of deeplabv2_key_to_path (test-local oracle)."""
    if path[0] == "aspp":
        return f"aspp.stages.{path[1]}." + ("weight" if path[2] == "kernel"
                                            else "bias")
    trunk = "layer1.conv1" if path[1] == "layer1_conv1" else ".".join(path[1:-2])
    if path[-2] == "Conv_0":
        return f"{trunk}.conv.weight"
    leaf = {"scale": "weight", "bias": "bias",
            "mean": "running_mean", "var": "running_var"}[path[-1]]
    return f"{trunk}.bn.{leaf}"


def _build(num_classes=5):
    seg = Segmentator({"name": "deeplabv2", "num_classes": num_classes,
                       "n_blocks": [1, 1, 1, 1]}, ADAM, STEP,
                      jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    return seg


def _fake_torch_sd(state, prefix=""):
    sd = {}
    for path, arr in _flatten(state["params"]):
        v = arr.transpose(3, 2, 0, 1) if path[-1] == "kernel" and arr.ndim == 4 \
            else arr
        sd[prefix + _torch_key("params", path)] = v
    for path, arr in _flatten(state["batch_stats"]):
        sd[prefix + _torch_key("batch_stats", path)] = arr
    return sd


def test_round_trip_exact():
    seg = _build()
    # perturb so the test can't pass on untouched init values
    rs = np.random.RandomState(0)
    state = jax.tree_util.tree_map(
        lambda x: np.asarray(x) + rs.normal(0, 0.1, x.shape).astype(np.float32),
        {"params": seg.state["params"], "batch_stats": seg.state["batch_stats"]})
    sd = _fake_torch_sd(state, prefix="scale.")   # MSC wrapper prefix stripped
    sd["layer2.block1.reduce.bn.num_batches_tracked"] = np.int64(7)  # skipped

    conv = convert_deeplabv2(sd)
    n_leaves = len(list(_flatten(state["params"]))) \
        + len(list(_flatten(state["batch_stats"])))
    fresh = _build()
    merged, loaded, skipped = merge_pytree(fresh.state["params"], conv["params"])
    merged_bs, loaded_bs, skipped_bs = merge_pytree(fresh.state["batch_stats"],
                                                    conv["batch_stats"])
    assert loaded + loaded_bs == n_leaves
    assert skipped == skipped_bs == 0
    for path, arr in _flatten(state["params"]):
        node = merged
        for p in path:
            node = node[p]
        assert np.allclose(node, arr), path


def test_strict_false_skips_mismatched_head():
    donor = _build(num_classes=21)   # COCO-style head
    sd = _fake_torch_sd({"params": donor.state["params"],
                         "batch_stats": donor.state["batch_stats"]})
    target = _build(num_classes=5)
    new_state = init_from_torch_deeplab(target.state, sd, verbose=False)
    # trunk loaded, 4 ASPP class heads (kernel+bias each) skipped
    got = np.asarray(new_state["params"]["trunk"]["layer1_conv1"]["Conv_0"]["kernel"])
    want = np.asarray(donor.state["params"]["trunk"]["layer1_conv1"]["Conv_0"]["kernel"])
    assert np.allclose(got, want)
    head = np.asarray(new_state["params"]["aspp"]["c0"]["kernel"])
    orig = np.asarray(target.state["params"]["aspp"]["c0"]["kernel"])
    assert np.allclose(head, orig)   # mismatched head untouched
