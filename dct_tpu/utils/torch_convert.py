"""torch state_dict → flax pytree conversion (COCO-pretrained DeepLabV2 init).

The reference initializes its Cityscapes trainers from
``deeplabv2_resnet101_COCO_init.pth`` with ``scale.`` prefixes stripped and
``strict=False`` (ref:generalframework/trainer/trainer_city.py:56-66). That
file is not downloadable in this environment, so this module converts any
such torch checkpoint into dct_tpu's DeepLabV2 param/batch-stats pytrees.
The flax module tree intentionally mirrors the torch names
(ref:generalframework/arch/deeplab/{deeplabv2,resnet}.py):

    torch  layer1.conv1.conv.weight            → trunk/layer1_conv1/Conv_0/kernel
    torch  layerN.blockM.reduce.bn.weight      → trunk/layerN/blockM/reduce/BatchNorm_0/scale
    torch  layerN.blockM.*.bn.running_mean     → batch_stats …/BatchNorm_0/mean
    torch  aspp.stages.cI.{weight,bias}        → aspp/cI/{kernel,bias}

Conv kernels transpose (O,I,kh,kw) → (kh,kw,I,O). Mismatched shapes (e.g. a
COCO class head vs a 19-class model) are skipped, matching the reference's
``strict=False`` load.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

_BN_MAP = {"weight": ("params", "scale"), "bias": ("params", "bias"),
           "running_mean": ("batch_stats", "mean"),
           "running_var": ("batch_stats", "var")}


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):          # torch tensor, no torch import needed
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def deeplabv2_key_to_path(key: str) -> Optional[Tuple[str, Tuple[str, ...], bool]]:
    """torch state_dict key → (collection, flax path, transpose_conv).
    Returns None for keys to skip (num_batches_tracked, unknown)."""
    key = key[len("scale."):] if key.startswith("scale.") else key
    if key.endswith("num_batches_tracked"):
        return None

    m = re.fullmatch(r"layer1\.conv1\.(conv|bn)\.(\w+)", key)
    if m:
        base: Tuple[str, ...] = ("trunk", "layer1_conv1")
        sub, leaf = m.group(1), m.group(2)
    else:
        m = re.fullmatch(
            r"(layer[2-5])\.(block\d+)\.(reduce|conv3x3|increase|proj)\.(conv|bn)\.(\w+)",
            key)
        if m:
            base = ("trunk", m.group(1), m.group(2), m.group(3))
            sub, leaf = m.group(4), m.group(5)
        else:
            m2 = re.fullmatch(r"aspp\.stages\.(c\d+)\.(weight|bias)", key)
            if m2:
                leaf = "kernel" if m2.group(2) == "weight" else "bias"
                return ("params", ("aspp", m2.group(1), leaf),
                        m2.group(2) == "weight")
            return None

    if sub == "conv":
        if leaf != "weight":
            return None
        return ("params", base + ("Conv_0", "kernel"), True)
    if leaf not in _BN_MAP:
        return None
    coll, flax_leaf = _BN_MAP[leaf]
    return (coll, base + ("BatchNorm_0", flax_leaf), False)


def convert_deeplabv2(state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """torch DeepLabV2(-ResNet101) state_dict → {'params': …, 'batch_stats': …}
    nested dicts in dct_tpu's DeepLabV2 layout."""
    out: Dict[str, Dict] = {"params": {}, "batch_stats": {}}
    for key, val in state_dict.items():
        mapped = deeplabv2_key_to_path(key)
        if mapped is None:
            continue
        coll, path, transpose = mapped
        arr = _to_numpy(val)
        if transpose and arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)   # (O,I,kh,kw) → (kh,kw,I,O)
        node = out[coll]
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    return out


def merge_pytree(dst: Dict, src: Dict) -> Tuple[Dict, int, int]:
    """Recursively copy matching-shape leaves of ``src`` onto a copy of
    ``dst``; returns (merged, n_loaded, n_skipped) — strict=False semantics."""
    loaded = skipped = 0

    def rec(d, s):
        nonlocal loaded, skipped
        out = {}
        for k, v in d.items():
            if k in s:
                if isinstance(v, dict) and isinstance(s[k], dict):
                    out[k] = rec(v, s[k])
                    continue
                sv = np.asarray(s[k])
                if hasattr(v, "shape") and tuple(v.shape) == tuple(sv.shape):
                    out[k] = sv.astype(np.asarray(v).dtype)
                    loaded += 1
                else:
                    out[k] = v
                    skipped += 1
            else:
                out[k] = v
        return out

    return rec(dst, src), loaded, skipped


def init_from_torch_deeplab(state: Dict, torch_state_dict: Dict[str, Any],
                            verbose: bool = True) -> Dict:
    """Merge a torch DeepLabV2 checkpoint (raw state_dict, or one already
    converted by ``convert_deeplabv2``/the CLI) into a Segmentator-style
    ``{'params','batch_stats',...}`` state. Returns the new state."""
    if set(torch_state_dict.keys()) == {"params", "batch_stats"}:
        conv = torch_state_dict          # pre-converted payload
    else:
        conv = convert_deeplabv2(torch_state_dict)
    params, n_p, s_p = merge_pytree(state["params"], conv["params"])
    bstats, n_b, s_b = merge_pytree(state["batch_stats"], conv["batch_stats"])
    assert n_p + n_b > 0, "no torch weights matched the flax tree"
    if verbose:
        print(f">> torch init: loaded {n_p + n_b} tensors, "
              f"skipped {s_p + s_b} (shape mismatch)")
    return {**state, "params": params, "batch_stats": bstats}


def main(argv=None) -> None:
    """CLI: convert a .pth into a dct_tpu checkpoint pytree.

    python -m dct_tpu.utils.torch_convert --pth deeplabv2_COCO_init.pth \
        --out coco_init.ckpt
    """
    import argparse

    from ..checkpoint import save_checkpoint

    parser = argparse.ArgumentParser(description="torch → dct_tpu converter")
    parser.add_argument("--pth", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    import torch  # cpu build is available in this image
    sd = torch.load(args.pth, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    save_checkpoint(args.out, convert_deeplabv2(sd))
    print(f">> wrote {args.out}")


if __name__ == "__main__":
    main()
