"""Device-resident data pipeline: one HBM upload, index-gather batching.

The reference feeds training through forked DataLoader workers doing per-item
PIL decode + host→device copies every batch (ref:config/ACDC_config_cotraing.yaml:25,
ref:cotraining_totalloss.py:209-222). The TPU pipeline uploads the packed
uint8 arrays to HBM once; a "batch" is then an int32 index array and the
gather happens inside the jitted step (followed by on-device normalize +
augment). Host work per epoch: one permutation.
"""
from __future__ import annotations

import re
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dataset import MedicalImageDataset


class DeviceDataset:
    """The packed arrays of a MedicalImageDataset pushed to device.

    ``img``/``gt`` are uint8 (N,H,W) jax arrays (optionally sharded); indexing
    and normalization happen inside jitted code.
    """

    def __init__(self, ds: MedicalImageDataset, sharding=None,
                 img_key: str = "img", gt_key: str = "gt") -> None:
        put = (lambda a: jax.device_put(a, sharding)) if sharding is not None \
            else jax.device_put
        self.img = put(ds.data[img_key])
        self.gt = put(ds.data[gt_key])
        self.filenames = ds.filenames
        self.n = len(ds)

    def __len__(self) -> int:
        return self.n


def normalize_gather(img_u8: jnp.ndarray, gt_u8: jnp.ndarray, idx: jnp.ndarray,
                     dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather a batch by indices and normalize: uint8 → [0,1] float
    (B,H,W,C) — grayscale (N,H,W) arrays gain a channel axis, RGB (N,H,W,3)
    keep theirs — labels → int32 (B,H,W). Call inside jit (ToTensor parity)."""
    img = jnp.take(img_u8, idx, axis=0).astype(dtype) / 255.0
    gt = jnp.take(gt_u8, idx, axis=0).astype(jnp.int32)
    if img.ndim == 3:
        img = img[..., None]
    return img, gt


def gather_augment_u8(img_u8: jnp.ndarray, gt_u8: jnp.ndarray,
                      idx: jnp.ndarray, key, dtype=jnp.float32
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``normalize_gather`` + joint nearest warp of the gathered batch.
    Grayscale (N,H,W) datasets route through ``augment.warp_gathered_u8``
    (normalize-then-warp, the measured-fastest inner path — the warp-on-u8
    variant is bit-identical but ~2% slower in the real epoch, see
    bench_aug_ab.py / BASELINE.md); channeled data falls back to
    normalize → ``augment_batch``."""
    from .augment import augment_batch, sample_aug_thetas, warp_gathered_u8
    if img_u8.ndim != 3:
        img, gt = normalize_gather(img_u8, gt_u8, idx, dtype)
        return augment_batch(img, gt, key)
    b = idx.shape[0]
    h, w = img_u8.shape[1], img_u8.shape[2]
    thetas = sample_aug_thetas(key, b, h, w)
    return warp_gathered_u8(jnp.take(img_u8, idx, axis=0),
                            jnp.take(gt_u8, idx, axis=0), thetas, dtype)


def warp_gather_normalize(img_u8: jnp.ndarray, gt_u8: jnp.ndarray,
                          idx: jnp.ndarray, thetas: jnp.ndarray,
                          dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``normalize_gather`` + nearest affine warp as ONE gather straight out
    of the uint8 dataset array — the /255 normalization is per-pixel, so it
    commutes with the warp exactly, and the (B,H,W) f32 intermediate the
    two-step path materializes is never written. Grayscale (N,H,W) datasets
    only (the medical pipeline); out-of-bounds pixels fill with 0 in both
    image (post-normalize, like affine_warp's fill=0.0) and labels.

    Exactness vs normalize_gather→augment_batch_with_thetas is pinned by
    tests/test_data.py::test_warp_gather_normalize_exact. NOTE: measured
    SLOWER than the two-step path in the co-train hot loop (148.4 vs 180.3
    img/s on the bench config — arbitrary indices into the ~110M-element
    dataset array lose the per-image gather's locality), so the step keeps
    the two-step path; this stays available for small device arrays."""
    from ..ops.warp import _grid
    assert img_u8.ndim == 3, "fused warp-gather supports grayscale (N,H,W)"
    n, h, w = img_u8.shape
    assert n * h * w < 2 ** 31, "flat index would overflow int32"
    yy, xx = _grid(h, w)

    def coords(theta):
        sy = theta[0, 0] * yy + theta[0, 1] * xx + theta[0, 2] + (h - 1) / 2.0
        sx = theta[1, 0] * yy + theta[1, 1] * xx + theta[1, 2] + (w - 1) / 2.0
        iy = jnp.round(sy).astype(jnp.int32)
        ix = jnp.round(sx).astype(jnp.int32)
        valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        return jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1), valid

    iy, ix, valid = jax.vmap(coords)(thetas)                  # (B,H,W)
    flat = (idx[:, None, None] * h + iy) * w + ix
    img = jnp.take(img_u8.reshape(-1), flat, axis=0).astype(dtype) / 255.0
    img = jnp.where(valid, img, 0.0)[..., None]
    gt = jnp.take(gt_u8.reshape(-1), flat, axis=0).astype(jnp.int32)
    gt = jnp.where(valid, gt, 0)
    return img, gt


class EpochBatcher:
    """Shuffled, drop-last batch indices for one pass (torch DataLoader parity)."""

    def __init__(self, n: int, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True) -> None:
        assert n >= batch_size, (n, batch_size)
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last

    def epoch(self, rs: np.random.RandomState) -> np.ndarray:
        order = rs.permutation(self.n) if self.shuffle else np.arange(self.n)
        n_batches = self.n // self.batch_size if self.drop_last \
            else -(-self.n // self.batch_size)
        if not self.drop_last and self.n % self.batch_size:
            pad = n_batches * self.batch_size - self.n
            order = np.concatenate([order, order[:pad]])
        return order[:n_batches * self.batch_size].reshape(n_batches, self.batch_size)


class InfiniteBatcher:
    """Endless reshuffling batch stream (ref:utils.py:254-275 iterator_):
    ``take(k)`` → (k, B) indices, spanning epochs as needed."""

    def __init__(self, n: int, batch_size: int, rs: np.random.RandomState,
                 shuffle: bool = True) -> None:
        self.inner = EpochBatcher(n, batch_size, shuffle, drop_last=True)
        self.rs = rs
        self._buf = self.inner.epoch(self.rs)
        self._pos = 0

    def take(self, k: int) -> np.ndarray:
        out = []
        need = k
        while need > 0:
            avail = len(self._buf) - self._pos
            if avail == 0:
                self._buf = self.inner.epoch(self.rs)
                self._pos = 0
                continue
            grab = min(avail, need)
            out.append(self._buf[self._pos:self._pos + grab])
            self._pos += grab
            need -= grab
        return np.concatenate(out, axis=0)


class PatientBuckets:
    """Patient-grouped, padded eval batches.

    The reference's PatientSampler yields one variable-size batch per patient
    (ref:ACDC_helper.py:27-67); variable shapes would retrace every patient,
    so volumes are padded to the max slice count (rounded up to a multiple of
    ``round_to``) with a validity mask. 3D dice reduces over masked slices
    only — the ``bcwh->c`` whole-volume definition is preserved.
    """

    def __init__(self, ds: MedicalImageDataset, grp_regex: str,
                 round_to: int = 8) -> None:
        pattern = re.compile(grp_regex)
        groups: Dict[str, List[int]] = {}
        for i, stem in enumerate(ds.filenames):
            m = pattern.match(stem)
            assert m, f"{stem!r} !~ {grp_regex!r}"
            groups.setdefault(m.group(1), []).append(i)
        self.patients = sorted(groups)
        max_len = max(len(v) for v in groups.values())
        self.bucket_len = -(-max_len // round_to) * round_to
        P = len(self.patients)
        self.indices = np.zeros((P, self.bucket_len), np.int32)
        self.mask = np.zeros((P, self.bucket_len), bool)
        for p, name in enumerate(self.patients):
            idxs = groups[name]
            self.indices[p, :len(idxs)] = idxs
            self.mask[p, :len(idxs)] = True

    def __len__(self) -> int:
        return len(self.patients)
