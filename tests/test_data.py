"""Dataset / splits / sampler / pipeline / augmentation tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dct_tpu.data import (
    DeviceDataset,
    EpochBatcher,
    InfiniteBatcher,
    MedicalImageDataset,
    PatientBuckets,
    PatientSampler,
    augment_batch,
    get_acdc_split_datasets,
    parse_transform_size,
)
from dct_tpu.data.pipeline import normalize_gather

from helpers import make_synthetic_acdc


@pytest.fixture(scope="module")
def acdc_root(tmp_path_factory):
    return make_synthetic_acdc(tmp_path_factory.mktemp("acdc"))


class TestDataset:
    def test_parse_transform_size(self):
        assert parse_transform_size("segment_transform((256,256))") == (256, 256)
        assert parse_transform_size((64, 64)) == (64, 64)
        assert parse_transform_size(None) == (256, 256)

    def test_load(self, acdc_root):
        ds = MedicalImageDataset(acdc_root, "train", transform=(32, 32), quite=True)
        assert len(ds) == 40
        assert ds.data["img"].shape == (40, 32, 32)
        assert ds.data["img"].dtype == np.uint8
        assert set(np.unique(ds.data["gt"])) <= {0, 1, 2, 3}

    def test_resize_on_load(self, acdc_root):
        ds = MedicalImageDataset(acdc_root, "train", transform=(16, 16), quite=True)
        assert ds.data["img"].shape == (40, 16, 16)
        # nearest for gt keeps labels intact
        assert set(np.unique(ds.data["gt"])) <= {0, 1, 2, 3}

    def test_filter_by_patterns(self, acdc_root):
        ds = MedicalImageDataset(acdc_root, "train", transform=(32, 32), quite=True)
        sub = ds.filter_by_patterns(["patient001", "patient002"])
        assert len(sub) == 8
        assert all(s.startswith(("patient001", "patient002")) for s in sub.filenames)
        # parent untouched
        assert len(ds) == 40


class TestSplits:
    def test_acdc_split_partition(self, acdc_root):
        np.random.seed(1234)
        config = {
            "Dataset": {"root_dir": str(acdc_root), "transform": (32, 32),
                        "subfolders": ["img", "gt"], "quite": True},
            "Lab_Partitions": {"num_models": 2, "partition_sets": 0.5,
                               "partition_overlap": 1},
        }
        # 10 patients → ratio .5: labeled = patients 1..5, unlabeled 6..10... but
        # the reference hardcodes 100 patients; with overlap=1 all labeled shared.
        labeled, unlab, val = get_acdc_split_datasets(config)
        assert len(labeled) == 2
        # overlap=1 → identical partitions
        assert sorted(labeled[0].filenames) == sorted(labeled[1].filenames)
        assert len(val) == 12

    def test_partition_overlap_zero(self, acdc_root):
        np.random.seed(7)
        config = {
            "Dataset": {"root_dir": str(acdc_root), "transform": (32, 32),
                        "subfolders": ["img", "gt"], "quite": True},
            "Lab_Partitions": {"num_models": 2, "partition_sets": 0.1,
                               "partition_overlap": 0},
        }
        labeled, unlab, val = get_acdc_split_datasets(config)
        # disjoint labeled partitions
        assert not set(labeled[0].filenames) & set(labeled[1].filenames)

    def test_seed_reproducible(self, acdc_root):
        config = {
            "Dataset": {"root_dir": str(acdc_root), "transform": (32, 32),
                        "subfolders": ["img", "gt"], "quite": True},
            "Lab_Partitions": {"num_models": 2, "partition_sets": 0.5,
                               "partition_overlap": 0.5},
        }
        np.random.seed(42)
        a, _, _ = get_acdc_split_datasets(config)
        np.random.seed(42)
        b, _, _ = get_acdc_split_datasets(config)
        assert [x.filenames for x in a] == [x.filenames for x in b]


class TestSamplerBuckets:
    def test_patient_sampler_groups(self, acdc_root):
        ds = MedicalImageDataset(acdc_root, "val", transform=(32, 32), quite=True)
        sampler = PatientSampler(ds, r"(patient\d+_\d+)_\d+", quite=True)
        batches = list(sampler)
        assert len(batches) == 3
        assert sum(len(b) for b in batches) == len(ds)

    def test_patient_buckets(self, acdc_root):
        ds = MedicalImageDataset(acdc_root, "val", transform=(32, 32), quite=True)
        buckets = PatientBuckets(ds, r"(patient\d+_\d+)_\d+", round_to=8)
        assert len(buckets) == 3
        assert buckets.indices.shape == (3, 8)
        assert buckets.mask.sum() == len(ds)
        # masked indices point at the right patient's slices
        for p, name in enumerate(buckets.patients):
            idxs = buckets.indices[p][buckets.mask[p]]
            assert all(ds.filenames[i].startswith(name) for i in idxs)


class TestBatchers:
    def test_epoch_batcher_drop_last(self):
        b = EpochBatcher(10, 4, shuffle=True, drop_last=True)
        idx = b.epoch(np.random.RandomState(0))
        assert idx.shape == (2, 4)
        assert len(set(idx.flatten())) == 8

    def test_infinite_batcher_cycles(self):
        b = InfiniteBatcher(6, 4, np.random.RandomState(0))
        out = b.take(5)
        assert out.shape == (5, 4)
        # every item appears eventually
        assert set(out.flatten().tolist()) == set(range(6))

    def test_device_dataset_gather(self, acdc_root):
        ds = MedicalImageDataset(acdc_root, "train", transform=(32, 32), quite=True)
        dev = DeviceDataset(ds)
        img, gt = jax.jit(normalize_gather)(dev.img, dev.gt, jnp.arange(4))
        assert img.shape == (4, 32, 32, 1) and img.dtype == jnp.float32
        assert float(img.max()) <= 1.0
        assert gt.shape == (4, 32, 32) and gt.dtype == jnp.int32


class TestAugment:
    def test_shapes_and_labels(self, rng, acdc_root):
        ds = MedicalImageDataset(acdc_root, "train", transform=(32, 32), quite=True)
        img = jnp.asarray(ds.data["img"][:8], jnp.float32)[..., None] / 255.0
        gt = jnp.asarray(ds.data["gt"][:8], jnp.int32)
        img_a, gt_a = jax.jit(augment_batch)(img, gt, rng)
        assert img_a.shape == img.shape and gt_a.shape == gt.shape
        assert set(np.unique(np.asarray(gt_a))) <= {0, 1, 2, 3}

    def test_deterministic_given_key(self, rng):
        img = jnp.ones((2, 16, 16, 1))
        gt = jnp.zeros((2, 16, 16), jnp.int32)
        a1, _ = augment_batch(img, gt, rng)
        a2, _ = augment_batch(img, gt, rng)
        assert np.allclose(np.asarray(a1), np.asarray(a2))

    def test_different_keys_differ(self):
        rs = np.random.RandomState(3)
        img = jnp.asarray(rs.rand(4, 16, 16, 1).astype(np.float32))
        gt = jnp.zeros((4, 16, 16), jnp.int32)
        a1, _ = augment_batch(img, gt, jax.random.PRNGKey(1))
        a2, _ = augment_batch(img, gt, jax.random.PRNGKey(2))
        assert not np.allclose(np.asarray(a1), np.asarray(a2))

    def test_joint_img_gt_transform(self, rng):
        # gt == quantized img ⇒ after joint aug they must stay aligned
        rs = np.random.RandomState(5)
        base = (rs.rand(4, 32, 32) > 0.5).astype(np.float32)
        img = jnp.asarray(base)[..., None]
        gt = jnp.asarray(base.astype(np.int32))
        img_a, gt_a = augment_batch(img, gt, rng)
        # compare where bilinear didn't blend (interior of constant regions)
        agree = (np.round(np.asarray(img_a[..., 0])) == np.asarray(gt_a)).mean()
        assert agree > 0.9


def test_fused_augment_matches_per_stream():
    """The co-train step's fused gather+warp (steps.py one_step) must equal
    the separate per-stream augment_batch calls bit-for-bit — each stream's
    thetas come from the same fold_in key either way."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dct_tpu.data.augment import (augment_batch, augment_batch_with_thetas,
                                      sample_aug_thetas)
    from dct_tpu.data.pipeline import normalize_gather

    rs = np.random.RandomState(0)
    N, H, K, B, Bu = 40, 32, 2, 4, 4
    img_u8 = jnp.asarray(rs.randint(0, 255, (N, H, H), np.uint8))
    gt_u8 = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))
    idx_lab = jnp.asarray(rs.randint(0, N, (K, B)).astype(np.int32))
    idx_unlab = jnp.asarray(rs.randint(0, N, (Bu,)).astype(np.int32))
    k = jax.random.PRNGKey(7)

    outs = []
    for i in range(K):
        im, g = normalize_gather(img_u8, gt_u8, idx_lab[i])
        outs.append(augment_batch(im, g, jax.random.fold_in(k, i)))
    uim, ug = normalize_gather(img_u8, gt_u8, idx_unlab)
    uout = augment_batch(uim, ug, jax.random.fold_in(k, 101))

    idx_all = jnp.concatenate([idx_lab.reshape(-1), idx_unlab])
    ia, ga = normalize_gather(img_u8, gt_u8, idx_all)
    thetas = jnp.concatenate(
        [sample_aug_thetas(jax.random.fold_in(k, i), B, H, H)
         for i in range(K)]
        + [sample_aug_thetas(jax.random.fold_in(k, 101), Bu, H, H)], 0)
    ia, ga = augment_batch_with_thetas(ia, ga, thetas)

    for i in range(K):
        np.testing.assert_array_equal(np.asarray(outs[i][0]),
                                      np.asarray(ia[i * B:(i + 1) * B]))
        np.testing.assert_array_equal(np.asarray(outs[i][1]),
                                      np.asarray(ga[i * B:(i + 1) * B]))
    np.testing.assert_array_equal(np.asarray(uout[0]), np.asarray(ia[K * B:]))
    np.testing.assert_array_equal(np.asarray(uout[1]), np.asarray(ga[K * B:]))


def test_warp_gather_normalize_exact():
    """The one-gather dataset warp must equal gather→normalize→warp exactly
    (the /255 normalization is per-pixel, so it commutes with nearest
    resampling; fills match in normalized space)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dct_tpu.data.augment import augment_batch_with_thetas, sample_aug_thetas
    from dct_tpu.data.pipeline import normalize_gather, warp_gather_normalize

    rs = np.random.RandomState(1)
    N, H = 30, 32
    img_u8 = jnp.asarray(rs.randint(0, 255, (N, H, H), np.uint8))
    gt_u8 = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))
    idx = jnp.asarray(rs.randint(0, N, (12,)).astype(np.int32))
    thetas = sample_aug_thetas(jax.random.PRNGKey(3), 12, H, H)

    im_a, gt_a = normalize_gather(img_u8, gt_u8, idx)
    im_a, gt_a = augment_batch_with_thetas(im_a, gt_a, thetas)
    im_b, gt_b = warp_gather_normalize(img_u8, gt_u8, idx, thetas)
    np.testing.assert_array_equal(np.asarray(gt_a), np.asarray(gt_b))
    np.testing.assert_allclose(np.asarray(im_a), np.asarray(im_b), atol=1e-7)


def test_augment_u8_matches_f32_path():
    """The uint8-warp fast path (warp the gathered u8 batch, normalize
    after) must be bit-identical to normalize→f32-stack→warp: the nearest
    warp is a per-pixel permutation-with-fill, so it commutes with /255."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dct_tpu.data.augment import (augment_batch_with_thetas,
                                      augment_u8_with_thetas,
                                      sample_aug_thetas)
    from dct_tpu.data.pipeline import normalize_gather

    rs = np.random.RandomState(2)
    N, H = 30, 32
    img_u8 = jnp.asarray(rs.randint(0, 256, (N, H, H), np.uint8))
    gt_u8 = jnp.asarray(rs.randint(0, 4, (N, H, H)).astype(np.uint8))
    idx = jnp.asarray(rs.randint(0, N, (12,)).astype(np.int32))
    thetas = sample_aug_thetas(jax.random.PRNGKey(5), 12, H, H)

    im_a, gt_a = normalize_gather(img_u8, gt_u8, idx)
    im_a, gt_a = augment_batch_with_thetas(im_a, gt_a, thetas)
    im_b, gt_b = augment_u8_with_thetas(jnp.take(img_u8, idx, axis=0),
                                        jnp.take(gt_u8, idx, axis=0), thetas)
    np.testing.assert_array_equal(np.asarray(gt_a), np.asarray(gt_b))
    np.testing.assert_array_equal(np.asarray(im_a), np.asarray(im_b))
