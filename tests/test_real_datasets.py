"""Split-builder tests against the REAL dataset trees bundled with the
reference repo (read-only at /root/reference/dataset). Skipped when absent."""
from pathlib import Path

import numpy as np
import pytest

REF_DATA = Path("/root/reference/dataset")

pytestmark = pytest.mark.skipif(not REF_DATA.exists(),
                                reason="reference datasets not mounted")


class TestACDCReal:
    def test_split_counts(self):
        from dct_tpu.data.splits import get_acdc_split_datasets
        np.random.seed(1234)
        config = {
            "Dataset": {"root_dir": str(REF_DATA / "ACDC-all"),
                        "transform": "segment_transform((256,256))",
                        "subfolders": ["img", "gt"], "quite": True},
            "Lab_Partitions": {"num_models": 2, "partition_sets": 0.2,
                               "partition_overlap": 1},
        }
        labeled, unlab, val = get_acdc_split_datasets(config)
        # 1674 train slices total; patients 1..20 labeled, 21..100 unlabeled
        assert len(labeled[0]) + len(unlab) == 1674
        assert len(val) == 228
        assert sorted(labeled[0].filenames) == sorted(labeled[1].filenames)
        # gt classes are 0..3
        assert set(np.unique(labeled[0].data["gt"])) <= {0, 1, 2, 3}

    def test_patient_buckets_cover_val(self):
        from dct_tpu.data.dataset import MedicalImageDataset
        from dct_tpu.data.pipeline import PatientBuckets
        ds = MedicalImageDataset(REF_DATA / "ACDC-all", "val",
                                 transform=(256, 256), quite=True)
        buckets = PatientBuckets(ds, r"(patient\d+_\d+)_\d+")
        assert buckets.mask.sum() == len(ds)
        assert len(buckets) > 10


class TestGMReal:
    def test_gm_split(self):
        from dct_tpu.data.splits import get_gmc_split_datasets
        np.random.seed(1)
        config = {
            "Dataset": {"root_dir": str(REF_DATA / "GM_Challenge"),
                        "transform": "segment_transform((256,256))",
                        "subfolders": ["img", "gt"], "quite": True},
            "Lab_Partitions": {"num_models": 2, "partition_overlap": 0.5},
        }
        labeled, unlab, val = get_gmc_split_datasets(config)
        assert len(unlab) == 465
        # val = sites 3,4; train pool = site 1; no overlap between pools
        assert all(f.startswith(("site3", "site4")) for f in val.filenames)
        assert all(f.startswith("site1") for f in labeled[0].filenames)
        assert not set(labeled[0].filenames) & set(val.filenames)


class TestSpleenReal:
    def test_spleen_split(self):
        from dct_tpu.data.splits import get_spleen_split_datasets
        np.random.seed(2)
        config = {
            "Dataset": {"root_dir": str(REF_DATA / "Spleen"),
                        "transform": "segment_transform((256,256))",
                        "subfolders": ["img", "gt"], "quite": True},
            "Lab_Partitions": {"num_models": 2, "partition_sets": 0.2,
                               "partition_overlap": 1},
        }
        labeled, unlab, val = get_spleen_split_datasets(config)
        assert len(val) == 196
        assert len(labeled[0]) > 0 and len(unlab) > 0
        assert len(labeled[0]) + len(unlab) <= 1196
        assert set(np.unique(labeled[0].data["gt"])) <= {0, 1}
