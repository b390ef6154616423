"""Cityscapes dataset, packed-array style
(rebuild of ref:generalframework/dataset/citiyscapesDataloader.py + the
intended behavior of the dead ref:dataset/Cityscapes_helper.py:23-71).

Tree layout: ``root/leftImg8bit/{split}/{city}/*.png`` + matching
``root/gtFine/{split}/{city}/*_gtFine_labelIds.png``; 33 raw ids remap to 19
train classes with ignore_index=250 (ref::85-100,194-200). The reference
subsamples ``__len__ = files/20`` (ref::105) — exposed as ``subsample``.
RGB images resize bilinearly to ``image_size``; labels nearest.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Sequence, Tuple

import numpy as np
from PIL import Image

VOID_CLASSES = [0, 1, 2, 3, 4, 5, 6, 9, 10, 14, 15, 16, 18, 29, 30, -1]
VALID_CLASSES = [7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28,
                 31, 32, 33]
CLASS_NAMES = ["road", "sidewalk", "building", "wall", "fence", "pole",
               "traffic_light", "traffic_sign", "vegetation", "terrain", "sky",
               "person", "rider", "car", "truck", "bus", "train", "motorcycle",
               "bicycle"]
IGNORE_INDEX = 250
NUM_CLASSES = 19
CITYSCAPES_MEAN = (0.290101, 0.328081, 0.286964)
CITYSCAPES_STD = (0.182954, 0.186566, 0.184475)

_CLASS_MAP = dict(zip(VALID_CLASSES, range(NUM_CLASSES)))


def encode_segmap(mask: np.ndarray) -> np.ndarray:
    """Raw labelIds → 19 train ids, void → 250 (ref::194-200)."""
    out = np.full(mask.shape, IGNORE_INDEX, np.uint8)
    for raw, train_id in _CLASS_MAP.items():
        out[mask == raw] = train_id
    return out


def decode_segmap(mask: np.ndarray) -> np.ndarray:
    """19-class map → RGB visualization (ref colors table, ref::29-51)."""
    colors = np.array([[128, 64, 128], [244, 35, 232], [70, 70, 70],
                       [102, 102, 156], [190, 153, 153], [153, 153, 153],
                       [250, 170, 30], [220, 220, 0], [107, 142, 35],
                       [152, 251, 152], [0, 130, 180], [220, 20, 60],
                       [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100],
                       [0, 80, 100], [0, 0, 230], [119, 11, 32]], np.uint8)
    out = np.zeros(mask.shape + (3,), np.uint8)
    for c in range(NUM_CLASSES):
        out[mask == c] = colors[c]
    return out


class CityscapesDataset:
    """Packed RGB arrays: data['img'] uint8 (N,H,W,3), data['gt'] uint8 (N,H,W)."""

    def __init__(self, root_path: str, mode: str = "train",
                 image_size: Tuple[int, int] = (256, 512),
                 subsample: int = 20, quite: bool = False,
                 augmentation=None, is_transform: bool = True) -> None:
        self.root = Path(root_path)
        assert self.root.exists(), self.root
        assert mode in ("train", "test", "val"), mode
        self.mode = mode
        self.image_size = tuple(image_size)
        self.num_classes = NUM_CLASSES
        self.ignore_index = IGNORE_INDEX

        images_base = self.root / "leftImg8bit" / mode
        annotations_base = self.root / "gtFine" / mode
        assert images_base.exists(), images_base
        files = sorted(str(p) for p in images_base.rglob("*.png"))
        if not files:
            raise Exception(f"No files for split={mode} found in {images_base}")
        if subsample > 1:
            files = files[::subsample]   # ref __len__ = files/20 (ref::105)
        if not quite:
            print(f"Found {len(files)} {mode} images (subsample={subsample})")

        self.img_paths = files
        self.gt_paths = [str(annotations_base / Path(f).parent.name /
                             (Path(f).name.replace("leftImg8bit", "gtFine_labelIds")))
                         for f in files]
        self.filenames = [Path(f).stem for f in files]
        self.cities = [Path(f).parent.name for f in files]
        h, w = self.image_size
        img = np.empty((len(files), h, w, 3), np.uint8)
        gt = np.empty((len(files), h, w), np.uint8)
        for i, (ip, gp) in enumerate(zip(self.img_paths, self.gt_paths)):
            img[i] = np.asarray(Image.open(ip).convert("RGB").resize(
                (w, h), Image.BILINEAR))
            raw = np.asarray(Image.open(gp).resize((w, h), Image.NEAREST))
            gt[i] = encode_segmap(raw)
        self.data: Dict[str, np.ndarray] = {"img": img, "gt": gt}

    def __len__(self) -> int:
        return len(self.filenames)

    def subset(self, indices: Sequence[int]) -> "CityscapesDataset":
        new = object.__new__(CityscapesDataset)
        new.__dict__.update({k: v for k, v in self.__dict__.items()
                             if k not in ("data", "filenames", "cities",
                                          "img_paths", "gt_paths")})
        idx = np.asarray(indices, np.int64)
        new.filenames = [self.filenames[i] for i in idx]
        new.cities = [self.cities[i] for i in idx]
        new.img_paths = [self.img_paths[i] for i in idx]
        new.gt_paths = [self.gt_paths[i] for i in idx]
        new.data = {k: v[idx].copy() for k, v in self.data.items()}
        return new

    def extract_cities(self, cities: Sequence[str]) -> "CityscapesDataset":
        """(intent of ref:Cityscapes_helper.py:36-49)"""
        keep = [i for i, c in enumerate(self.cities) if c in set(cities)]
        return self.subset(keep)

    def split_by_proportion(self, p: float, seed: int = 0
                            ) -> Tuple["CityscapesDataset", "CityscapesDataset"]:
        """labeled/unlabeled split (intent of ref:Cityscapes_helper.py:52-71)."""
        rs = np.random.RandomState(seed)
        order = rs.permutation(len(self))
        n_lab = int(len(self) * p)
        return self.subset(sorted(order[:n_lab])), self.subset(sorted(order[n_lab:]))


def get_cityscapes_split(config: Dict):
    """K labeled + unlabeled + val CityscapesDatasets from a reference-style
    config (Dataset / Lab_Partitions blocks)."""
    ds_cfg = dict(config["Dataset"])
    root = ds_cfg.pop("root_dir")
    ds_cfg.pop("name", None)
    size = ds_cfg.get("image_size", (256, 512))
    subsample = int(ds_cfg.get("subsample", 20))
    train = CityscapesDataset(root, "train", size, subsample)
    val = CityscapesDataset(root, "val", size, subsample, quite=True)
    parts = config["Lab_Partitions"]
    n_models = int(parts["num_models"])
    lab_all, unlab = train.split_by_proportion(float(parts["partition_sets"]),
                                               seed=int(config.get("Seed", 1234)))
    overlap = float(parts["partition_overlap"])
    rs = np.random.RandomState(int(config.get("Seed", 1234)) + 1)
    n = len(lab_all)
    common = set(rs.choice(n, int(n * overlap), replace=False).tolist())
    exclusive = [i for i in range(n) if i not in common]
    labeled = [lab_all.subset(sorted(list(common) + exclusive[i::n_models]))
               for i in range(n_models)]
    return labeled, unlab, val
