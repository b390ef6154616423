#!/usr/bin/env python
"""Supervised Cityscapes entry point (parity with the reference's
Trainer_City path, ref:generalframework/trainer/trainer_city.py:29-66 driven
by ref:config/cityscapes_config.yml).

The reference's supervised arm trains one model on the full (subsampled)
train split — no label partitioning, no JSD/adv terms.

    python train_sup_city.py [--config configs/cityscapes_supervised.yaml] \
        Dataset.root_dir=/path/to/Cityscapes Trainer.save_dir=runs/city_sup
"""
from __future__ import annotations

import sys

from dct_tpu.config import yaml_parser
from dct_tpu.data.cityscapes import CityscapesDataset
from dct_tpu.losses import get_loss_fn
from dct_tpu.models import Segmentator
from dct_tpu.train import TrainerCity
from dct_tpu.utils.general import fix_all_seed

DEFAULT_CONFIG = "configs/cityscapes_supervised.yaml"


def main(argv=None) -> TrainerCity:
    config = yaml_parser(DEFAULT_CONFIG, argv)
    rng = fix_all_seed(int(config.get("Seed", 1234)))

    ds_cfg = dict(config["Dataset"])
    root = ds_cfg.pop("root_dir")
    size = tuple(ds_cfg.get("image_size", (512, 1024)))
    subsample = int(ds_cfg.get("subsample", 20))
    train = CityscapesDataset(root, "train", size, subsample)
    val = CityscapesDataset(root, "val", size, subsample, quite=True)

    h, w = size
    seg = Segmentator(config["Arch"], config["Optim"], config["Scheduler"],
                      rng, input_shape=(1, h, w, 3))

    loss_cfg = dict(config.get("Loss", {"name": "cross_entropy"}))
    criterion = get_loss_fn(loss_cfg.pop("name"), **loss_cfg)

    trainer_cfg = config["Trainer"]
    # Trainer.parallel: any value → data-only GSPMD DP mesh over all chips
    mesh = None
    if trainer_cfg.get("parallel") is not None:
        from dct_tpu.parallel import data_parallel_mesh
        mesh = data_parallel_mesh()
        if mesh is not None:
            print(f">> parallel mesh: {dict(mesh.shape)}")
    trainer = TrainerCity(
        seg, train, train, val, criterion,
        max_epoch=int(trainer_cfg["max_epoch"]),
        save_dir=trainer_cfg["save_dir"],
        checkpoint=trainer_cfg.get("checkpoint"),
        metricname=trainer_cfg.get("metricname", "metrics.csv"),
        batch_size=int(config.get("Dataloader", {}).get("batch_size", 4)),
        seed=int(config.get("Seed", 1234)),
        augmentations=config["Dataset"].get("augmentations"),
        nan_policy=trainer_cfg.get("nan_policy", "warn"),
        whole_config=config,
        mesh=mesh,
    )
    trainer.start_training(**{k: v for k, v in
                              config.get("StartTraining", {}).items()
                              if k == "save_val"})
    return trainer


if __name__ == "__main__":
    main(sys.argv[1:])
