#!/usr/bin/env python
"""Supervised baseline entry point (parity with the reference's Trainer path,
ref:generalframework/trainer/trainer.py via test/test_trainer.py style usage).

    python train_sup.py [--config configs/acdc_supervised.yaml] \
        Trainer.save_dir=runs/sup Dataset.root_dir=dataset/ACDC-all
"""
from __future__ import annotations

import sys

from dct_tpu.config import yaml_parser
from dct_tpu.data.dataset import MedicalImageDataset, parse_transform_size
from dct_tpu.losses import get_loss_fn
from dct_tpu.models import Segmentator
from dct_tpu.train import Trainer
from dct_tpu.utils.general import fix_all_seed

DEFAULT_CONFIG = "configs/acdc_supervised.yaml"


def main(argv=None) -> Trainer:
    config = yaml_parser(DEFAULT_CONFIG, argv)
    rng = fix_all_seed(int(config.get("Seed", 1234)))

    ds_cfg = dict(config["Dataset"])
    root = ds_cfg.pop("root_dir")
    ds_cfg.pop("name", None)
    datasets = {
        "train": MedicalImageDataset(root, "train", **ds_cfg),
        "val": MedicalImageDataset(root, "val", **{**ds_cfg, "quite": True}),
    }

    h, w = parse_transform_size(config["Dataset"].get("transform"))
    seg = Segmentator(config["Arch"], config["Optim"], config["Scheduler"],
                      rng, input_shape=(1, h, w, 1))

    loss_cfg = dict(config.get("Loss", {"name": "cross_entropy"}))
    criterion = get_loss_fn(loss_cfg.pop("name"), **loss_cfg)

    grp_regex = r"(patient\d+_\d+)_\d+"
    bs_cfg = config.get("Dataloader", {}).get("batch_sampler")
    if bs_cfg:
        grp_regex = bs_cfg[1]["grp_regex"]

    trainer_cfg = config["Trainer"]
    # Trainer.parallel: any value → data-only GSPMD DP mesh over all chips
    mesh = None
    if trainer_cfg.get("parallel") is not None:
        from dct_tpu.parallel import data_parallel_mesh
        mesh = data_parallel_mesh()
        if mesh is not None:
            print(f">> parallel mesh: {dict(mesh.shape)}")
    trainer = Trainer(
        seg, datasets, criterion,
        max_epoch=int(trainer_cfg["max_epoch"]),
        save_dir=trainer_cfg["save_dir"],
        axises=trainer_cfg.get("axises"),
        checkpoint=trainer_cfg.get("checkpoint"),
        metricname=trainer_cfg.get("metricname", "metrics.csv"),
        batch_size=int(config.get("Dataloader", {}).get("batch_size", 4)),
        grp_regex=grp_regex,
        seed=int(config.get("Seed", 1234)),
        nan_policy=trainer_cfg.get("nan_policy", "warn"),
        whole_config=config,
        mesh=mesh,
    )
    trainer.start_training(**config.get("StartTraining", {}))
    return trainer


if __name__ == "__main__":
    main(sys.argv[1:])
