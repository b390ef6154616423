#!/usr/bin/env python
"""VAT trainer entry point (ref:generalframework/trainer/vattrainer.py surface).

    python train_vat.py [--config configs/acdc_vat.yaml] \
        Trainer.save_dir=runs/vat Dataset.root_dir=dataset/ACDC-all
"""
from __future__ import annotations

import sys

from dct_tpu.config import yaml_parser
from dct_tpu.data.dataset import parse_transform_size
from dct_tpu.data.splits import get_dataset_split
from dct_tpu.losses import get_loss_fn
from dct_tpu.models import Segmentator
from dct_tpu.train import VatTrainer
from dct_tpu.utils.general import fix_all_seed

DEFAULT_CONFIG = "configs/acdc_vat.yaml"


def main(argv=None) -> VatTrainer:
    config = yaml_parser(DEFAULT_CONFIG, argv)
    rng = fix_all_seed(int(config.get("Seed", 1234)))

    dataset_name = config.get("Dataset", {}).get("name", "acdc")
    labeled_sets, unlab_set, val_set = get_dataset_split(config, dataset_name)

    h, w = parse_transform_size(config["Dataset"].get("transform"))
    seg = Segmentator(config["Arch"], config["Optim"], config["Scheduler"],
                      rng, input_shape=(1, h, w, 1))
    loss_cfg = dict(config.get("Loss", {"name": "cross_entropy"}))
    criterion = get_loss_fn(loss_cfg.pop("name"), **loss_cfg)

    grp_regex = r"(patient\d+_\d+)_\d+"
    bs_cfg = config.get("Lab_Dataloader", {}).get("batch_sampler")
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
    trainer = VatTrainer(
        seg, labeled_sets[0], unlab_set, val_set, criterion,
        max_epoch=int(trainer_cfg["max_epoch"]),
        save_dir=trainer_cfg["save_dir"],
        axises=trainer_cfg.get("axises", [1, 2, 3]),
        checkpoint=trainer_cfg.get("checkpoint"),
        metricname=trainer_cfg.get("metricname", "metrics.csv"),
        adv_scheduler_dict=config.get("Adv_Scheduler"),
        adv_training_dict=config.get("Adv_Training", {}),
        batch_size=int(config["Lab_Dataloader"]["batch_size"]),
        grp_regex=grp_regex,
        seed=int(config.get("Seed", 1234)),
        nan_policy=trainer_cfg.get("nan_policy", "warn"),
        whole_config=config,
        mesh=mesh,
    )
    st = dict(config.get("StartTraining", {}))
    trainer.start_training(**st)
    return trainer


if __name__ == "__main__":
    main(sys.argv[1:])
