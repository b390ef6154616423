#!/usr/bin/env python
"""Mean-teacher entry point (parity with ref:/root/reference/train_mean_teacher.py).

    python train_mean_teacher.py [--config configs/acdc_meanteacher.yaml] \
        Trainer.save_dir=runs/mt Dataset.root_dir=dataset/ACDC-all
"""
from __future__ import annotations

import sys

import jax

from dct_tpu.config import yaml_parser
from dct_tpu.data.dataset import parse_transform_size
from dct_tpu.data.splits import get_dataset_split
from dct_tpu.losses import get_loss_fn
from dct_tpu.models import Segmentator
from dct_tpu.train import MeanTeacherTrainer
from dct_tpu.utils.general import fix_all_seed

DEFAULT_CONFIG = "configs/acdc_meanteacher.yaml"


def main(argv=None) -> MeanTeacherTrainer:
    config = yaml_parser(DEFAULT_CONFIG, argv)
    rng = fix_all_seed(int(config.get("Seed", 1234)))

    root = str(config["Dataset"]["root_dir"])
    dataset_name = ("gm" if "GM" in root
                    else "acdc")  # (ref:train_mean_teacher.py:34-40 root sniffing)
    labeled_sets, unlab_set, val_set = get_dataset_split(config, dataset_name)

    h, w = parse_transform_size(config["Dataset"].get("transform"))
    student = Segmentator(config["Arch"], config["Optim"], config["Scheduler"],
                          rng, input_shape=(1, h, w, 1))
    teacher = Segmentator(config["Arch"], config["Optim"], config["Scheduler"],
                          jax.random.fold_in(rng, 1), input_shape=(1, h, w, 1))

    criterions = {"sup": get_loss_fn("cross_entropy"), "con": "mse"}

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
    trainer = MeanTeacherTrainer(
        student_segmentator=student,
        teacher_segmentator=teacher,
        labeled_dataset=labeled_sets[0],
        unlabeled_dataset=unlab_set,
        val_dataset=val_set,
        criterions=criterions,
        max_epoch=int(trainer_cfg["max_epoch"]),
        save_dir=trainer_cfg["save_dir"],
        axises=trainer_cfg.get("axises", [1, 2, 3]),
        cot_scheduler_dict=config.get("Cot_Scheduler"),
        checkpoint=trainer_cfg.get("checkpoint"),
        metricname=trainer_cfg.get("metricname", "metrics.csv"),
        batch_size=int(config["Lab_Dataloader"]["batch_size"]),
        grp_regex=grp_regex,
        seed=int(config.get("Seed", 1234)),
        nan_policy=trainer_cfg.get("nan_policy", "warn"),
        whole_config=config,
        mesh=mesh,
    )
    trainer.start_training()
    return trainer


if __name__ == "__main__":
    main(sys.argv[1:])
