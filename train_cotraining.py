#!/usr/bin/env python
"""Co-training entry point (parity with ref:/root/reference/train_ACDC_cotraining.py).

Usage (reference-style dotted overrides):
    python train_cotraining.py [--config configs/acdc_cotraining.yaml] \
        Trainer.save_dir=runs/exp StartTraining.train_jsd=True \
        StartTraining.train_adv=True Lab_Partitions.partition_sets=0.2
"""
from __future__ import annotations

import sys

from dct_tpu.config import yaml_parser
from dct_tpu.data.dataset import parse_transform_size
from dct_tpu.data.splits import get_dataset_split
from dct_tpu.losses import get_loss_fn
from dct_tpu.models import Segmentator
from dct_tpu.train import CoTrainer
from dct_tpu.utils.general import fix_all_seed

DEFAULT_CONFIG = "configs/acdc_cotraining.yaml"


def get_models(config, rng, input_shape):
    """K Segmentators from one Arch/Optim/Scheduler block
    (ref:train_ACDC_cotraining.py:37-41)."""
    import jax
    n = int(config["Lab_Partitions"]["num_models"])
    return [Segmentator(config["Arch"], config["Optim"], config["Scheduler"],
                        jax.random.fold_in(rng, i), input_shape=input_shape)
            for i in range(n)]


def main(argv=None) -> CoTrainer:
    config = yaml_parser(DEFAULT_CONFIG, argv)
    rng = fix_all_seed(int(config.get("Seed", 1234)))

    dataset_name = config.get("Dataset", {}).get("name", "acdc")
    labeled_sets, unlab_set, val_set = get_dataset_split(config, dataset_name)

    h, w = parse_transform_size(config["Dataset"].get("transform"))
    segmentators = get_models(config, rng, input_shape=(1, h, w, 1))

    loss_cfg = dict(config.get("Loss", {"name": "cross_entropy"}))
    sup_loss = get_loss_fn(loss_cfg.pop("name"), **loss_cfg)
    criterions = {"sup": sup_loss, "jsd": get_loss_fn("jsd"),
                  "adv": get_loss_fn("jsd")}

    grp_regex = r"(patient\d+_\d+)_\d+"
    bs_cfg = config.get("Lab_Dataloader", {}).get("batch_sampler")
    if bs_cfg:
        grp_regex = bs_cfg[1]["grp_regex"]

    trainer_cfg = config["Trainer"]
    # Trainer.parallel: "auto" → gcd-based (model, data) mesh over all chips;
    # an int → that many model groups; absent → single device.
    mesh = None
    par = trainer_cfg.get("parallel")
    if par is not None:
        from dct_tpu.parallel import choose_parallel_mesh, make_mesh
        n_models = int(config["Lab_Partitions"]["num_models"])
        mesh = (choose_parallel_mesh(n_models) if par == "auto"
                else make_mesh(n_model=int(par)))
        if mesh is not None:
            print(f">> parallel mesh: {dict(mesh.shape)}")

    cotrainer = CoTrainer(
        segmentators=segmentators,
        labeled_datasets=labeled_sets,
        unlabeled_dataset=unlab_set,
        val_dataset=val_set,
        criterions=criterions,
        max_epoch=int(trainer_cfg["max_epoch"]),
        save_dir=trainer_cfg["save_dir"],
        axises=trainer_cfg.get("axises", [1, 2, 3]),
        checkpoint=trainer_cfg.get("checkpoint"),
        metricname=trainer_cfg.get("metricname", "metrics.csv"),
        cot_scheduler_dict=config.get("Cot_Scheduler"),
        adv_scheduler_dict=config.get("Adv_Scheduler"),
        adv_training_dict=config.get("Adv_Training", {}),
        batch_size=int(config["Lab_Dataloader"]["batch_size"]),
        unlab_batch_size=int(config["Unlab_Dataloader"]["batch_size"]),
        grp_regex=grp_regex,
        iters_per_epoch=int(trainer_cfg.get("iters_per_epoch", 300)),
        seed=int(config.get("Seed", 1234)),
        mesh=mesh,
        fuse_forward=bool(trainer_cfg.get("fuse_forward", True)),
        adv_dtype=trainer_cfg.get("adv_dtype"),
        iters_per_dispatch=trainer_cfg.get("iters_per_dispatch"),
        nan_policy=trainer_cfg.get("nan_policy", "warn"),
        whole_config=config,
    )
    cotrainer.start_training(**config["StartTraining"])
    return cotrainer


if __name__ == "__main__":
    main(sys.argv[1:])
