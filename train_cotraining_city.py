#!/usr/bin/env python
"""Cityscapes co-training entry point (parity with the reference's
CoTrainer_City path, ref:generalframework/trainer/cotraining_city.py).

    python train_cotraining_city.py [--config configs/cityscapes_cotraining.yaml] \
        Dataset.root_dir=/path/to/Cityscapes Trainer.save_dir=runs/city
"""
from __future__ import annotations

import sys

import jax

from dct_tpu.config import yaml_parser
from dct_tpu.data.cityscapes import get_cityscapes_split
from dct_tpu.losses import get_loss_fn
from dct_tpu.models import Segmentator
from dct_tpu.train import CoTrainerCity
from dct_tpu.utils.general import fix_all_seed

DEFAULT_CONFIG = "configs/cityscapes_cotraining.yaml"


def main(argv=None) -> CoTrainerCity:
    config = yaml_parser(DEFAULT_CONFIG, argv)
    rng = fix_all_seed(int(config.get("Seed", 1234)))

    labeled, unlab, val = get_cityscapes_split(config)
    h, w = config["Dataset"].get("image_size", (256, 512))
    n_models = int(config["Lab_Partitions"]["num_models"])
    segs = [Segmentator(config["Arch"], config["Optim"], config["Scheduler"],
                        jax.random.fold_in(rng, i), input_shape=(1, h, w, 3))
            for i in range(n_models)]

    # COCO-pretrained DeepLabV2 init (ref:trainer_city.py:56-66): point
    # Trainer.coco_init_pth at the torch .pth (or a pre-converted .ckpt from
    # `python -m dct_tpu.utils.torch_convert`); missing file = warn and skip,
    # like the reference's try/except.
    pth = config["Trainer"].get("coco_init_pth")
    if pth:
        from dct_tpu.utils.torch_convert import init_from_torch_deeplab
        try:
            if str(pth).endswith(".ckpt"):
                from dct_tpu.checkpoint import load_checkpoint
                sd = load_checkpoint(pth)
            else:
                import torch
                sd = torch.load(pth, map_location="cpu")
            for s in segs:
                s.state = init_from_torch_deeplab(s.state, sd)
            print("Coco pretrained model loaded")
        except Exception as e:  # noqa: BLE001 (parity: ref warns + continues)
            print(f"Loading coco pretrained model failed with:\n {e}")

    loss_cfg = dict(config.get("Loss", {"name": "cross_entropy"}))
    sup = get_loss_fn(loss_cfg.pop("name"), **loss_cfg)
    criterions = {"sup": sup, "jsd": get_loss_fn("jsd"), "adv": get_loss_fn("jsd")}

    trainer_cfg = config["Trainer"]
    # Trainer.parallel: any value → data-only GSPMD DP mesh over all chips
    mesh = None
    if trainer_cfg.get("parallel") is not None:
        from dct_tpu.parallel import data_parallel_mesh
        mesh = data_parallel_mesh()
        if mesh is not None:
            print(f">> parallel mesh: {dict(mesh.shape)}")
    trainer = CoTrainerCity(
        segs, labeled, unlab, val, criterions,
        max_epoch=int(trainer_cfg["max_epoch"]),
        save_dir=trainer_cfg["save_dir"],
        checkpoint=trainer_cfg.get("checkpoint"),
        metricname=trainer_cfg.get("metricname", "metrics.csv"),
        cot_scheduler_dict=config.get("Cot_Scheduler"),
        adv_scheduler_dict=config.get("Adv_Scheduler"),
        adv_training_dict=config.get("Adv_Training", {}),
        batch_size=int(config["Lab_Dataloader"]["batch_size"]),
        seed=int(config.get("Seed", 1234)),
        augmentations=config["Dataset"].get("augmentations"),
        nan_policy=trainer_cfg.get("nan_policy", "warn"),
        whole_config=config,
        mesh=mesh,
    )
    st = {k: v for k, v in config.get("StartTraining", {}).items()
          if k in ("train_jsd", "train_adv", "save_val")}
    trainer.start_training(**st)
    return trainer


if __name__ == "__main__":
    main(sys.argv[1:])
