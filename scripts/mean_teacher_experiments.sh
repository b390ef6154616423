#!/usr/bin/env bash
# Mean-teacher baselines for ACDC and GM
# (parity with ref:/root/reference/script/mean_teacher/
# run_mean_teacher_{ACDC,GM}.sh).
set -e
cd "$(dirname "$0")/.."

max_epoch=${MAX_EPOCH:-300}

echo "== ACDC mean teacher =="
python train_mean_teacher.py --config configs/acdc_meanteacher.yaml \
    Dataset.root_dir=${ACDC_ROOT:-/root/reference/dataset/ACDC-all} \
    Trainer.save_dir=runs/mean_teacher_ACDCBaseline \
    Trainer.max_epoch=${max_epoch}

echo "== GM mean teacher =="
python train_mean_teacher.py --config configs/acdc_meanteacher.yaml \
    Dataset.name=gm \
    Dataset.root_dir=${GM_ROOT:-/root/reference/dataset/GM_Challenge} \
    Dataset.transform="segment_transform((256,256))" \
    Arch.num_classes=2 Trainer.axises=[0,1] \
    Trainer.save_dir=runs/mean_teacher_GMBaseline \
    Trainer.max_epoch=${max_epoch}
