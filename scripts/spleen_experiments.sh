#!/usr/bin/env bash
# Spleen experiment suite
# (parity with ref:/root/reference/script/spleen/run.sh: baseline / jsd /
# adv / jsd_adv arms at a given partition ratio + resolution; the reference
# wraps each arm in a 24h Slurm job via CC_wrapper.sh — resumable via
# Trainer.checkpoint, which works the same here).
set -e
cd "$(dirname "$0")/.."

ratio=${1:-0.20}
resolution=${2:-512}
max_epoch=${MAX_EPOCH:-300}
seed=${SEED:-1}
data_root=${DATA_ROOT:-/root/reference/dataset/Spleen}
main_dir=runs/spleen_re_${resolution}/${seed}

run_arm() { # name jsd adv
    local name=$1 jsd=$2 adv=$3
    python train_cotraining.py --config configs/spleen_cotraining.yaml \
        Dataset.root_dir=${data_root} \
        Dataset.transform="segment_transform((${resolution},${resolution}))" \
        Trainer.save_dir=${main_dir}/${name} Trainer.max_epoch=${max_epoch} \
        Lab_Partitions.partition_sets=${ratio} \
        StartTraining.train_jsd=${jsd} StartTraining.train_adv=${adv} \
        Seed=${seed}
    python summary.py --input_dir ${main_dir}/${name} \
        --dataset_root ${data_root} --axises 1
}

run_arm baseline False False
run_arm jsd      True  False
run_arm adv      False True
run_arm jsd_adv  True  True
python -m dct_tpu.postprocessing.report --folder ${main_dir}
