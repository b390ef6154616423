#!/usr/bin/env bash
# GM adversarial-weight search suite
# (parity with ref:/root/reference/script/GM/{adv_search,check}.sh: for each
# adv weight, run the FS / JSD / ADV / JSD_ADV arms at 200x200, axises [0,1],
# then ensemble summaries + report). The reference fans arms out over GPUs
# with CUDA_VISIBLE_DEVICES + wait; here arms run sequentially on the one
# TPU chip — use one process per slice for multi-chip fan-out.
set -e
cd "$(dirname "$0")/.."

adv_weights=(${ADV_WEIGHTS:-0.01 0.05 0.1})
max_epoch=${MAX_EPOCH:-120}
seed=${SEED:-1}
data_root=${DATA_ROOT:-/root/reference/dataset/GM_Challenge}

run_arm() { # name jsd adv weight
    local name=$1 jsd=$2 adv=$3 weight=$4
    local dir=runs/GM/weight_search/enet_adv_weight_${weight}/${name}
    python train_cotraining.py --config configs/gm_cotraining.yaml \
        Dataset.root_dir=${data_root} \
        Dataset.transform="segment_transform((200,200))" \
        Trainer.save_dir=${dir} Trainer.max_epoch=${max_epoch} \
        Trainer.axises=[0,1] \
        Lab_Partitions.num_models=2 Lab_Partitions.partition_overlap=1 \
        Adv_Scheduler.max_value=${weight} \
        StartTraining.train_jsd=${jsd} StartTraining.train_adv=${adv} \
        StartTraining.augment_labeled_data=True \
        StartTraining.augment_unlabeled_data=True \
        Seed=${seed}
    python summary.py --input_dir ${dir} --dataset_root ${data_root} \
        --kappa_considered_class 0 1
}

for w in "${adv_weights[@]}"; do
    run_arm FS      False False "$w"
    run_arm JSD     True  False "$w"
    run_arm ADV     False True  "$w"
    run_arm JSD_ADV True  True  "$w"
    python -m dct_tpu.postprocessing.report \
        --folder runs/GM/weight_search/enet_adv_weight_${w}
done
