#!/usr/bin/env bash
# Labeled/unlabeled-ratio experiment suite
# (parity with ref:/root/reference/script/ACDC/1_labeled_unlabeled_ratio.sh:
# FS / partial / JSD / JSD+ADV arms at a given partition ratio, then ensemble
# summaries). Multi-experiment parallelism = independent processes, one TPU
# slice each (the reference pins CUDA_VISIBLE_DEVICES instead).
set -e
logdir=${1:-acdc_ratio}
max_epoch=${2:-300}
ratio=${3:-0.2}
seed=${4:-1234}
cd "$(dirname "$0")/.."

common="Trainer.max_epoch=${max_epoch} Lab_Partitions.partition_sets=${ratio} Seed=${seed}"

echo "== Full supervision baseline =="
python train_cotraining.py ${common} \
    Trainer.save_dir=runs/${logdir}/FS \
    StartTraining.train_jsd=False StartTraining.train_adv=False

echo "== JSD only =="
python train_cotraining.py ${common} \
    Trainer.save_dir=runs/${logdir}/JSD \
    StartTraining.train_jsd=True StartTraining.train_adv=False

echo "== JSD + adversarial =="
python train_cotraining.py ${common} \
    Trainer.save_dir=runs/${logdir}/JSD_ADV \
    StartTraining.train_jsd=True StartTraining.train_adv=True

for sub in FS JSD JSD_ADV; do
    python summary.py --input_dir runs/${logdir}/${sub} --ensemble_method soft
done
python -m dct_tpu.postprocessing.report --folder runs/${logdir}
