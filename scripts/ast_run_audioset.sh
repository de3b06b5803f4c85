#!/bin/bash
# AST AS-20K (balanced) finetune protocol — mirrors
# /root/reference/ast/egs/audioset/run_finetune.sh (lr 1e-4, 30 epochs,
# bs 64, mixup 0.5, BCE/mAP, warmup True, MultiStepLR start 10 step 5
# decay 0.5, shrink 15..25, first eval epoch 25).
# Usage: ./scripts/ast_run_audioset.sh <base_keep_rate>
set -euo pipefail
base_keep_rate=${1:?usage: ast_run_audioset.sh <base_keep_rate>}
data_root=${AUDIOSET_DATA:-data/audioset}
pretrained=${AST_PRETRAINED:-pretrained_models/audioset_16_16_0.4422.pth}
exp=./exp-ast/audioset-kr${base_keep_rate}
ramdisk=${RAMDISK:-/tmp/ramdisk_dir/as20k}
mkdir -p ${ramdisk}

# AS-20K intensity-cluster boundaries (run_finetune.sh:51-56):
# [-1.2776, -0.8705, -0.3861, -0.0182, 0.3140, 1.2121]

python -m tpat_tpu.cli.run_ast \
  --dataset audioset --n_class 527 --audio_length 1024 \
  --data-train ${data_root}/as20k_16k.json \
  --data-val ${data_root}/audioset_eval.json \
  --label-csv ${data_root}/class_labels_indices.csv \
  --lr 1e-4 --n-epochs 30 -b 64 --mixup 0.5 \
  --dataset_mean -4.2677393 --dataset_std 4.5689974 --noise False \
  --metrics mAP --loss BCE --warmup True \
  --lrscheduler_start 10 --lrscheduler_step 5 --lrscheduler_decay 0.5 \
  --base_keep_rate ${base_keep_rate} --drop_loc "(3, 6, 9)" \
  --shrink_start_epoch 15 --shrink_epochs 10 \
  --first_eval_epoch 25 \
  --imagenet_pretrain True --audioset_pretrain True \
  --audioset_pretrained_model_path ${pretrained} \
  --ramdisk_dir ${ramdisk} \
  --exp-dir ${exp} -w 16
