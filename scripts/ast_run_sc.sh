#!/bin/bash
# AST SpeechCommands-v2-35 protocol — mirrors
# /root/reference/ast/egs/speechcommands/run_sc.sh (lr 2.5e-4, 30 epochs,
# bs 128, mixup 0.6, BCE, MultiStepLR start 5 decay 0.85, shrink 5..20,
# first eval epoch 20, dual val/test eval at the end).
# Usage: ./scripts/ast_run_sc.sh <base_keep_rate>
set -euo pipefail
base_keep_rate=${1:?usage: ast_run_sc.sh <base_keep_rate>}
data_root=${SPC2_DATA:-data/speechcommands}
pretrained=${AST_PRETRAINED:-pretrained_models/audioset_16_16_0.4422.pth}
exp=./exp-ast/speechcommands-kr${base_keep_rate}
ramdisk=${RAMDISK:-/tmp/ramdisk/spc-2}
mkdir -p ${ramdisk}

# SPC-2 intensity-cluster boundaries (run_sc.sh:45-50), for the
# --drop_token_blk_idx/--retain_min/--retain_max ablation:
# [-0.8172, -0.6170, -0.3210, -0.0423, 0.2596, 1.0952]

python -m tpat_tpu.cli.run_ast \
  --dataset speechcommands --n_class 35 --audio_length 128 \
  --data-train ${data_root}/speechcommand_train_data.json \
  --data-val ${data_root}/speechcommand_valid_data.json \
  --data-eval ${data_root}/speechcommand_eval_data.json \
  --label-csv ${data_root}/speechcommands_class_labels_indices.csv \
  --lr 2.5e-4 --n-epochs 30 -b 128 --mixup 0.6 \
  --dataset_mean -6.845978 --dataset_std 5.5654526 --noise True \
  --metrics acc --loss BCE --warmup False \
  --lrscheduler_start 5 --lrscheduler_step 1 --lrscheduler_decay 0.85 \
  --base_keep_rate ${base_keep_rate} --drop_loc "(3, 6, 9)" \
  --shrink_start_epoch 5 --shrink_epochs 15 \
  --first_eval_epoch 20 \
  --imagenet_pretrain True --audioset_pretrain True \
  --audioset_pretrained_model_path ${pretrained} \
  --ramdisk_dir ${ramdisk} \
  --exp-dir ${exp} -w 16
