#!/bin/bash
# SPC-2 finetune — mirrors /root/reference/audiomae/ft_spc2.sh.
set -euo pipefail
base_keep_rate=${1:?usage: ft_spc2.sh <base_keep_rate>}
data_root=${SPC2_DATA:-data/speechcommands_v2_35}
python -m tpat_tpu.cli.finetune \
  --dataset spc2 --nb_classes 35 \
  --data_train ${data_root}/speechcommand_train_data.json \
  --data_eval ${data_root}/speechcommand_eval_data.json \
  --label_csv ${data_root}/speechcommands_class_labels_indices.csv \
  --batch_size 512 --epochs 90 --blr 1e-3 --min_lr 1e-5 --warmup_epochs 4 \
  --base_keep_rate ${base_keep_rate} --drop_loc "(3, 6, 9)" \
  --shrink_start_epoch 10 --shrink_epochs 30 --first_eval_ep 40 \
  --freqm 48 --timem 48 --mixup 0.5 --roll_mag_aug true \
  --audioset_pretrained_model_path ${PRETRAINED:-pretrained_models/pretrained.pth} \
  --output_dir ./exp-vit_b/spc2-kr${base_keep_rate} \
  --result_path ./exp-vit_b/spc2-kr${base_keep_rate}/train_result.txt
