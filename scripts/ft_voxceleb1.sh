#!/bin/bash
# VoxCeleb-1 speaker ID — mirrors /root/reference/audiomae/ft_voxceleb1.sh.
set -euo pipefail
base_keep_rate=${1:?usage: ft_voxceleb1.sh <base_keep_rate>}
python -m tpat_tpu.cli.finetune \
  --dataset voxceleb1 --nb_classes 1251 \
  --voxceleb1_root ${VOXCELEB1_ROOT:-data/voxceleb1} \
  --batch_size 64 --epochs 90 --blr 1e-3 --warmup_epochs 4 \
  --base_keep_rate ${base_keep_rate} --drop_loc "(3, 6, 9)" \
  --shrink_start_epoch 10 --shrink_epochs 30 \
  --freqm 48 --timem 192 --roll_mag_aug true \
  --audioset_pretrained_model_path ${PRETRAINED:-pretrained_models/pretrained.pth} \
  --output_dir ./exp-vit_b/voxceleb1-kr${base_keep_rate} \
  --result_path ./exp-vit_b/voxceleb1-kr${base_keep_rate}/train_result.txt
